"""ResNet-50 (torchvision v1 architecture) and the existence classifier.

Re-design of reference ``models/objectness_net.py:205-223``:
``torchvision.models.resnet50`` -> Linear(1000, 1) -> Sigmoid. Kept at
the torchvision layout (BN after each conv, stride on the 3x3 conv of
each bottleneck) so converted reference checkpoints match bit-for-bit
modulo dtype.

BatchNorm runs from running statistics by default (stage 2 always uses
the frozen eval-mode model); training passes ``train=True`` and updates
``batch_stats`` with torch's 0.1 momentum. The ``axis_name`` attribute
enables cross-replica stat syncing on a device mesh (the TPU analog of
SyncBN) when set.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    precision: Any = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, axis_name=self.bn_axis_name if train else None, name=name,
            )

        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, precision=self.precision, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1, use_bias=False,
                      dtype=self.dtype, precision=self.precision, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, precision=self.precision, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            x = nn.Conv(self.planes * 4, (1, 1), strides=(self.stride, self.stride), use_bias=False,
                        dtype=self.dtype, precision=self.precision, name="downsample_conv")(x)
            x = bn("downsample_bn")(x)
        return nn.relu(out + x)


class ResNet50(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32
    precision: Any = None
    bn_axis_name: str | None = None
    stage_blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                      dtype=self.dtype, precision=self.precision, name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           dtype=self.dtype, axis_name=self.bn_axis_name if train else None, name="bn1")(out)
        out = nn.relu(out)
        # torch MaxPool2d(3, stride=2, padding=1)
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = 64
        for stage, blocks in enumerate(self.stage_blocks):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                out = Bottleneck(
                    planes, stride=stride, downsample=(b == 0),
                    dtype=self.dtype, precision=self.precision, bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage + 1}_{b}",
                )(out, train=train)
            planes *= 2

        out = jnp.mean(out, axis=(1, 2))  # adaptive avg pool to 1x1
        if self.num_classes:
            out = nn.Dense(self.num_classes, dtype=self.dtype, precision=self.precision, name="fc")(out)
        return out


class BinaryClassifier(nn.Module):
    """Existence classifier: ResNet-50 -> Linear(1000, 1) -> sigmoid."""

    dtype: Any = jnp.float32
    precision: Any = None
    bn_axis_name: str | None = None
    stage_blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, images, train: bool = False):
        logits1000 = ResNet50(
            dtype=self.dtype, precision=self.precision, bn_axis_name=self.bn_axis_name,
            stage_blocks=self.stage_blocks, name="backbone",
        )(images, train=train)
        logit = nn.Dense(1, dtype=self.dtype, precision=self.precision, name="head")(logits1000)
        return nn.sigmoid(logit.astype(jnp.float32))

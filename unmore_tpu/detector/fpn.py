"""ResNet-50 FPN backbone for the CAD detector, in Flax.

Re-design of the detectron2 R50-FPN the reference CAD uses
(``cad/model_zoo/configs/Base-RCNN-FPN.yaml``): C2..C5 taps from the
torchvision-layout ResNet-50 (so the published DINO-initialized
weights convert directly), lateral 1x1 + top-down nearest upsample +
3x3 output convs for P2..P5, max-pooled P6.

Norm choice: the reference trains with SyncBN; here BatchNorm with an
optional cross-replica ``axis_name`` (the mesh axis) is the TPU
equivalent, with GroupNorm available as a drop-in (config knob) since
BN-free training is often preferable on TPU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from unmore_tpu.models.resnet import Bottleneck


class ResNet50Trunk(nn.Module):
    """ResNet-50 returning {C2, C3, C4, C5} feature maps (NHWC)."""

    dtype: Any = jnp.float32
    precision: Any = None
    bn_axis_name: str | None = None
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    freeze_stem: bool = False
    remat: bool = False  # jax.checkpoint each bottleneck: trades ~1/3 more
    # FLOPs for activation memory (enables IMS_PER_BATCH 8+ at 1024^2 HBM)

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                      dtype=self.dtype, precision=self.precision, name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           dtype=self.dtype, axis_name=self.bn_axis_name if train else None,
                           name="bn1")(out)
        out = nn.relu(out)
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.freeze_stem:
            out = jax.lax.stop_gradient(out)

        block_cls = nn.remat(Bottleneck, static_argnums=(2,)) if self.remat else Bottleneck

        feats = {}
        planes = 64
        for stage, blocks in enumerate(self.stage_blocks):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                out = block_cls(
                    planes, stride=stride, downsample=(b == 0),
                    dtype=self.dtype, precision=self.precision,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage + 1}_{b}",
                )(out, train)
            feats[f"C{stage + 2}"] = out
            planes *= 2
        return feats


class FPN(nn.Module):
    """Lateral + top-down pyramid producing P2..P6 at ``out_channels``."""

    out_channels: int = 256
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, feats: dict):
        names = ["C2", "C3", "C4", "C5"]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, precision=self.precision,
                    name=f"lateral{i + 2}")(feats[n])
            for i, n in enumerate(names)
        ]
        # top-down with nearest x2 upsampling
        merged = [None] * 4
        merged[3] = laterals[3]
        for i in (2, 1, 0):
            up = merged[i + 1]
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)
            up = up[:, : laterals[i].shape[1], : laterals[i].shape[2]]
            merged[i] = laterals[i] + up
        outs = {
            f"P{i + 2}": nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                                 precision=self.precision, name=f"output{i + 2}")(merged[i])
            for i in range(4)
        }
        outs["P6"] = nn.max_pool(outs["P5"], (1, 1), strides=(2, 2))
        return outs


class ResNetFPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32
    precision: Any = None
    bn_axis_name: str | None = None
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    remat: bool = False

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = ResNet50Trunk(
            dtype=self.dtype, precision=self.precision, bn_axis_name=self.bn_axis_name,
            stage_blocks=self.stage_blocks, remat=self.remat, name="trunk",
        )(images, train=train)
        return FPN(self.out_channels, self.dtype, self.precision, name="fpn")(feats)

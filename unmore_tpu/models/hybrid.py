"""R50+ViT-B/16 hybrid backbone (timm ``vit_base_resnet50_384``) in Flax.

The reference's ``dpt_hybrid`` option (``models/objectness_net.py:74-105``,
``models/dpt/vit.py:351-512``): a ResNetV2 trunk feeding a 1x1 patch
projection into a 12-block ViT-B. DPT taps: stage-1 output (256 ch,
1/4), stage-2 output (512 ch, 1/8), and ViT blocks 8 and 11; the first
two reassemble paths are identities (``vit.py:438-443``).

The trunk follows timm 1.0.15 (the reference's pinned timm,
requirements.txt) ``vit_base_r50_s16_384`` conventions exactly
(docs/hybrid_stem_audit.md has the line-by-line audit):

* ``preact=False`` **post-activation** bottlenecks: conv1-norm1(act)-
  conv2-norm2(act)-conv3-norm3(no act), relu AFTER the residual add;
  downsample = 1x1 conv + norm(no act) on the raw input;
* ``stem_type='same'``: StdConv2dSame 7x7/2 + GroupNormAct + 3x3/2
  max-pool, all with asymmetric TF-SAME padding (low = floor, high =
  ceil), which flax/XLA "SAME" reproduces;
* ``StdConv2dSame(eps=1e-8)`` weight standardization: per-output-
  channel (w - mean) / sqrt(biased_var + 1e-8);
* GroupNormAct(num_groups=32, eps=1e-5).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from unmore_tpu.models.vit import Block, ViTConfig
from unmore_tpu.ops.image import resize_bilinear


def _standardize(kernel):
    mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
    return (kernel - mean) / jnp.sqrt(var + 1e-8)


class WSConv(nn.Conv):
    """Conv with weight standardization (timm StdConv2dSame, eps=1e-8)."""

    def param(self, name, init_fn, *args, **kwargs):
        p = super().param(name, init_fn, *args, **kwargs)
        if name == "kernel":
            p = _standardize(p)
        return p


class Bottleneck(nn.Module):
    """timm ResNetV2 post-activation Bottleneck (preact=False variant,
    the one ``vit_base_r50_s16_384`` builds — see module docstring)."""

    mid: int
    out: int
    stride: int = 1
    downsample: bool = False
    groups: int = 32
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        def gn(name):
            return nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype, name=name)

        shortcut = x
        if self.downsample:
            shortcut = WSConv(self.out, (1, 1), strides=(self.stride, self.stride), padding="SAME",
                              use_bias=False, dtype=self.dtype, precision=self.precision,
                              name="downsample_conv")(x)
            shortcut = gn("downsample_norm")(shortcut)  # apply_act=False
        y = WSConv(self.mid, (1, 1), padding="SAME", use_bias=False,
                   dtype=self.dtype, precision=self.precision, name="conv1")(x)
        y = nn.relu(gn("norm1")(y))
        y = WSConv(self.mid, (3, 3), strides=(self.stride, self.stride), padding="SAME", use_bias=False,
                   dtype=self.dtype, precision=self.precision, name="conv2")(y)
        y = nn.relu(gn("norm2")(y))
        y = WSConv(self.out, (1, 1), padding="SAME", use_bias=False,
                   dtype=self.dtype, precision=self.precision, name="conv3")(y)
        y = gn("norm3")(y)  # apply_act=False
        return nn.relu(y + shortcut)


class ResNetV2Stages(nn.Module):
    """'same'-stem + 3 stages (3, 4, 9 blocks); returns (stage1, stage2, final)."""

    dtype: Any = jnp.float32
    precision: Any = None
    stem_width: int = 64
    stage_widths: Sequence = ((64, 256), (128, 512), (256, 1024))
    stage_blocks: Sequence[int] = (3, 4, 9)
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        y = WSConv(self.stem_width, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
                   dtype=self.dtype, precision=self.precision, name="stem_conv")(x)
        y = nn.relu(nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype, name="stem_norm")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")

        taps = []
        for s, ((mid, out), nb) in enumerate(zip(self.stage_widths, self.stage_blocks)):
            for b in range(nb):
                stride = 2 if (s > 0 and b == 0) else 1
                y = Bottleneck(
                    mid, out, stride=stride, downsample=(b == 0), groups=self.groups,
                    dtype=self.dtype, precision=self.precision, name=f"stage{s}_block{b}",
                )(y)
            if s < 2:
                taps.append(y)
        return taps[0], taps[1], y


class HybridViTBackbone(nn.Module):
    """R50 stem/stages + ViT-B encoder. Returns the 4 DPT taps:
    [stage1 (B,H/4,W/4,256), stage2 (B,H/8,W/8,512),
     tokens@block8, tokens@block11]."""

    config: ViTConfig = ViTConfig(depth=12, dim=768, heads=12, mlp_dim=3072)
    hooks: Sequence[int] = (8, 11)
    dtype: Any = jnp.float32
    precision: Any = None
    resnet_kwargs: Any = None  # test override for miniature dims

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        B = x.shape[0]
        s1, s2, feat = ResNetV2Stages(
            self.dtype, self.precision, name="resnet", **(self.resnet_kwargs or {})
        )(x)
        gh, gw = feat.shape[1], feat.shape[2]

        patches = nn.Conv(cfg.dim, (1, 1), dtype=self.dtype, precision=self.precision,
                          name="patch_embed")(feat)
        tokens = patches.reshape(B, gh * gw, cfg.dim)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.dim), jnp.float32)
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + cfg.pretrain_grid**2, cfg.dim), jnp.float32,
        )
        pos_tok = pos_embed[:, :1]
        pos_grid = pos_embed[:, 1:].reshape(1, cfg.pretrain_grid, cfg.pretrain_grid, cfg.dim)
        if (gh, gw) != (cfg.pretrain_grid, cfg.pretrain_grid):
            pos_grid = resize_bilinear(pos_grid, (gh, gw), align_corners=False)
        pos = jnp.concatenate([pos_tok, pos_grid.reshape(1, gh * gw, cfg.dim)], axis=1)

        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, cfg.dim)).astype(tokens.dtype), tokens], axis=1
        )
        tokens = tokens + pos.astype(tokens.dtype)

        taps = {}
        for i in range(cfg.depth):
            tokens = Block(cfg.dim, cfg.heads, cfg.mlp_dim, self.dtype, self.precision, name=f"block{i}")(tokens)
            if i in set(self.hooks):
                taps[i] = tokens
        return s1, s2, taps[self.hooks[0]], taps[self.hooks[1]]

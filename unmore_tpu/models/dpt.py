"""DPT (Dense Prediction Transformer) feature extractor in Flax.

Re-design of the reference DPT stack (``models/dpt/models.py:26-94``,
``vit.py:204-348``, ``blocks.py:67-117,247-383``) as a pure functional
NHWC pipeline:

  ViT taps -> project-readout -> reassemble (1x1 conv + {x4 deconv,
  x2 deconv, id, /2 conv}) -> 3x3 "scratch" convs to a common width ->
  4 refinenet fusion blocks (residual conv units + x2 align_corners
  upsampling) -> final x2 upsample.

For a 128^2 input with patch 16 the pyramid is 32/16/8/4 -> fused back
to 64 -> 128 after the output upsample, exactly as the reference.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from unmore_tpu.models.vit import VIT_CONFIGS, ViTBackbone
from unmore_tpu.ops.image import resize_bilinear

# per-backbone reassemble widths (reference models/dpt/vit.py:494-528)
DPT_BACKBONE_SPECS = {
    "vitl16_384": dict(vit="vitl16_384", features=(256, 512, 1024, 1024), hooks=(5, 11, 17, 23)),
    "vitb16_384": dict(vit="vitb16_384", features=(96, 192, 384, 768), hooks=(2, 5, 8, 11)),
    # hybrid: taps 1/2 come from the ResNetV2 stages (identity reassemble,
    # reference vit.py:438-443), taps 3/4 from ViT blocks 8/11
    "vitb_rn50_384": dict(vit="vitb16_384", features=(256, 512, 768, 768), hooks=(8, 11)),
}


class ProjectReadout(nn.Module):
    """Fuse the cls token into every patch token: Linear(2C->C) + GELU.

    Reference ``models/dpt/vit.py:79-90``.
    """

    dim: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, tokens):  # [B, 1+N, C]
        cls = tokens[:, :1]
        patches = tokens[:, 1:]
        readout = jnp.broadcast_to(cls, patches.shape)
        x = jnp.concatenate([patches, readout], axis=-1)
        x = nn.Dense(self.dim, dtype=self.dtype, precision=self.precision, name="project")(x)
        return nn.gelu(x, approximate=False)


class ResidualConvUnit(nn.Module):
    """relu -> conv3x3 -> relu -> conv3x3, residual (blocks.py:247-315)."""

    features: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, precision=self.precision, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, precision=self.precision, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """Refinenet fusion (blocks.py:318-383): optional skip through RCU1,
    RCU2, x2 align_corners upsample, 1x1 out conv."""

    features: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, self.dtype, self.precision, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, self.dtype, self.precision, name="rcu2")(x)
        h, w = x.shape[-3] * 2, x.shape[-2] * 2
        x = resize_bilinear(x, (h, w), align_corners=True).astype(x.dtype)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, precision=self.precision, name="out_conv")(x)
        return x


class DPTFeatureExtractor(nn.Module):
    """images [B, H, W, 3] -> features [B, H, W, C=features] (head=None path).

    ``backbone`` picks a named spec; ``vit_config``/``hooks``/``widths``
    override it (used by tests with miniature dimensions).
    """

    backbone: str = "vitl16_384"
    features: int = 256
    vit_config: Any = None
    hooks: Sequence[int] | None = None
    widths: Sequence[int] | None = None
    hybrid_resnet_kwargs: Any = None  # test override (miniature dims)
    dtype: Any = jnp.float32
    precision: Any = None
    remat_vit: bool = False  # checkpoint ViT blocks (see ViTBackbone.remat)
    vit_pack: int = 1  # sequence packing factor (see ViTBackbone.__call__)

    @nn.compact
    def __call__(self, x):
        spec = dict(DPT_BACKBONE_SPECS[self.backbone])
        vit_cfg = self.vit_config or VIT_CONFIGS[spec["vit"]]
        if self.hooks is not None:
            spec["hooks"] = tuple(self.hooks)
        if self.widths is not None:
            spec["features"] = tuple(self.widths)
        B, H, W, _ = x.shape
        gh, gw = H // vit_cfg.patch, W // vit_cfg.patch
        widths = spec["features"]

        if self.backbone == "vitb_rn50_384":
            from unmore_tpu.models.hybrid import HybridViTBackbone

            s1, s2, t3, t4 = HybridViTBackbone(
                config=vit_cfg, hooks=spec["hooks"], dtype=self.dtype,
                precision=self.precision, resnet_kwargs=self.hybrid_resnet_kwargs, name="vit",
            )(x)
            maps = [s1, s2]
            token_taps = [(2, t3), (3, t4)]
        else:
            taps = ViTBackbone(
                vit_cfg, spec["hooks"], dtype=self.dtype, precision=self.precision,
                remat=self.remat_vit, name="vit"
            )(x, pack=self.vit_pack)
            maps = []
            token_taps = list(enumerate(taps))

        for i, tokens in token_taps:
            t = ProjectReadout(vit_cfg.dim, self.dtype, self.precision, name=f"readout{i}")(tokens)
            fmap = t.reshape(B, gh, gw, vit_cfg.dim)
            fmap = nn.Conv(widths[i], (1, 1), dtype=self.dtype, precision=self.precision, name=f"reassemble{i}")(fmap)
            if i == 0:  # x4 deconv (vit.py:270-279)
                fmap = nn.ConvTranspose(
                    widths[i], (4, 4), strides=(4, 4), padding="VALID", transpose_kernel=True,
                    dtype=self.dtype, precision=self.precision, name="upsample0",
                )(fmap)
            elif i == 1:  # x2 deconv (vit.py:293-302)
                fmap = nn.ConvTranspose(
                    widths[i], (2, 2), strides=(2, 2), padding="VALID", transpose_kernel=True,
                    dtype=self.dtype, precision=self.precision, name="upsample1",
                )(fmap)
            elif i == 3:  # /2 stride conv (vit.py:329-335)
                fmap = nn.Conv(
                    widths[i], (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, precision=self.precision, name="downsample3",
                )(fmap)
            maps.append(fmap)

        rn = [
            nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, precision=self.precision, name=f"layer{i + 1}_rn")(maps[i])
            for i in range(4)
        ]

        path = FeatureFusionBlock(self.features, self.dtype, self.precision, name="refinenet4")(rn[3])
        path = FeatureFusionBlock(self.features, self.dtype, self.precision, name="refinenet3")(path, rn[2])
        path = FeatureFusionBlock(self.features, self.dtype, self.precision, name="refinenet2")(path, rn[1])
        path = FeatureFusionBlock(self.features, self.dtype, self.precision, name="refinenet1")(path, rn[0])

        out = resize_bilinear(path, (path.shape[-3] * 2, path.shape[-2] * 2), align_corners=True)
        return out.astype(self.dtype)

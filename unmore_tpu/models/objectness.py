"""ObjectnessNet: DPT backbone + center-field and boundary-distance heads.

Re-design of reference ``models/objectness_net.py:37-203``. Canonical
operating point (reference ``script.sh:3-7``): ``dpt_large`` backbone,
``use_bg_sdf=True``, ``sdf_activation='tanh'`` — the SDF head then has
*no* intermediate activations and a Tanh output
(``models/objectness_net.py:128-135``); the center head is
conv1x1-relu-conv3x3-relu-conv1x1-relu-conv1x1
(``models/objectness_net.py:109-117``).

Outputs are NHWC: center_fields [B, H, W, 2] with channels (dy, dx) —
the same channel order as the GT synthesis grid
(``datasets.py:200-213``) — and sdf_maps [B, H, W].

Not ported (verified dead AND broken in the reference): the legacy
``backbone_type='resnet50'`` FCN branch (``models/objectness_net.py:51-61``)
calls ``_fcn_resnet`` which is never imported or defined anywhere in the
reference repo, and reads ``args.num_classes`` /
``args.replace_stride_with_dilation`` / ``args.use_seperate_backbone`` /
``args.pretrain_weights`` which the reference CLI
(``train_objectness_net.py:747-846``) never adds — selecting it raises
NameError/AttributeError. Same category as the vendored-dead
``models/dpt/midas_net.py``. (The ``sdf_activation='sine'`` head variant
(``models/objectness_net.py:120-127``) IS CLI-reachable and IS supported
here.)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from unmore_tpu.models.dpt import DPTFeatureExtractor

BACKBONE_ALIASES = {
    "dpt_large": "vitl16_384",
    "dpt_base": "vitb16_384",
    "dpt_hybrid": "vitb_rn50_384",
}


class ConvHead(nn.Module):
    """conv1x1(512) -> conv3x3(512) -> conv1x1(1024) -> conv1x1(out)."""

    out_channels: int
    use_relu: bool
    final_act: str | None = None  # 'tanh' | 'sine' | None
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        act = nn.relu if self.use_relu else (lambda v: v)
        x = act(nn.Conv(512, (1, 1), dtype=self.dtype, precision=self.precision, name="conv0")(x))
        x = act(nn.Conv(512, (3, 3), padding=1, dtype=self.dtype, precision=self.precision, name="conv1")(x))
        x = act(nn.Conv(1024, (1, 1), dtype=self.dtype, precision=self.precision, name="conv2")(x))
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, precision=self.precision, name="conv3")(x)
        if self.final_act == "tanh":
            x = jnp.tanh(x)
        elif self.final_act == "sine":
            x = jnp.sin(x)
        return x


class ObjectnessNet(nn.Module):
    backbone_type: str = "dpt_large"
    sdf_activation: str | None = "tanh"
    use_bg_sdf: bool = True
    features: int = 256
    vit_config: Any = None  # test override (miniature dims)
    hooks: Any = None
    widths: Any = None
    hybrid_resnet_kwargs: Any = None
    dtype: Any = jnp.float32
    precision: Any = None
    remat_vit: bool = False  # checkpoint ViT blocks when training at
    # large batch (see ViTBackbone.remat); inference paths leave it off
    vit_pack: int = 1  # encoder sequence packing (see ViTBackbone.__call__)

    @nn.compact
    def __call__(self, images):
        """images [B, H, W, 3] in [0, 1] (the reference feeds un-normalized
        ToTensor output). Returns dict(center_fields [B,H,W,2], sdf_maps [B,H,W])."""
        feat = DPTFeatureExtractor(
            backbone=BACKBONE_ALIASES[self.backbone_type],
            features=self.features,
            vit_config=self.vit_config,
            hooks=self.hooks,
            widths=self.widths,
            hybrid_resnet_kwargs=self.hybrid_resnet_kwargs,
            dtype=self.dtype,
            precision=self.precision,
            remat_vit=self.remat_vit,
            vit_pack=self.vit_pack,
            name="backbone",
        )(images)
        center = ConvHead(2, use_relu=True, dtype=self.dtype, precision=self.precision, name="center_head")(feat)
        if self.use_bg_sdf and self.sdf_activation in ("tanh", "sine"):
            # tanh/sine bg-sdf heads have no intermediate activations
            # (objectness_net.py:120-135)
            sdf_use_relu, sdf_final = False, self.sdf_activation
        elif self.use_bg_sdf and self.sdf_activation is None:
            sdf_use_relu, sdf_final = False, None
        else:  # relu variant / fg-only sdf (objectness_net.py:143-164)
            sdf_use_relu, sdf_final = True, None
        sdf = ConvHead(
            1, use_relu=sdf_use_relu, final_act=sdf_final,
            dtype=self.dtype, precision=self.precision, name="sdf_head",
        )(feat)
        return {
            "center_fields": center.astype(jnp.float32),
            "sdf_maps": sdf[..., 0].astype(jnp.float32),
        }

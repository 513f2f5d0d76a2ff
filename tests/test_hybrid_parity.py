"""Hybrid (R50+ViT) ObjectnessNet parity vs a timm-shaped torch fixture."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from unmore_tpu.models.convert import convert_objectness_state_dict
from unmore_tpu.models.objectness import ObjectnessNet
from unmore_tpu.models.vit import ViTConfig
from tests.torch_ref import TorchViTBlock

HIGH = jax.lax.Precision.HIGHEST


def _pad_same(x, k, s, value=0.0):
    """timm pad_same: asymmetric TF-SAME padding (low=floor, high=ceil)."""
    import math

    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2), value=value)


class TorchStdConv(nn.Conv2d):
    """timm StdConv2dSame: SAME padding + weight standardization eps=1e-8."""

    def forward(self, x):
        x = _pad_same(x, self.kernel_size[0], self.stride[0])
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
        w = (w - mean) / torch.sqrt(var + 1e-8)
        return F.conv2d(x, w, self.bias, self.stride, 0)


def _postact_block(in_ch, mid, out, stride, groups):
    """timm ResNetV2 Bottleneck (preact=False): see hybrid.py docstring."""
    m = nn.Module()
    m.conv1 = TorchStdConv(in_ch, mid, 1, bias=False)
    m.norm1 = nn.GroupNorm(groups, mid, eps=1e-5)
    m.conv2 = TorchStdConv(mid, mid, 3, stride=stride, bias=False)
    m.norm2 = nn.GroupNorm(groups, mid, eps=1e-5)
    m.conv3 = TorchStdConv(mid, out, 1, bias=False)
    m.norm3 = nn.GroupNorm(groups, out, eps=1e-5)
    m.downsample = nn.Module()
    m.downsample.conv = TorchStdConv(in_ch, out, 1, stride=stride, bias=False)
    m.downsample.norm = nn.GroupNorm(groups, out, eps=1e-5)
    return m


class TorchHybridObjectness(nn.Module):
    """timm-vit_base_resnet50_384-shaped hybrid at miniature dims, with
    reference checkpoint naming (backbone.pretrained.model.patch_embed.
    backbone.*, act_postprocess3/4, scratch, heads)."""

    def __init__(self, dim=32, depth=2, heads=2, mlp_dim=64, grid=4, groups=4,
                 stem=8, stage_widths=((8, 16), (16, 32), (32, 64)), features=16):
        super().__init__()
        self.groups = groups

        resnet = nn.Module()
        resnet.stem = nn.Module()
        resnet.stem.conv = TorchStdConv(3, stem, 7, stride=2, bias=False)
        resnet.stem.norm = nn.GroupNorm(groups, stem, eps=1e-5)
        stages = nn.ModuleList()
        in_ch = stem
        for s, (mid, out) in enumerate(stage_widths):
            stage = nn.Module()
            stage.blocks = nn.ModuleList(
                [_postact_block(in_ch, mid, out, 2 if s > 0 else 1, groups)]
            )
            stages.append(stage)
            in_ch = out
        resnet.stages = stages

        model = nn.Module()
        model.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        model.pos_embed = nn.Parameter(torch.randn(1, 1 + grid * grid, dim) * 0.02)
        model.patch_embed = nn.Module()
        model.patch_embed.backbone = resnet
        model.patch_embed.proj = nn.Conv2d(in_ch, dim, 1)
        model.blocks = nn.ModuleList([TorchViTBlock(dim, heads, mlp_dim) for _ in range(depth)])

        pretrained = nn.Module()
        pretrained.model = model
        for n in (3, 4):
            readout = nn.Module()
            readout.project = nn.Sequential(nn.Linear(2 * dim, dim), nn.GELU())
            post = nn.Sequential()
            post.add_module("0", readout)
            post.add_module("1", nn.Identity())
            post.add_module("2", nn.Identity())
            post.add_module("3", nn.Conv2d(dim, 24, 1))
            if n == 4:
                post.add_module("4", nn.Conv2d(24, 24, 3, stride=2, padding=1))
            setattr(pretrained, f"act_postprocess{n}", post)
        self.backbone = nn.Module()
        self.backbone.pretrained = pretrained

        scratch = nn.Module()
        widths4 = [stage_widths[0][1], stage_widths[1][1], 24, 24]
        for n in range(1, 5):
            setattr(scratch, f"layer{n}_rn", nn.Conv2d(widths4[n - 1], features, 3, padding=1, bias=False))
        for n in range(1, 5):
            ref = nn.Module()
            ref.out_conv = nn.Conv2d(features, features, 1)
            for rcu_name in ("resConfUnit1", "resConfUnit2"):
                rcu = nn.Module()
                rcu.conv1 = nn.Conv2d(features, features, 3, padding=1)
                rcu.conv2 = nn.Conv2d(features, features, 3, padding=1)
                setattr(ref, rcu_name, rcu)
            setattr(scratch, f"refinenet{n}", ref)
        self.backbone.scratch = scratch

        self.center_field_prediction_head = nn.Sequential(
            nn.Conv2d(features, 512, 1), nn.ReLU(),
            nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(),
            nn.Conv2d(512, 1024, 1), nn.ReLU(),
            nn.Conv2d(1024, 2, 1),
        )
        self.sdf_prediction_head = nn.Sequential(
            nn.Conv2d(features, 512, 1),
            nn.Conv2d(512, 512, 3, padding=1),
            nn.Conv2d(512, 1024, 1),
            nn.Conv2d(1024, 1, 1),
            nn.Tanh(),
        )

    def _block_fwd(self, blk, x):
        shortcut = blk.downsample.norm(blk.downsample.conv(x))
        y = F.relu(blk.norm1(blk.conv1(x)))
        y = F.relu(blk.norm2(blk.conv2(y)))
        y = blk.norm3(blk.conv3(y))
        return F.relu(y + shortcut)

    def forward(self, x):
        pre = self.backbone.pretrained
        model = pre.model
        rn = model.patch_embed.backbone
        y = F.relu(rn.stem.norm(rn.stem.conv(x)))
        y = F.max_pool2d(_pad_same(y, 3, 2, value=float("-inf")), 3, stride=2, padding=0)
        taps = []
        for s, stage in enumerate(rn.stages):
            for blk in stage.blocks:
                y = self._block_fwd(blk, y)
            if s < 2:
                taps.append(y)
        s1, s2 = taps

        t = model.patch_embed.proj(y).flatten(2).transpose(1, 2)
        B = x.shape[0]
        gh, gw = y.shape[2], y.shape[3]
        pos_tok, pos_grid = model.pos_embed[:, :1], model.pos_embed[0, 1:]
        g = int(np.sqrt(pos_grid.shape[0]))
        pos_grid = pos_grid.reshape(1, g, g, -1).permute(0, 3, 1, 2)
        pos_grid = F.interpolate(pos_grid, size=(gh, gw), mode="bilinear")
        pos = torch.cat([pos_tok, pos_grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)], dim=1)
        t = torch.cat([model.cls_token.expand(B, -1, -1), t], dim=1) + pos
        vit_taps = []
        for blk in model.blocks:
            t = blk(t)
            vit_taps.append(t)

        maps = [s1, s2]
        for n, tokens in ((3, vit_taps[0]), (4, vit_taps[1])):
            post = getattr(pre, f"act_postprocess{n}")
            cls, patches = tokens[:, :1], tokens[:, 1:]
            readout = cls.expand_as(patches)
            tt = post[0].project(torch.cat([patches, readout], -1))
            fmap = tt.transpose(1, 2).reshape(B, -1, gh, gw)
            fmap = post[3](fmap)
            if len(post) > 4:
                fmap = post[4](fmap)
            maps.append(fmap)

        sc = self.backbone.scratch
        rn_maps = [getattr(sc, f"layer{n}_rn")(maps[n - 1]) for n in range(1, 5)]

        def rcu(r, v):
            out = F.relu(v)
            out = r.conv1(out)
            out = F.relu(out)
            return r.conv2(out) + v

        def fusion(ref, v, skip=None):
            if skip is not None:
                v = v + rcu(ref.resConfUnit1, skip)
            v = rcu(ref.resConfUnit2, v)
            v = F.interpolate(v, scale_factor=2, mode="bilinear", align_corners=True)
            return ref.out_conv(v)

        path = fusion(sc.refinenet4, rn_maps[3])
        path = fusion(sc.refinenet3, path, rn_maps[2])
        path = fusion(sc.refinenet2, path, rn_maps[1])
        path = fusion(sc.refinenet1, path, rn_maps[0])
        feat = F.interpolate(path, scale_factor=2, mode="bilinear", align_corners=True)
        return {
            "center_fields": self.center_field_prediction_head(feat),
            "sdf_maps": self.sdf_prediction_head(feat),
        }


def test_hybrid_objectness_matches_torch_reference():
    torch.manual_seed(0)
    tmodel = TorchHybridObjectness().eval()
    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))

    params = convert_objectness_state_dict(tmodel.state_dict())
    fmodel = ObjectnessNet(
        backbone_type="dpt_hybrid",
        sdf_activation="tanh",
        use_bg_sdf=True,
        features=16,
        vit_config=ViTConfig(depth=2, dim=32, heads=2, mlp_dim=64, pretrain_grid=4),
        hooks=(0, 1),
        widths=(16, 32, 24, 24),
        hybrid_resnet_kwargs=dict(
            stem_width=8, stage_widths=((8, 16), (16, 32), (32, 64)),
            stage_blocks=(1, 1, 1), groups=4,
        ),
        precision=HIGH,
    )
    got = fmodel.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got["sdf_maps"]), want["sdf_maps"][:, 0].numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["center_fields"]),
        want["center_fields"].permute(0, 2, 3, 1).numpy(),
        atol=3e-4,
    )

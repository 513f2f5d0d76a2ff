"""Torch fixture models for converter/parity tests.

Compact re-statements of the reference architectures (timm-style ViT,
DPT reassemble+fusion, torchvision ResNet-50) that (a) expose
state_dict keys in the exact naming scheme of the reference
checkpoints, and (b) compute the same function, so the flax models +
converter can be validated end-to-end without timm/torchvision
installed. Test-only code.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchViTBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, mlp_dim)
        self.mlp.fc2 = nn.Linear(mlp_dim, dim)
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (C // h) ** -0.5
        a = a.softmax(dim=-1)
        y = (a @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        return x + y


class TorchDPTObjectness(nn.Module):
    """Reference-shaped ObjectnessNet (b16-style backbone, tanh bg-sdf heads).

    state_dict keys follow the reference checkpoint naming
    (backbone.pretrained.model.*, backbone.scratch.*, *_prediction_head.*).
    """

    def __init__(self, dim=32, depth=4, heads=2, mlp_dim=64, patch=16,
                 pretrain_grid=4, hooks=(0, 1, 2, 3), widths=(8, 16, 24, 24), features=16,
                 sdf_activation="tanh"):
        super().__init__()
        self.patch, self.hooks, self.widths, self.features = patch, hooks, widths, features
        self.pretrain_grid = pretrain_grid

        model = nn.Module()
        model.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        model.pos_embed = nn.Parameter(torch.randn(1, 1 + pretrain_grid**2, dim) * 0.02)
        model.patch_embed = nn.Module()
        model.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        model.blocks = nn.ModuleList([TorchViTBlock(dim, heads, mlp_dim) for _ in range(depth)])

        pretrained = nn.Module()
        pretrained.model = model
        for n in range(1, 5):
            i = n - 1
            readout = nn.Module()
            readout.project = nn.Sequential(nn.Linear(2 * dim, dim), nn.GELU())
            post = nn.Sequential()
            post.add_module("0", readout)
            post.add_module("1", nn.Identity())  # Transpose placeholder
            post.add_module("2", nn.Identity())  # Unflatten placeholder
            post.add_module("3", nn.Conv2d(dim, widths[i], 1))
            if n == 1:
                post.add_module("4", nn.ConvTranspose2d(widths[i], widths[i], 4, stride=4))
            elif n == 2:
                post.add_module("4", nn.ConvTranspose2d(widths[i], widths[i], 2, stride=2))
            elif n == 4:
                post.add_module("4", nn.Conv2d(widths[i], widths[i], 3, stride=2, padding=1))
            setattr(pretrained, f"act_postprocess{n}", post)
        self.backbone = nn.Module()
        self.backbone.pretrained = pretrained

        scratch = nn.Module()
        for n in range(1, 5):
            setattr(scratch, f"layer{n}_rn", nn.Conv2d(widths[n - 1], features, 3, padding=1, bias=False))
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
        # tanh/sine + use_bg_sdf variants: no intermediate activations
        # (reference models/objectness_net.py:120-135)
        class _Sin(nn.Module):
            def forward(self, x):
                return torch.sin(x)

        self.sdf_prediction_head = nn.Sequential(
            nn.Conv2d(features, 512, 1),
            nn.Conv2d(512, 512, 3, padding=1),
            nn.Conv2d(512, 1024, 1),
            nn.Conv2d(1024, 1, 1),
            nn.Tanh() if sdf_activation == "tanh" else _Sin(),
        )

    def _vit_taps(self, x):
        model = self.backbone.pretrained.model
        B, _, H, W = x.shape
        gh, gw = H // self.patch, W // self.patch
        t = model.patch_embed.proj(x).flatten(2).transpose(1, 2)
        pos = model.pos_embed
        pos_tok, pos_grid = pos[:, :1], pos[0, 1:]
        g = int(math.sqrt(pos_grid.shape[0]))
        pos_grid = pos_grid.reshape(1, g, g, -1).permute(0, 3, 1, 2)
        pos_grid = F.interpolate(pos_grid, size=(gh, gw), mode="bilinear")
        pos = torch.cat([pos_tok, pos_grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)], dim=1)
        t = torch.cat([model.cls_token.expand(B, -1, -1), t], dim=1) + pos
        taps = []
        for i, blk in enumerate(model.blocks):
            t = blk(t)
            if i in self.hooks:
                taps.append(t)
        return taps, (gh, gw)

    def _rcu(self, rcu, x):
        out = F.relu(x)
        out = rcu.conv1(out)
        out = F.relu(out)
        out = rcu.conv2(out)
        return out + x

    def _fusion(self, ref, x, skip=None):
        if skip is not None:
            x = x + self._rcu(ref.resConfUnit1, skip)
        x = self._rcu(ref.resConfUnit2, x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return ref.out_conv(x)

    def forward(self, x):
        taps, (gh, gw) = self._vit_taps(x)
        pre = self.backbone.pretrained
        maps = []
        for n in range(1, 5):
            post = getattr(pre, f"act_postprocess{n}")
            t = taps[n - 1]
            cls, patches = t[:, :1], t[:, 1:]
            readout = cls.expand_as(patches)
            t = post[0].project(torch.cat([patches, readout], -1))
            fmap = t.transpose(1, 2).reshape(t.shape[0], -1, gh, gw)
            fmap = post[3](fmap)
            if len(post) > 4:
                fmap = post[4](fmap)
            maps.append(fmap)
        sc = self.backbone.scratch
        rn = [getattr(sc, f"layer{n}_rn")(maps[n - 1]) for n in range(1, 5)]
        path = self._fusion(sc.refinenet4, rn[3])
        path = self._fusion(sc.refinenet3, path, rn[2])
        path = self._fusion(sc.refinenet2, path, rn[1])
        path = self._fusion(sc.refinenet1, path, rn[0])
        feat = F.interpolate(path, scale_factor=2, mode="bilinear", align_corners=True)
        return {
            "center_fields": self.center_field_prediction_head(feat),
            "sdf_maps": self.sdf_prediction_head(feat),
        }


def _tv_bottleneck(inplanes, planes, stride, downsample):
    m = nn.Module()
    m.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
    m.bn1 = nn.BatchNorm2d(planes)
    m.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
    m.bn2 = nn.BatchNorm2d(planes)
    m.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
    m.bn3 = nn.BatchNorm2d(planes * 4)
    if downsample:
        m.downsample = nn.Sequential(
            nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4),
        )
    else:
        m.downsample = None
    return m


class TorchResNet50Classifier(nn.Module):
    """torchvision-shaped resnet50 + Linear(1000,1) + sigmoid.

    state_dict keys: classifier_backbone.*, binary_classification_head.*
    (reference models/objectness_net.py:205-223). ``stage_blocks`` can be
    shrunk for fast tests; (3,4,6,3) is the real resnet50.
    """

    def __init__(self, stage_blocks=(3, 4, 6, 3)):
        super().__init__()
        rb = nn.Module()
        rb.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        rb.bn1 = nn.BatchNorm2d(64)
        inplanes, planes = 64, 64
        for stage, blocks in enumerate(stage_blocks, start=1):
            layer = nn.ModuleList()
            for b in range(blocks):
                stride = 2 if (stage > 1 and b == 0) else 1
                layer.append(_tv_bottleneck(inplanes, planes, stride, downsample=(b == 0)))
                inplanes = planes * 4
            setattr(rb, f"layer{stage}", layer)
            planes *= 2
        rb.fc = nn.Linear(inplanes, 1000)
        self.classifier_backbone = rb
        self.binary_classification_head = nn.Linear(1000, 1)
        self.stage_blocks = stage_blocks

    def _block(self, blk, x):
        out = F.relu(blk.bn1(blk.conv1(x)))
        out = F.relu(blk.bn2(blk.conv2(out)))
        out = blk.bn3(blk.conv3(out))
        if blk.downsample is not None:
            x = blk.downsample(x)
        return F.relu(out + x)

    def forward(self, x):
        rb = self.classifier_backbone
        out = F.relu(rb.bn1(rb.conv1(x)))
        out = F.max_pool2d(out, 3, stride=2, padding=1)
        for stage in range(1, len(self.stage_blocks) + 1):
            for blk in getattr(rb, f"layer{stage}"):
                out = self._block(blk, out)
        out = out.mean(dim=(2, 3))
        out = rb.fc(out)
        return torch.sigmoid(self.binary_classification_head(out))

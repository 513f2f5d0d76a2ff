"""One-way PyTorch -> JAX weight converter for reference checkpoints.

Translates the reference's published checkpoints
(``objectness_net_model.ckpt`` / ``classifier_model.ckpt``, torch
state_dicts saved by ``train_objectness_net.py:267-275``) into the
flax param trees of :mod:`unmore_tpu.models`. Layout rules:

* Conv2d weight  OIHW -> HWIO  (transpose 2,3,1,0)
* ConvTranspose2d weight IOHW -> HW,O,I (transpose 2,3,1,0; our modules
  use ``transpose_kernel=True`` which exactly reproduces torch)
* Linear weight  [out,in] -> [in,out]
* BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
* LayerNorm weight -> scale

Tensors are accepted as torch tensors or numpy arrays; torch is only
imported if needed, so the converter is usable in a torch-free runtime.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(w):
    return np.transpose(_np(w), (2, 3, 1, 0)).astype(np.float32)


def _convT(w):
    return np.transpose(_np(w), (2, 3, 1, 0)).astype(np.float32)


def _linear(w):
    return np.transpose(_np(w), (1, 0)).astype(np.float32)


def _vec(w):
    return _np(w).astype(np.float32)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .ckpt and return its model_state_dict (numpy)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return {k: _np(v) for k, v in sd.items()}


def _convert_hybrid_resnet(sd: Mapping[str, Any], p: dict):
    """timm ResNetV2 trunk of vit_base_resnet50_384 -> HybridViTBackbone.resnet."""
    t = "backbone.pretrained.model.patch_embed.backbone."
    rn = ("backbone", "vit", "resnet")
    _set(p, rn + ("stem_conv", "kernel"), _conv(sd[t + "stem.conv.weight"]))
    _set(p, rn + ("stem_norm", "scale"), _vec(sd[t + "stem.norm.weight"]))
    _set(p, rn + ("stem_norm", "bias"), _vec(sd[t + "stem.norm.bias"]))
    for s in range(3):
        b = 0
        while t + f"stages.{s}.blocks.{b}.conv1.weight" in sd:
            bt = t + f"stages.{s}.blocks.{b}."
            bf = rn + (f"stage{s}_block{b}",)
            for c in ("conv1", "conv2", "conv3"):
                _set(p, bf + (c, "kernel"), _conv(sd[bt + c + ".weight"]))
            for n in ("norm1", "norm2", "norm3"):
                _set(p, bf + (n, "scale"), _vec(sd[bt + n + ".weight"]))
                _set(p, bf + (n, "bias"), _vec(sd[bt + n + ".bias"]))
            if bt + "downsample.conv.weight" in sd:
                _set(p, bf + ("downsample_conv", "kernel"), _conv(sd[bt + "downsample.conv.weight"]))
                # preact=False DownsampleConv carries a no-act norm
                _set(p, bf + ("downsample_norm", "scale"), _vec(sd[bt + "downsample.norm.weight"]))
                _set(p, bf + ("downsample_norm", "bias"), _vec(sd[bt + "downsample.norm.bias"]))
            b += 1


def convert_objectness_state_dict(sd: Mapping[str, Any]) -> dict:
    """Reference ObjectnessNet state_dict (dpt_large/dpt_base/dpt_hybrid)
    -> flax params."""
    p: dict = {}
    vit = ("backbone", "vit")
    hybrid = "backbone.pretrained.model.patch_embed.backbone.stem.conv.weight" in sd

    _set(p, vit + ("cls_token",), _vec(sd["backbone.pretrained.model.cls_token"]))
    _set(p, vit + ("pos_embed",), _vec(sd["backbone.pretrained.model.pos_embed"]))
    _set(p, vit + ("patch_embed", "kernel"), _conv(sd["backbone.pretrained.model.patch_embed.proj.weight"]))
    _set(p, vit + ("patch_embed", "bias"), _vec(sd["backbone.pretrained.model.patch_embed.proj.bias"]))
    if hybrid:
        _convert_hybrid_resnet(sd, p)

    block_ids = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"backbone\.pretrained\.model\.blocks\.(\d+)\.", k))}
    )
    for i in block_ids:
        t = f"backbone.pretrained.model.blocks.{i}."
        b = vit + (f"block{i}",)
        _set(p, b + ("norm1", "scale"), _vec(sd[t + "norm1.weight"]))
        _set(p, b + ("norm1", "bias"), _vec(sd[t + "norm1.bias"]))
        _set(p, b + ("attn", "qkv", "kernel"), _linear(sd[t + "attn.qkv.weight"]))
        _set(p, b + ("attn", "qkv", "bias"), _vec(sd[t + "attn.qkv.bias"]))
        _set(p, b + ("attn", "proj", "kernel"), _linear(sd[t + "attn.proj.weight"]))
        _set(p, b + ("attn", "proj", "bias"), _vec(sd[t + "attn.proj.bias"]))
        _set(p, b + ("norm2", "scale"), _vec(sd[t + "norm2.weight"]))
        _set(p, b + ("norm2", "bias"), _vec(sd[t + "norm2.bias"]))
        _set(p, b + ("mlp", "fc1", "kernel"), _linear(sd[t + "mlp.fc1.weight"]))
        _set(p, b + ("mlp", "fc1", "bias"), _vec(sd[t + "mlp.fc1.bias"]))
        _set(p, b + ("mlp", "fc2", "kernel"), _linear(sd[t + "mlp.fc2.weight"]))
        _set(p, b + ("mlp", "fc2", "bias"), _vec(sd[t + "mlp.fc2.bias"]))

    # reassemble paths: act_postprocess{n} (1-indexed); the hybrid's
    # paths 1/2 are identities with no params (reference vit.py:438-443)
    for n in range(1, 5):
        t = f"backbone.pretrained.act_postprocess{n}."
        i = n - 1
        if t + "0.project.0.weight" not in sd:
            continue
        _set(p, ("backbone", f"readout{i}", "project", "kernel"), _linear(sd[t + "0.project.0.weight"]))
        _set(p, ("backbone", f"readout{i}", "project", "bias"), _vec(sd[t + "0.project.0.bias"]))
        _set(p, ("backbone", f"reassemble{i}", "kernel"), _conv(sd[t + "3.weight"]))
        _set(p, ("backbone", f"reassemble{i}", "bias"), _vec(sd[t + "3.bias"]))
        if n in (1, 2):
            _set(p, ("backbone", f"upsample{i}", "kernel"), _convT(sd[t + "4.weight"]))
            _set(p, ("backbone", f"upsample{i}", "bias"), _vec(sd[t + "4.bias"]))
        elif n == 4:
            _set(p, ("backbone", "downsample3", "kernel"), _conv(sd[t + "4.weight"]))
            _set(p, ("backbone", "downsample3", "bias"), _vec(sd[t + "4.bias"]))

    for n in range(1, 5):
        _set(p, ("backbone", f"layer{n}_rn", "kernel"), _conv(sd[f"backbone.scratch.layer{n}_rn.weight"]))
        t = f"backbone.scratch.refinenet{n}."
        r = ("backbone", f"refinenet{n}")
        _set(p, r + ("out_conv", "kernel"), _conv(sd[t + "out_conv.weight"]))
        _set(p, r + ("out_conv", "bias"), _vec(sd[t + "out_conv.bias"]))
        for rcu_t, rcu_f in (("resConfUnit1", "rcu1"), ("resConfUnit2", "rcu2")):
            for c in ("conv1", "conv2"):
                key = t + f"{rcu_t}.{c}.weight"
                if key in sd:
                    _set(p, r + (rcu_f, c, "kernel"), _conv(sd[key]))
                    _set(p, r + (rcu_f, c, "bias"), _vec(sd[t + f"{rcu_t}.{c}.bias"]))

    # heads: pull conv layers out of the Sequential in index order,
    # whatever activation layout the variant used
    for torch_head, flax_head in (
        ("center_field_prediction_head", "center_head"),
        ("sdf_prediction_head", "sdf_head"),
    ):
        idxs = sorted(
            {int(m.group(1)) for k in sd if (m := re.match(rf"{torch_head}\.(\d+)\.weight", k))}
        )
        for j, idx in enumerate(idxs):
            _set(p, (flax_head, f"conv{j}", "kernel"), _conv(sd[f"{torch_head}.{idx}.weight"]))
            _set(p, (flax_head, f"conv{j}", "bias"), _vec(sd[f"{torch_head}.{idx}.bias"]))
    return p


_TV_BOTTLENECK_RE = re.compile(r"layer(\d)\.(\d+)\.")


def convert_resnet50_state_dict(sd: Mapping[str, Any], prefix: str = "") -> tuple[dict, dict]:
    """torchvision resnet50 state_dict -> (params, batch_stats) for ResNet50."""
    params: dict = {}
    stats: dict = {}

    def bn(torch_name, flax_name):
        _set(params, (flax_name, "scale"), _vec(sd[prefix + torch_name + ".weight"]))
        _set(params, (flax_name, "bias"), _vec(sd[prefix + torch_name + ".bias"]))
        _set(stats, (flax_name, "mean"), _vec(sd[prefix + torch_name + ".running_mean"]))
        _set(stats, (flax_name, "var"), _vec(sd[prefix + torch_name + ".running_var"]))

    _set(params, ("conv1", "kernel"), _conv(sd[prefix + "conv1.weight"]))
    bn("bn1", "bn1")
    for stage in range(1, 5):
        b = 0
        while prefix + f"layer{stage}.{b}.conv1.weight" in sd:
            t = f"layer{stage}.{b}."
            f = f"layer{stage}_{b}"
            for c in ("conv1", "conv2", "conv3"):
                _set(params, (f, c, "kernel"), _conv(sd[prefix + t + c + ".weight"]))
            for bnname in ("bn1", "bn2", "bn3"):
                _set(params, (f, bnname, "scale"), _vec(sd[prefix + t + bnname + ".weight"]))
                _set(params, (f, bnname, "bias"), _vec(sd[prefix + t + bnname + ".bias"]))
                _set(stats, (f, bnname, "mean"), _vec(sd[prefix + t + bnname + ".running_mean"]))
                _set(stats, (f, bnname, "var"), _vec(sd[prefix + t + bnname + ".running_var"]))
            if prefix + t + "downsample.0.weight" in sd:
                _set(params, (f, "downsample_conv", "kernel"), _conv(sd[prefix + t + "downsample.0.weight"]))
                _set(params, (f, "downsample_bn", "scale"), _vec(sd[prefix + t + "downsample.1.weight"]))
                _set(params, (f, "downsample_bn", "bias"), _vec(sd[prefix + t + "downsample.1.bias"]))
                _set(stats, (f, "downsample_bn", "mean"), _vec(sd[prefix + t + "downsample.1.running_mean"]))
                _set(stats, (f, "downsample_bn", "var"), _vec(sd[prefix + t + "downsample.1.running_var"]))
            b += 1
    if prefix + "fc.weight" in sd:
        _set(params, ("fc", "kernel"), _linear(sd[prefix + "fc.weight"]))
        _set(params, ("fc", "bias"), _vec(sd[prefix + "fc.bias"]))
    return params, stats


def convert_classifier_state_dict(sd: Mapping[str, Any]) -> dict:
    """Reference Binary_Classifier state_dict -> flax variables dict."""
    backbone_params, backbone_stats = convert_resnet50_state_dict(sd, prefix="classifier_backbone.")
    params = {
        "backbone": backbone_params,
        "head": {
            "kernel": _linear(sd["binary_classification_head.weight"]),
            "bias": _vec(sd["binary_classification_head.bias"]),
        },
    }
    return {"params": params, "batch_stats": {"backbone": backbone_stats}}

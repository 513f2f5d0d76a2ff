"""detectron2 -> JAX weight converter for the CAD detector.

Maps detectron2 Cascade Mask R-CNN checkpoints — the published unMORE
CAD model and the DINO ResNet-50 init (``MODEL.WEIGHTS`` in the CAD
yaml) — onto :class:`unmore_tpu.detector.cascade_rcnn.CascadeMaskRCNN`.
Works for the STRIDE_IN_1X1=False layout the reference trains with
(stride on the 3x3 conv, matching this trunk).

d2 name -> flax path:
  backbone.bottom_up.stem.conv1(.norm)      -> backbone/trunk/{conv1,bn1}
  backbone.bottom_up.res{s}.{b}.conv{i}(.norm) -> backbone/trunk/layer{s-1}_{b}/{conv_i,bn_i}
  backbone.bottom_up.res{s}.{b}.shortcut(.norm) -> .../downsample_{conv,bn}
  backbone.fpn_lateral{l} / fpn_output{l}   -> backbone/fpn/{lateral,output}{l}
  proposal_generator.rpn_head.{conv,objectness_logits,anchor_deltas} -> rpn/*
  roi_heads.box_head.{k}.fc{1,2}            -> box_head{k}/fc{1,2}
  roi_heads.box_predictor.{k}.{cls_score,bbox_pred} -> box_head{k}/*
  roi_heads.mask_head.{mask_fcn1..4,deconv,predictor} -> mask_head/*
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from unmore_tpu.models.convert import _conv, _convT, _linear, _set, _vec


def _bn(sd, params, stats, torch_name, flax_path):
    if torch_name + ".norm.weight" in sd:
        _set(params, flax_path + ("scale",), _vec(sd[torch_name + ".norm.weight"]))
        _set(params, flax_path + ("bias",), _vec(sd[torch_name + ".norm.bias"]))
        _set(stats, flax_path + ("mean",), _vec(sd[torch_name + ".norm.running_mean"]))
        _set(stats, flax_path + ("var",), _vec(sd[torch_name + ".norm.running_var"]))


def convert_d2_detector_state_dict(sd: Mapping[str, Any]) -> dict:
    """-> {'params': ..., 'batch_stats': ...} (partial trees for partial
    checkpoints — e.g. the DINO init has only the trunk)."""
    params: dict = {}
    stats: dict = {}
    trunk = ("backbone", "trunk")

    if "backbone.bottom_up.stem.conv1.weight" in sd:
        _set(params, trunk + ("conv1", "kernel"), _conv(sd["backbone.bottom_up.stem.conv1.weight"]))
        _bn(sd, params, stats, "backbone.bottom_up.stem.conv1", trunk + ("bn1",))
    for s in range(2, 6):
        b = 0
        while f"backbone.bottom_up.res{s}.{b}.conv1.weight" in sd:
            t = f"backbone.bottom_up.res{s}.{b}."
            f = trunk + (f"layer{s - 1}_{b}",)
            for i in (1, 2, 3):
                _set(params, f + (f"conv{i}", "kernel"), _conv(sd[t + f"conv{i}.weight"]))
                _bn(sd, params, stats, t + f"conv{i}", f + (f"bn{i}",))
            if t + "shortcut.weight" in sd:
                _set(params, f + ("downsample_conv", "kernel"), _conv(sd[t + "shortcut.weight"]))
                _bn(sd, params, stats, t + "shortcut", f + ("downsample_bn",))
            b += 1

    for lvl in range(2, 6):
        for d2n, fxn in ((f"backbone.fpn_lateral{lvl}", f"lateral{lvl}"),
                         (f"backbone.fpn_output{lvl}", f"output{lvl}")):
            if d2n + ".weight" in sd:
                _set(params, ("backbone", "fpn", fxn, "kernel"), _conv(sd[d2n + ".weight"]))
                _set(params, ("backbone", "fpn", fxn, "bias"), _vec(sd[d2n + ".bias"]))

    rpn_map = (("conv", "conv"), ("objectness_logits", "objectness_logits"), ("anchor_deltas", "anchor_deltas"))
    for d2n, fxn in rpn_map:
        key = f"proposal_generator.rpn_head.{d2n}.weight"
        if key in sd:
            _set(params, ("rpn", fxn, "kernel"), _conv(sd[key]))
            _set(params, ("rpn", fxn, "bias"), _vec(sd[f"proposal_generator.rpn_head.{d2n}.bias"]))

    for k in range(3):
        t = f"roi_heads.box_head.{k}."
        if t + "fc1.weight" in sd:
            for fc in ("fc1", "fc2"):
                # d2 flattens NCHW pooled features; our head flattens NHWC.
                # fc1 needs an input permutation (C,7,7)->(7,7,C); fc2 is 1:1.
                w = np.asarray(sd[t + fc + ".weight"], np.float32)
                if fc == "fc1":
                    out_dim = w.shape[0]
                    w = w.reshape(out_dim, -1, 7, 7).transpose(0, 2, 3, 1).reshape(out_dim, -1)
                _set(params, (f"box_head{k}", fc, "kernel"), w.T.copy())
                _set(params, (f"box_head{k}", fc, "bias"), _vec(sd[t + fc + ".bias"]))
        t = f"roi_heads.box_predictor.{k}."
        if t + "cls_score.weight" in sd:
            for name in ("cls_score", "bbox_pred"):
                _set(params, (f"box_head{k}", name, "kernel"), _linear(sd[t + name + ".weight"]))
                _set(params, (f"box_head{k}", name, "bias"), _vec(sd[t + name + ".bias"]))

    t = "roi_heads.mask_head."
    for i in range(1, 5):
        if t + f"mask_fcn{i}.weight" in sd:
            _set(params, ("mask_head", f"mask_fcn{i}", "kernel"), _conv(sd[t + f"mask_fcn{i}.weight"]))
            _set(params, ("mask_head", f"mask_fcn{i}", "bias"), _vec(sd[t + f"mask_fcn{i}.bias"]))
    if t + "deconv.weight" in sd:
        _set(params, ("mask_head", "deconv", "kernel"), _convT(sd[t + "deconv.weight"]))
        _set(params, ("mask_head", "deconv", "bias"), _vec(sd[t + "deconv.bias"]))
    if t + "predictor.weight" in sd:
        _set(params, ("mask_head", "predictor", "kernel"), _conv(sd[t + "predictor.weight"]))
        _set(params, ("mask_head", "predictor", "bias"), _vec(sd[t + "predictor.bias"]))

    return {"params": params, "batch_stats": stats}

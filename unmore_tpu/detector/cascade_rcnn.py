"""Cascade Mask R-CNN (the CAD class-agnostic detector), assembled.

Re-design of the reference detectron2 fork (``cad/``): R50-FPN trunk,
RPN, 3-stage cascade box heads with DropLoss + soft targets, weighted
mask head — one Flax module whose train/inference paths are pure
fixed-shape functions suitable for ``jit`` on a DP mesh.

Fixed-shape conventions (per image):
  * GT lattice: [G_max] boxes + scores + validity + box-frame RoI masks
  * RPN proposals: post-NMS lattice (4000 train / 1000 test)
  * cascade stage lattice: 512 sampled proposals (train)
  * detections: top 100 (DETECTIONS_PER_IMAGE)

Deviations from the reference (documented):
  * multi-scale train resizing happens on the host into a fixed square
    canvas (XLA static shapes) instead of aspect-ratio-grouped batches;
  * SyncBN -> BatchNorm with cross-replica axis on the mesh (or frozen
    stats), selected by config;
  * ROIAlign sampling ratio fixed at 2 (see roi_align.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from unmore_tpu.detector import anchors as anchor_lib
from unmore_tpu.detector.box_ops import clip_boxes, decode_deltas
from unmore_tpu.detector.fpn import ResNetFPN
from unmore_tpu.detector.heads import (
    CASCADE_IOUS,
    CASCADE_WEIGHTS,
    BoxHead,
    MaskHead,
    crop_gt_mask_to_proposals,
    droploss_weights,
    mask_loss_weighted,
    match_and_label,
    sample_stage0,
    soft_box_reg_loss,
    softmax_ce_soft_targets,
)
from unmore_tpu.detector.roi_align import roi_align_fpn
from unmore_tpu.detector.rpn import RPNHead, generate_proposals, rpn_losses
from unmore_tpu.ops.nms import nms_mask

PIXEL_MEAN = np.array([123.675, 116.280, 103.530], np.float32) / 255.0
PIXEL_STD = np.array([58.395, 57.120, 57.375], np.float32) / 255.0


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    num_classes: int = 1
    image_size: int = 1024  # square train/test canvas
    max_gt: int = 128
    gt_mask_res: int = 128  # box-frame GT mask resolution
    # RPN
    rpn_pre_nms_topk_train: int = 2000
    rpn_pre_nms_topk_test: int = 1000
    rpn_post_nms_topk_train: int = 4000  # CAD yaml override
    rpn_post_nms_topk_test: int = 1000
    rpn_nms_thresh: float = 0.65
    rpn_batch_per_image: int = 256
    # cascade
    stage_samples: int = 512
    positive_fraction: float = 0.25
    use_droploss: bool = True
    droploss_iou_thresh: float = 0.01
    use_soft_targets: bool = True
    mask_on: bool = True
    # test
    test_score_thresh: float = 0.0
    test_nms_thresh: float = 0.5
    detections_per_image: int = 100
    # model
    pooler_sampling: Any = 2  # per-bin samples; "adaptive" = exact d2 ratio-0
    remat_backbone: bool = True  # checkpoint trunk blocks (HBM headroom for
    # realistic batches at 1024^2; forward-only inference cost unchanged)
    dtype: Any = jnp.float32
    precision: Any = None
    bn_axis_name: str | None = None
    stage_blocks: tuple = (3, 4, 6, 3)


class CascadeMaskRCNN(nn.Module):
    """Parameter container; the pipeline logic lives in the functions
    below and calls the submodules through apply-methods."""

    cfg: DetectorConfig

    def setup(self):
        c = self.cfg
        self.backbone = ResNetFPN(
            out_channels=256, dtype=c.dtype, precision=c.precision,
            bn_axis_name=c.bn_axis_name, stage_blocks=c.stage_blocks,
            remat=c.remat_backbone, name="backbone",
        )
        self.rpn_head = RPNHead(num_anchors=3, dtype=c.dtype, precision=c.precision, name="rpn")
        self.box_heads = [
            BoxHead(num_classes=c.num_classes, dtype=c.dtype, precision=c.precision, name=f"box_head{k}")
            for k in range(3)
        ]
        self.mask_head = MaskHead(num_classes=c.num_classes, dtype=c.dtype, precision=c.precision, name="mask_head")

    def __call__(self, images, train: bool = False):
        """Backbone + RPN head (the parts with parameters + BN state)."""
        feats = self.backbone(images, train=train)
        rpn_out = self.rpn_head(feats)
        return feats, rpn_out

    def run_box_head(self, pooled, stage: int):
        return self.box_heads[stage](pooled)

    def run_mask_head(self, pooled):
        return self.mask_head(pooled)

    def init_all(self, images):
        """Init-time method touching every submodule (``__call__`` alone
        would leave the box/mask heads without parameters)."""
        feats, rpn_out = self(images, train=False)
        dummy7 = jnp.zeros((1, 7, 7, 256), self.cfg.dtype)
        dummy14 = jnp.zeros((1, 14, 14, 256), self.cfg.dtype)
        for k in range(3):
            self.run_box_head(dummy7, k)
        self.run_mask_head(dummy14)
        return feats, rpn_out


def _normalize(images):
    # uint8 canvases are the wire format from the data pipeline (4x less
    # host->device bandwidth than f32 — 100 MB/step at 1024^2 b8);
    # conversion to [0,1] float happens here on device
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    return (images - PIXEL_MEAN) / PIXEL_STD


def _mask_targets_float(gt_masks):
    """uint8-quantized (0-255) soft mask targets -> [0,1] float."""
    if gt_masks.dtype == jnp.uint8:
        return gt_masks.astype(jnp.float32) / 255.0
    return gt_masks


def detector_forward_train(model, variables, cfg: DetectorConfig, batch, rng):
    """Full training forward -> dict of scalar losses (+ new batch_stats).

    batch: images [B,S,S,3] in [0,1] float (or uint8 0-255); image_hw
    [B,2]; gt_boxes [B,G,4]; gt_scores [B,G]; gt_valid [B,G]; gt_masks
    [B,G,R,R] in [0,1] float (or uint8 0-255); is_single_object [B].
    The per-image pipeline is vmapped over the batch so GSPMD shards it
    cleanly along the mesh data axis.
    """
    images = _normalize(batch["images"])
    (feats, rpn_out), mutated = model.apply(
        variables, images, train=True, mutable=["batch_stats"]
    )

    B = images.shape[0]
    names = ["P2", "P3", "P4", "P5", "P6"]
    anchors_l = [jnp.asarray(a) for a in anchor_lib.fpn_anchors(cfg.image_size)]
    anchors_all = jnp.concatenate(anchors_l, axis=0)
    rngs = jax.random.split(rng, B * 2).reshape(B, 2, 2)

    def per_image(feats_b, obj_l, del_l, gt_boxes, gt_scores, gt_valid, gt_masks,
                  is_single, hw, img_rngs):
        losses = {}
        obj_all = jnp.concatenate(obj_l, axis=0)
        del_all = jnp.concatenate(del_l, axis=0)
        losses.update(rpn_losses(
            anchors_all, obj_all, del_all, gt_boxes, gt_valid, img_rngs[0],
            batch_size_per_image=cfg.rpn_batch_per_image,
        ))

        proposals, _, p_valid = generate_proposals(
            anchors_l, obj_l, del_l, hw,
            cfg.rpn_pre_nms_topk_train, cfg.rpn_post_nms_topk_train, cfg.rpn_nms_thresh,
        )
        proposals = jax.lax.stop_gradient(proposals)

        s0 = sample_stage0(
            proposals, p_valid, gt_boxes, gt_scores, gt_valid, img_rngs[1],
            num_samples=cfg.stage_samples, positive_fraction=cfg.positive_fraction,
            iou_thresh=CASCADE_IOUS[0],
        )

        boxes_k = s0["boxes"]
        match_k = {k2: s0[k2] for k2 in ("fg", "matched_idx", "gt_score", "gt_box")}
        valid_k = s0["valid"]
        for k in range(3):
            if k > 0:
                match_k = match_and_label(
                    boxes_k, valid_k, gt_boxes, gt_scores, gt_valid, CASCADE_IOUS[k]
                )
            pooled = roi_align_fpn(feats_b, boxes_k, out_size=7, sampling=cfg.pooler_sampling)
            scores, deltas = model.apply(
                variables, pooled, k, method=CascadeMaskRCNN.run_box_head
            )
            pred_boxes = clip_boxes(
                decode_deltas(deltas, boxes_k, weights=CASCADE_WEIGHTS[k]), hw
            )
            if cfg.use_droploss:
                w = droploss_weights(
                    jax.lax.stop_gradient(pred_boxes), gt_boxes, gt_valid,
                    is_single, cfg.droploss_iou_thresh,
                )
            else:
                w = jnp.ones(boxes_k.shape[0])
            losses[f"loss_cls_stage{k}"] = softmax_ce_soft_targets(
                scores, match_k["fg"], jax.lax.stop_gradient(match_k["gt_score"]), w, valid_k
            )
            losses[f"loss_box_reg_stage{k}"] = soft_box_reg_loss(
                boxes_k, deltas, match_k["fg"], match_k["gt_box"],
                jax.lax.stop_gradient(match_k["gt_score"]), valid_k, CASCADE_WEIGHTS[k],
            )
            boxes_k = jax.lax.stop_gradient(pred_boxes)

        if cfg.mask_on:
            # mask head trains on the FOREGROUND stage-0 proposals only,
            # like d2's select_foreground_proposals before _forward_mask
            # (cad/modeling/roi_heads/roi_heads.py:889-917). The sampler
            # caps positives at stage_samples*positive_fraction, so
            # compacting fg to a fixed-capacity prefix is exact and cuts
            # mask pooling+head FLOPs 1/positive_fraction-fold (4x)
            cap = max(int(cfg.stage_samples * cfg.positive_fraction), 1)
            mm = {k2: s0[k2] for k2 in ("fg", "matched_idx", "gt_score", "gt_box")}
            order = jnp.argsort(~mm["fg"], stable=True)[:cap]
            mb = s0["boxes"][order]
            mm = {k2: v[order] for k2, v in mm.items()}
            pooled = roi_align_fpn(feats_b, mb, out_size=14, sampling=cfg.pooler_sampling)
            mask_logits = model.apply(variables, pooled, method=CascadeMaskRCNN.run_mask_head)[..., 0]
            targets = crop_gt_mask_to_proposals(
                gt_masks, gt_boxes, mm["matched_idx"], mb, out_size=mask_logits.shape[-1]
            )
            losses["loss_mask"] = mask_loss_weighted(
                mask_logits, jax.lax.stop_gradient(targets), mm["fg"],
                jax.lax.stop_gradient(mm["gt_score"]),
            )
        return losses

    feats_roi = {n: feats[n] for n in ("P2", "P3", "P4", "P5")}
    obj_levels = [rpn_out[n]["objectness"] for n in names]
    del_levels = [rpn_out[n]["deltas"] for n in names]
    per_image_losses = jax.vmap(per_image)(
        feats_roi, obj_levels, del_levels,
        batch["gt_boxes"], batch["gt_scores"], batch["gt_valid"],
        _mask_targets_float(batch["gt_masks"]),
        batch["is_single_object"], batch["image_hw"], rngs,
    )
    losses_acc = {k: jnp.mean(v) for k, v in per_image_losses.items()}
    return losses_acc, mutated["batch_stats"]


def detector_forward_inference(model, variables, cfg: DetectorConfig, images, image_hw):
    """Inference -> dict(boxes [B,D,4], scores [B,D], valid [B,D],
    masks [B,D,28,28] sigmoid probs in box frame). vmapped per image."""
    images_n = _normalize(images)
    feats, rpn_out = model.apply(variables, images_n, train=False)
    names = ["P2", "P3", "P4", "P5", "P6"]
    anchors_l = [jnp.asarray(a) for a in anchor_lib.fpn_anchors(cfg.image_size)]

    def per_image(feats_b, obj_l, del_l, hw):
        proposals, _, p_valid = generate_proposals(
            anchors_l, obj_l, del_l, hw,
            cfg.rpn_pre_nms_topk_test, cfg.rpn_post_nms_topk_test, cfg.rpn_nms_thresh,
        )
        boxes_k = proposals
        stage_probs = []
        for k in range(3):
            pooled = roi_align_fpn(feats_b, boxes_k, out_size=7, sampling=cfg.pooler_sampling)
            scores, deltas = model.apply(variables, pooled, k, method=CascadeMaskRCNN.run_box_head)
            stage_probs.append(jax.nn.softmax(scores, axis=-1))
            boxes_k = clip_boxes(decode_deltas(deltas, boxes_k, weights=CASCADE_WEIGHTS[k]), hw)
        probs = sum(stage_probs) / 3.0
        fg_scores = probs[:, 0]  # single foreground class

        valid = p_valid & (fg_scores > cfg.test_score_thresh)
        keep = nms_mask(boxes_k, fg_scores, valid, iou_threshold=cfg.test_nms_thresh)
        masked = jnp.where(keep, fg_scores, -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(masked, cfg.detections_per_image)
        det_boxes = boxes_k[top_idx]
        det_valid = jnp.isfinite(top_scores)
        out = {
            "boxes": det_boxes,
            "scores": jnp.where(det_valid, top_scores, 0.0),
            "valid": det_valid,
        }
        if cfg.mask_on:
            pooled = roi_align_fpn(feats_b, det_boxes, out_size=14, sampling=cfg.pooler_sampling)
            mask_logits = model.apply(variables, pooled, method=CascadeMaskRCNN.run_mask_head)[..., 0]
            out["masks"] = jax.nn.sigmoid(mask_logits)
        return out

    feats_roi = {n: feats[n] for n in ("P2", "P3", "P4", "P5")}
    obj_levels = [rpn_out[n]["objectness"] for n in names]
    del_levels = [rpn_out[n]["deltas"] for n in names]
    return jax.vmap(per_image)(feats_roi, obj_levels, del_levels, image_hw)


def detector_forward_with_boxes(model, variables, cfg: DetectorConfig, images, image_hw,
                                boxes, boxes_valid):
    """External-proposal inference (the reference's ``use_proposals`` /
    ``predict_with_prior`` mode, ``cad/modeling/meta_arch/rcnn.py:182-227``,
    ``cad/engine/defaults.py:333-351``): skip the RPN and run the cascade
    + mask head on caller-provided boxes [B, P, 4]."""
    images_n = _normalize(images)
    feats, _ = model.apply(variables, images_n, train=False)

    def per_image(feats_b, hw, boxes_b, valid_b):
        boxes_k = boxes_b
        stage_probs = []
        for k in range(3):
            pooled = roi_align_fpn(feats_b, boxes_k, out_size=7, sampling=cfg.pooler_sampling)
            scores, deltas = model.apply(variables, pooled, k, method=CascadeMaskRCNN.run_box_head)
            stage_probs.append(jax.nn.softmax(scores, axis=-1))
            boxes_k = clip_boxes(decode_deltas(deltas, boxes_k, weights=CASCADE_WEIGHTS[k]), hw)
        probs = sum(stage_probs) / 3.0
        out = {
            "boxes": boxes_k,
            "scores": jnp.where(valid_b, probs[:, 0], 0.0),
            "valid": valid_b,
        }
        if cfg.mask_on:
            pooled = roi_align_fpn(feats_b, boxes_k, out_size=14, sampling=cfg.pooler_sampling)
            mask_logits = model.apply(variables, pooled, method=CascadeMaskRCNN.run_mask_head)[..., 0]
            out["masks"] = jax.nn.sigmoid(mask_logits)
        return out

    feats_roi = {n: feats[n] for n in ("P2", "P3", "P4", "P5")}
    return jax.vmap(per_image)(feats_roi, image_hw, boxes, boxes_valid)

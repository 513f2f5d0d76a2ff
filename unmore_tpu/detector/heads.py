"""Cascade box heads, mask head, and the CAD loss stack.

Implements the reference's three training innovations as masked
fixed-shape losses (they are already per-proposal weight vectors in the
reference, which maps perfectly onto static lattices):

* soft targets (``cad/modeling/roi_heads/fast_rcnn.py:365-382``):
  cross-entropy against [fg_prob, 1-fg_prob] stacked from the matched
  pseudo-label score;
* DropLoss (``custom_cascade_rcnn.py:196-231``): zero the cls-loss
  weight for proposals whose *predicted* box has max IoU <= 0.01 with
  any GT (likely-unlabeled objects), except on single-object (ImageNet)
  images where weights are forced to 1;
* soft box regression (``box_regression.py:14-78``): per-foreground
  smooth-L1 scaled by the matched gt score, normalized by the total
  proposal count;
* score-weighted mask BCE (``roi_heads.py:1043-1044,1188-1192``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from unmore_tpu.detector.box_ops import (
    decode_deltas,
    encode_deltas,
    match_proposals,
    pairwise_iou_xyxy,
    smooth_l1,
    subsample_labels,
)

CASCADE_IOUS = (0.5, 0.6, 0.7)
CASCADE_WEIGHTS = (
    (10.0, 10.0, 5.0, 5.0),
    (20.0, 20.0, 10.0, 10.0),
    (30.0, 30.0, 15.0, 15.0),
)


class BoxHead(nn.Module):
    """2-FC head + class scores (K+1) + class-agnostic box deltas."""

    num_classes: int = 1
    fc_dim: int = 1024
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, pooled):  # [N, 7, 7, C]
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, precision=self.precision, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, precision=self.precision, name="fc2")(x))
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype, precision=self.precision, name="cls_score")(x)
        deltas = nn.Dense(4, dtype=self.dtype, precision=self.precision, name="bbox_pred")(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class MaskHead(nn.Module):
    """4x conv3x3(256) + x2 deconv + 1x1 -> per-class mask logits."""

    num_classes: int = 1
    conv_dim: int = 256
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, pooled):  # [N, 14, 14, C]
        x = pooled
        for i in range(4):
            x = nn.relu(
                nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype,
                        precision=self.precision, name=f"mask_fcn{i + 1}")(x)
            )
        x = nn.relu(
            nn.ConvTranspose(self.conv_dim, (2, 2), strides=(2, 2), padding="VALID",
                             transpose_kernel=True, dtype=self.dtype,
                             precision=self.precision, name="deconv")(x)
        )
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, precision=self.precision, name="predictor")(x)
        return x.astype(jnp.float32)  # [N, 28, 28, K]


# ------------------------------------------------------------------ matching
def match_and_label(
    proposals: jax.Array,
    prop_valid: jax.Array,
    gt_boxes: jax.Array,
    gt_scores: jax.Array,
    gt_valid: jax.Array,
    iou_thresh: float,
):
    """Cascade-stage matching (no sampling; reference :260-314).

    Returns dict(matched_idx [P], fg [P] bool, gt_score [P],
    gt_box [P, 4]) where bg/invalid proposals have fg=False.
    """
    iou = pairwise_iou_xyxy(gt_boxes, proposals) * gt_valid[:, None]
    matched_idx, labels = match_proposals(iou, thresholds=(iou_thresh,), labels=(0, 1))
    fg = (labels == 1) & prop_valid & jnp.any(gt_valid)
    return {
        "matched_idx": matched_idx,
        "fg": fg,
        "gt_score": gt_scores[matched_idx],
        "gt_box": gt_boxes[matched_idx],
    }


def sample_stage0(
    proposals: jax.Array,
    prop_valid: jax.Array,
    gt_boxes: jax.Array,
    gt_scores: jax.Array,
    gt_valid: jax.Array,
    rng: jax.Array,
    num_samples: int = 512,
    positive_fraction: float = 0.25,
    iou_thresh: float = 0.5,
):
    """Stage-0 label-and-sample (d2 label_and_sample_proposals): append GT
    boxes to the proposal set, match at 0.5, subsample to a fixed 512
    lattice with <=25% fg. Returns the sampled lattice."""
    all_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)
    iou = pairwise_iou_xyxy(gt_boxes, all_boxes) * gt_valid[:, None]
    matched_idx, labels = match_proposals(iou, thresholds=(iou_thresh,), labels=(0, 1))
    labels = jnp.where(all_valid, labels, -1)  # invalid slots: ignore
    labels = jnp.where(jnp.any(gt_valid), labels, jnp.where(all_valid, 0, -1))
    sampled_mask, fg_mask = subsample_labels(labels, num_samples, positive_fraction, rng)

    # compact the sampled proposals into a fixed [num_samples] lattice
    order = jnp.argsort(~sampled_mask.astype(bool), stable=True)[:num_samples]
    out = {
        "boxes": all_boxes[order],
        "valid": sampled_mask.astype(bool)[order],
        "fg": fg_mask[order],
        "matched_idx": matched_idx[order],
    }
    out["gt_score"] = gt_scores[out["matched_idx"]]
    out["gt_box"] = gt_boxes[out["matched_idx"]]
    return out


# -------------------------------------------------------------------- losses
def softmax_ce_soft_targets(scores: jax.Array, fg: jax.Array, gt_score: jax.Array,
                            weights: jax.Array, valid: jax.Array) -> jax.Array:
    """CE against soft [fg_prob, bg_prob] targets with per-proposal weights.

    scores [P, 2] (class 0 = fg, class 1 = bg); fg bool [P]; gt_score [P]
    from the matched pseudo-label; weights [P] from DropLoss; valid [P].
    Mean over valid proposals (reference fast_rcnn.py:370-382).
    """
    fg_prob = jnp.where(fg, gt_score, 0.0)
    targets = jnp.stack([fg_prob, 1.0 - fg_prob], axis=1)
    logp = jax.nn.log_softmax(scores, axis=1)
    ce = -jnp.sum(targets * logp, axis=1)
    w = weights * valid
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(valid), 1.0)


def soft_box_reg_loss(proposals: jax.Array, deltas: jax.Array, fg: jax.Array,
                      gt_box: jax.Array, gt_score: jax.Array, valid: jax.Array,
                      stage_weights) -> jax.Array:
    """Score-weighted smooth-L1 on foreground proposals, normalized by the
    total proposal count (reference box_reg_loss :462-514)."""
    target = encode_deltas(proposals, gt_box, weights=stage_weights)
    l1 = jnp.sum(smooth_l1(deltas, target), axis=-1)
    w = fg.astype(jnp.float32) * gt_score
    return jnp.sum(l1 * w) / jnp.maximum(jnp.sum(valid), 1.0)


def droploss_weights(pred_boxes: jax.Array, gt_boxes: jax.Array, gt_valid: jax.Array,
                     is_single_object: jax.Array, iou_thresh: float = 0.01) -> jax.Array:
    """1 except for proposals whose predicted box overlaps no GT
    (max IoU <= thresh); ImageNet single-object images keep weight 1."""
    iou = pairwise_iou_xyxy(gt_boxes, pred_boxes) * gt_valid[:, None]
    iou_max = jnp.max(iou, axis=0)
    w = (iou_max > iou_thresh).astype(jnp.float32)
    return jnp.where(is_single_object > 0, 1.0, w)


def mask_loss_weighted(mask_logits: jax.Array, target_masks: jax.Array,
                       fg: jax.Array, gt_score: jax.Array) -> jax.Array:
    """BCE-with-logits per fg instance, weighted by its pseudo-label score.

    mask_logits [N, M, M]; target_masks [N, M, M] in [0, 1]; fg [N].
    (reference roi_heads.py:1043-1044)
    """
    x = mask_logits
    y = target_masks
    bce = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    per_inst = jnp.mean(bce, axis=(1, 2))
    w = fg.astype(jnp.float32) * gt_score
    return jnp.sum(per_inst * w) / jnp.maximum(jnp.sum(fg), 1.0)


def crop_gt_mask_to_proposals(
    gt_roi_masks: jax.Array,
    gt_boxes: jax.Array,
    matched_idx: jax.Array,
    proposals: jax.Array,
    out_size: int = 28,
):
    """Mask targets: resample each matched GT's box-frame mask over the
    proposal box.

    gt_roi_masks [G, R, R]: each GT's binary mask rasterized in its own
    box frame (TPU-native replacement for full-image bitmasks — constant
    memory per GT). For proposal p matched to gt g, target(u, v) =
    gt_mask at the image point p(u, v) mapped into g's box frame;
    outside g's box -> 0.
    """
    G, R, _ = gt_roi_masks.shape
    P = proposals.shape[0]
    masks = gt_roi_masks[matched_idx]  # [P, R, R]
    boxes_g = gt_boxes[matched_idx]  # [P, 4]
    # sample grid in image coords over the proposal box
    grid = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    px = proposals[:, 0:1] + grid[None] * (proposals[:, 2:3] - proposals[:, 0:1])  # [P, S]
    py = proposals[:, 1:2] + grid[None] * (proposals[:, 3:4] - proposals[:, 1:2])
    # map into the gt box frame [0, R)
    gw = jnp.maximum(boxes_g[:, 2:3] - boxes_g[:, 0:1], 1e-6)
    gh = jnp.maximum(boxes_g[:, 3:4] - boxes_g[:, 1:2], 1e-6)
    ux = (px - boxes_g[:, 0:1]) / gw * R - 0.5  # [P, S]
    uy = (py - boxes_g[:, 1:2]) / gh * R - 0.5

    x0 = jnp.floor(ux)
    y0 = jnp.floor(uy)
    wx = ux - x0
    wy = uy - y0
    out = 0.0
    for dy, wyv in ((0, 1 - wy), (1, wy)):
        for dx, wxv in ((0, 1 - wx), (1, wx)):
            xi = x0.astype(jnp.int32) + dx  # [P, S]
            yi = y0.astype(jnp.int32) + dy
            inb_x = (xi >= 0) & (xi < R)
            inb_y = (yi >= 0) & (yi < R)
            xc = jnp.clip(xi, 0, R - 1)
            yc = jnp.clip(yi, 0, R - 1)
            vals = jnp.take_along_axis(
                jnp.take_along_axis(masks, yc[:, :, None], axis=1),  # [P, S, R]
                xc[:, None, :], axis=2,
            )  # [P, S, S]
            w = (wyv[:, :, None] * inb_y[:, :, None]) * (wxv[:, None, :] * inb_x[:, None, :])
            out = out + vals * w
    return out  # [P, S, S] float

"""Region Proposal Network: head, losses, fixed-shape proposal generation.

Detectron2-semantics RPN (reference Base-RCNN-FPN.yaml + CAD overrides:
pre-NMS topk 2000 train / 1000 test per level, NMS 0.65, post-NMS 4000
train / 1000 test) with static shapes: per-level top-k is a fixed k,
NMS is the masked greedy kernel, post-NMS selection is a fixed-size
top-k over (score * keep) — padding slots carry -inf scores.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from unmore_tpu.detector.box_ops import (
    clip_boxes,
    decode_deltas,
    encode_deltas,
    match_proposals,
    pairwise_iou_xyxy,
    smooth_l1,
    subsample_labels,
)
from unmore_tpu.ops.nms import nms_mask


class RPNHead(nn.Module):
    """Shared 3x3 conv + per-anchor objectness / 4-delta predictions."""

    num_anchors: int = 3
    conv_dim: int = 256
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, feats: dict):
        conv = nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype,
                       precision=self.precision, name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      precision=self.precision, name="objectness_logits")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                         precision=self.precision, name="anchor_deltas")
        out = {}
        for name, x in feats.items():
            t = nn.relu(conv(x))
            B, H, W, _ = t.shape
            out[name] = {
                "objectness": obj(t).reshape(B, H * W * self.num_anchors).astype(jnp.float32),
                "deltas": deltas(t).reshape(B, H * W * self.num_anchors, 4).astype(jnp.float32),
            }
        return out


def rpn_losses(
    anchors: jax.Array,
    objectness: jax.Array,
    deltas: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    rng: jax.Array,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
):
    """Single-image RPN losses (d2 semantics; vmap over the batch).

    anchors [A, 4]; objectness [A]; deltas [A, 4]; gt_boxes [G, 4] with
    gt_valid [G]. Invalid GTs contribute zero IoU so anchors fall to bg.
    """
    iou = pairwise_iou_xyxy(gt_boxes, anchors) * gt_valid[:, None]
    matched_idx, match_labels = match_proposals(
        iou, thresholds=(0.3, 0.7), labels=(0, -1, 1), allow_low_quality=True
    )
    # images with no valid GT: all anchors bg (d2 drops such images; with
    # fixed shapes we zero the box loss via the fg mask instead)
    any_gt = jnp.any(gt_valid)
    match_labels = jnp.where(any_gt, match_labels, 0)

    sampled, fg_sampled = subsample_labels(match_labels, batch_size_per_image, positive_fraction, rng)
    num_sampled = jnp.maximum(jnp.sum(sampled), 1.0)

    # objectness: BCE with logits over sampled anchors
    labels01 = (match_labels == 1).astype(jnp.float32)
    bce = jnp.maximum(objectness, 0) - objectness * labels01 + jnp.log1p(jnp.exp(-jnp.abs(objectness)))
    loss_obj = jnp.sum(bce * sampled) / num_sampled

    # box: smooth-l1 on sampled fg anchors vs matched gt deltas
    matched_gt = gt_boxes[matched_idx]
    target_deltas = encode_deltas(anchors, matched_gt)
    l1 = jnp.sum(smooth_l1(deltas, target_deltas), axis=-1)
    loss_box = jnp.sum(l1 * fg_sampled) / num_sampled
    return {"loss_rpn_cls": loss_obj, "loss_rpn_loc": loss_box}


def generate_proposals(
    level_anchors: list[jax.Array],
    level_objectness: list[jax.Array],
    level_deltas: list[jax.Array],
    image_hw,
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_thresh: float = 0.65,
    min_size: float = 0.0,
):
    """Single-image proposal generation, fixed shapes.

    Per level: top-k by objectness -> decode -> clip -> NMS (per level,
    as d2's batched_nms with level offsets). Across levels: top
    ``post_nms_topk`` by score among kept. Returns (boxes [P, 4],
    scores [P], valid [P]).
    """
    all_boxes, all_scores, all_keep = [], [], []
    for anchors, obj, dels in zip(level_anchors, level_objectness, level_deltas):
        k = min(pre_nms_topk, obj.shape[0])
        scores, idx = jax.lax.top_k(obj, k)
        boxes = decode_deltas(dels[idx], anchors[idx])
        boxes = clip_boxes(boxes, image_hw)
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        valid = (w > min_size) & (h > min_size) & jnp.isfinite(scores)
        keep = nms_mask(boxes, scores, valid, iou_threshold=nms_thresh)
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_keep.append(keep)
    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    keep = jnp.concatenate(all_keep, axis=0)
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked_scores, min(post_nms_topk, boxes.shape[0]))
    out_boxes = boxes[top_idx]
    out_valid = jnp.isfinite(top_scores)
    return out_boxes, jnp.where(out_valid, top_scores, 0.0), out_valid

"""Box transform/matching primitives for the detector (CAD stage).

Implements the detectron2 conventions the reference CAD stack uses so a
converted checkpoint is compatible:

* Box2BoxTransform deltas (dx, dy, dw, dh) with weights and
  ``scale_clamp = log(1000/16)``
* IoU matrix and the thresholded Matcher with allow_low_quality_matches
* smooth-L1

All ops are elementwise/batched jnp — jit/vmap friendly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

SCALE_CLAMP = math.log(1000.0 / 16)


def pairwise_iou_xyxy(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU matrix [N, M] for xyxy boxes (zero for empty boxes)."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def encode_deltas(src: jax.Array, target: jax.Array, weights=(1.0, 1.0, 1.0, 1.0)) -> jax.Array:
    """(dx, dy, dw, dh) taking src boxes to target boxes (both xyxy)."""
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    scx = src[..., 0] + 0.5 * sw
    scy = src[..., 1] + 0.5 * sh
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    tcx = target[..., 0] + 0.5 * tw
    tcy = target[..., 1] + 0.5 * th
    wx, wy, ww, wh = weights
    eps = 1e-7
    return jnp.stack(
        [
            wx * (tcx - scx) / jnp.maximum(sw, eps),
            wy * (tcy - scy) / jnp.maximum(sh, eps),
            ww * jnp.log(jnp.maximum(tw, eps) / jnp.maximum(sw, eps)),
            wh * jnp.log(jnp.maximum(th, eps) / jnp.maximum(sh, eps)),
        ],
        axis=-1,
    )


def decode_deltas(deltas: jax.Array, boxes: jax.Array, weights=(1.0, 1.0, 1.0, 1.0)) -> jax.Array:
    """Apply (dx, dy, dw, dh) deltas to xyxy boxes."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=SCALE_CLAMP)
    dh = jnp.clip(deltas[..., 3] / wh, max=SCALE_CLAMP)
    ncx = dx * w + cx
    ncy = dy * h + cy
    nw = jnp.exp(dw) * w
    nh = jnp.exp(dh) * h
    return jnp.stack(
        [ncx - 0.5 * nw, ncy - 0.5 * nh, ncx + 0.5 * nw, ncy + 0.5 * nh], axis=-1
    )


def clip_boxes(boxes: jax.Array, hw) -> jax.Array:
    h, w = hw[0], hw[1]
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 0.0) -> jax.Array:
    diff = jnp.abs(pred - target)
    if beta <= 1e-5:
        return diff
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


def match_proposals(
    iou: jax.Array,
    thresholds: tuple[float, ...],
    labels: tuple[int, ...],
    allow_low_quality: bool = False,
):
    """detectron2 Matcher: iou [G, P] -> (matched_gt [P], match_labels [P]).

    thresholds/labels e.g. ((0.3, 0.7), (0, -1, 1)) for RPN,
    ((0.5,), (0, 1)) for ROI heads. match_labels: 1 fg, 0 bg, -1 ignore.
    Columns with no GT (iou all zero because G==0 padding) match bg.
    """
    matched_vals = jnp.max(iou, axis=0) if iou.shape[0] else jnp.zeros(iou.shape[1])
    matched_idx = jnp.argmax(iou, axis=0) if iou.shape[0] else jnp.zeros(iou.shape[1], jnp.int32)
    bounds = (-jnp.inf,) + tuple(thresholds) + (jnp.inf,)
    match_labels = jnp.full(iou.shape[1], labels[0], jnp.int32)
    for lo, hi, lab in zip(bounds[:-1], bounds[1:], labels):
        sel = (matched_vals >= lo) & (matched_vals < hi)
        match_labels = jnp.where(sel, lab, match_labels)
    if allow_low_quality and iou.shape[0]:
        # each gt's best-overlapping proposals are forced fg
        best_per_gt = jnp.max(iou, axis=1, keepdims=True)  # [G, 1]
        is_best = (iou == best_per_gt) & (best_per_gt > 0)
        forced = jnp.any(is_best, axis=0)
        match_labels = jnp.where(forced, 1, match_labels)
    return matched_idx.astype(jnp.int32), match_labels


def subsample_labels(
    match_labels: jax.Array,
    num_samples: int,
    positive_fraction: float,
    rng: jax.Array,
):
    """Random fg/bg subsampling (detectron2 subsample_labels semantics).

    Returns a weight mask [P] with 1.0 on sampled proposals (both fg and
    bg), 0 elsewhere, plus the sampled-fg mask. Uses ranked random keys
    so the count caps are exact under fixed shapes.
    """
    P = match_labels.shape[0]
    pos = match_labels == 1
    neg = match_labels == 0
    num_pos_cap = int(num_samples * positive_fraction)
    r = jax.random.uniform(rng, (P,))
    # rank positives by random key; keep the first num_pos_cap
    pos_rank = jnp.argsort(jnp.argsort(jnp.where(pos, r, 2.0)))
    n_pos = jnp.minimum(jnp.sum(pos), num_pos_cap)
    pos_sampled = pos & (pos_rank < n_pos)
    n_neg = num_samples - n_pos
    neg_rank = jnp.argsort(jnp.argsort(jnp.where(neg, r, 2.0)))
    neg_sampled = neg & (neg_rank < n_neg)
    return (pos_sampled | neg_sampled).astype(jnp.float32), pos_sampled

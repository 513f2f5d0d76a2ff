"""Fixed-shape, fully-batched object discovery engine (stage 2).

Re-design of reference ``object_reasoning.py`` for XLA: the reference
runs a per-image Python loop with dynamic proposal lists — filtering,
splitting and convergence change tensor sizes every step
(``object_reasoning.py:615-666``). Here every phase is a jitted
fixed-shape program over padded proposal lattices:

* proposals live in ``[P, 4]`` tensors with validity masks; "filtering"
  is a mask update, never a reshape;
* the reference's per-proposal label scheme {-1 dropped, 0 active,
  1 converged} (``object_reasoning.py:582-588``) maps directly onto a
  label lattice;
* center-singularity *splitting* writes into preallocated slots and is
  compacted on device (stable sort by validity);
* the 50-round boundary evolution is a ``lax.while_loop`` that exits as
  soon as no proposal is active — converged/dropped slots stop costing
  model FLOPs the moment the loop exits;
* crops are regenerated on device each round by a gather-based
  ``crop_and_resize``; the model forward is microbatched with
  ``lax.map`` to bound activation memory (the 128^2 conv heads dominate
  both FLOPs and memory).

Overflow of any fixed lattice (splits, CC components, active slots) is
counted and reported — never silently truncated.

Deliberate deviation from the reference: connected-component boxes are
mapped from crop space back to image coordinates before enlargement
(the reference feeds 128x128-crop-space coordinates straight into
image-space reasoning, ``object_reasoning.py:563-571``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from unmore_tpu.ops.connected_components import component_boxes, label_components
from unmore_tpu.ops.fields import center_singularity_scores
from unmore_tpu.ops.image import crop_and_resize, image_gradients
from unmore_tpu.ops.nms import nms_mask
from unmore_tpu.reasoning.proposals import max_seed_count, seed_proposals


@dataclasses.dataclass(frozen=True)
class ReasoningConfig:
    # geometry
    crop_size: int = 128
    canvas_size: int = 640  # all COCO val2017 images fit 640x640
    max_proposals: int = 2048  # seed lattice (max_seed_count(640,640)=1636)
    max_splits: int = 2048  # split/CC lattice after compaction
    max_active: int = 1024  # boundary-phase lattice
    crop_chunk: int = 32  # model microbatch under lax.map
    # thresholds (reference object_reasoning.py:700-707 defaults)
    class_score_thres: float = 0.1
    center_score_max_thres: float = 0.009
    analyze_cc: bool = True
    cc_max_components: int = 8
    cc_enlarge_ratio: float = 1.5
    max_sdf_thres: float = 0.5
    max_shrink_threshold: float = 16.0
    delta_ratio: float = 0.5
    n_round: int = 50
    proposal_area_thres: float = 50.0
    nms_iou: float = 0.5


def _chunked_map(fn: Callable, x: jax.Array, chunk: int):
    """Apply fn over axis-0 chunks of x (padded), bounding peak memory."""
    n = x.shape[0]
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    xs = x.reshape((n + pad) // chunk, chunk, *x.shape[1:])
    ys = jax.lax.map(fn, xs)
    return jax.tree_util.tree_map(lambda y: y.reshape(-1, *y.shape[2:])[:n], ys)


def _compact(boxes: jax.Array, valid: jax.Array, out_slots: int):
    """Stable-gather valid rows to the front of a fixed-size lattice.

    Returns (boxes [out_slots,4], valid [out_slots], n_valid, n_overflow).
    """
    order = jnp.argsort(~valid, stable=True)
    boxes = boxes[order][:out_slots]
    sorted_valid = valid[order]
    out_valid = sorted_valid[:out_slots]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    overflow = jnp.maximum(n_valid - out_slots, 0)
    return boxes, out_valid, n_valid, overflow


class ObjectDiscoveryEngine:
    """Batched center-boundary reasoning over one padded image canvas.

    Parameters
    ----------
    objectness_apply: (crops [B,S,S,3], compute_center: bool) ->
        dict(sdf_maps [B,S,S], center_fields [B,S,S,2] if requested)
    classifier_apply: crops [B,S,S,3] -> scores [B]
    """

    def __init__(self, objectness_apply, classifier_apply, config: ReasoningConfig = ReasoningConfig()):
        self.cfg = config
        self._objectness = objectness_apply
        self._classifier = classifier_apply
        c = config

        self._existence_j = jax.jit(self._existence_scores)
        self._center_j = jax.jit(functools.partial(self._center_phase, analyze_cc=c.analyze_cc))
        self._center_nocc_j = jax.jit(functools.partial(self._center_phase, analyze_cc=False))
        self._boundary_j = jax.jit(self._boundary_phase)
        self._nms_j = jax.jit(functools.partial(nms_mask, iou_threshold=c.nms_iou))
        self._compact_j = jax.jit(functools.partial(_compact, out_slots=c.max_active))
        self._compact_splits_j = jax.jit(functools.partial(_compact, out_slots=c.max_splits))

    # ---------------------------------------------------------------- crops
    def _crops(self, canvas, boxes):
        return crop_and_resize(canvas, boxes, out_size=self.cfg.crop_size, chunk=64)

    def _predict_sdf(self, crops):
        fn = lambda x: self._objectness(x, False)["sdf_maps"]
        return _chunked_map(fn, crops, self.cfg.crop_chunk)

    def _predict_fields(self, crops):
        fn = lambda x: self._objectness(x, True)
        out = _chunked_map(fn, crops, self.cfg.crop_chunk)
        return out["sdf_maps"], out["center_fields"]

    # ------------------------------------------------------------ existence
    def _existence_scores(self, canvas, boxes, valid):
        """Existence-classifier scores per box (reference :491-523)."""
        crops = self._crops(canvas, boxes)
        scores = _chunked_map(self._classifier, crops, self.cfg.crop_chunk)
        scores = scores.reshape(-1)
        return jnp.where(valid, scores, 0.0)

    # --------------------------------------------------------------- center
    def _center_phase(self, canvas, hw, boxes, valid, analyze_cc: bool):
        """Singularity check + box splitting + CC analysis (reference :525-580).

        Returns dict with pass mask, split boxes lattice and counts.
        """
        c = self.cfg
        S = c.crop_size
        h, w = hw[0], hw[1]
        crops = self._crops(canvas, boxes)
        sdf, center = self._predict_fields(crops)
        sing, argmax_yx, union = center_singularity_scores(sdf, center)

        fail = valid & (sing > c.center_score_max_thres)
        passed = valid & ~fail

        # 4-way split at the singularity argmax (reference :546-559)
        x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
        yr = argmax_yx[:, 0].astype(jnp.float32) / S
        xr = argmax_yx[:, 1].astype(jnp.float32) / S
        xm = x1 + (x2 - x1) * xr
        ym = y1 + (y2 - y1) * yr
        splits = jnp.stack(
            [
                jnp.stack([x1, y1, xm, y2], -1),
                jnp.stack([xm, y1, x2, y2], -1),
                jnp.stack([x1, y1, x2, ym], -1),
                jnp.stack([x1, ym, x2, y2], -1),
            ],
            axis=1,
        )  # [P, 4, 4]
        split_valid = jnp.broadcast_to(fail[:, None], splits.shape[:2])

        out = {
            "passed": passed,
            "split_boxes": splits.reshape(-1, 4),
            "split_valid": split_valid.reshape(-1),
            "singularity_scores": sing,
        }

        if analyze_cc:
            # connected components of passing proposals' union masks;
            # multi-component masks contribute enlarged per-component boxes
            def one(mask):
                labels = label_components(mask, max_iters=256)
                return component_boxes(labels, max_components=c.cc_max_components)

            cc_boxes, cc_valid, cc_counts = jax.lax.map(one, union)
            multi = passed & (cc_counts > 1)
            # map crop coords -> image coords through the proposal box
            sx = ((x2 - x1) / S)[:, None]
            sy = ((y2 - y1) / S)[:, None]
            bx1 = x1[:, None] + cc_boxes[..., 0] * sx
            by1 = y1[:, None] + cc_boxes[..., 1] * sy
            bx2 = x1[:, None] + cc_boxes[..., 2] * sx
            by2 = y1[:, None] + cc_boxes[..., 3] * sy
            # enlarge around the center (reference enlarge_proposals :258-291,
            # truncating to ints and clipping to the image)
            cx, cy = (bx1 + bx2) / 2, (by1 + by2) / 2
            nw = (bx2 - bx1) * c.cc_enlarge_ratio
            nh = (by2 - by1) * c.cc_enlarge_ratio
            ex1 = jnp.floor(jnp.maximum(cx - nw / 2, 0.0))
            ey1 = jnp.floor(jnp.maximum(cy - nh / 2, 0.0))
            ex2 = jnp.floor(jnp.minimum(cx + nw / 2, w))
            ey2 = jnp.floor(jnp.minimum(cy + nh / 2, h))
            cc_out = jnp.stack([ex1, ey1, ex2, ey2], axis=-1).reshape(-1, 4)
            cc_out_valid = (cc_valid & multi[:, None]).reshape(-1)
            out["cc_boxes"] = cc_out
            out["cc_valid"] = cc_out_valid
            out["cc_overflow"] = jnp.sum(
                jnp.where(passed, jnp.maximum(cc_counts - c.cc_max_components, 0), 0)
            )
        return out

    # ------------------------------------------------------------- boundary
    def _boundary_step_deltas(self, sdf):
        """Per-box edge movements from the SDF (reference :139-174)."""
        dy, dx = image_gradients(sdf)
        grad_norm = jnp.sqrt(dy**2 + dx**2)[:, :-1, :-1]
        sdf_m = sdf[:, :-1, :-1]
        soft_fg = jax.nn.sigmoid(sdf_m)
        soft_bg = 1.0 - soft_fg
        avg_fg = jnp.sum(soft_fg * grad_norm, (1, 2)) / (jnp.sum(soft_fg, (1, 2)) + 1e-8)
        avg_bg = jnp.sum(soft_bg * grad_norm, (1, 2)) / (jnp.sum(soft_bg, (1, 2)) + 1e-8)
        step_fg = 1.0 / (avg_fg + 1e-10)
        step_bg = 1.0 / (avg_bg + 1e-10)
        step = step_fg[:, None, None] * soft_fg + step_bg[:, None, None] * soft_bg
        movement = step * sdf_m
        d_x1 = -jnp.max(movement[:, :, 0], axis=1)
        d_y1 = -jnp.max(movement[:, 0, :], axis=1)
        d_x2 = jnp.max(movement[:, :, -1], axis=1)
        d_y2 = jnp.max(movement[:, -1, :], axis=1)
        return d_x1, d_y1, d_x2, d_y2

    def _boundary_phase(self, canvas, hw, boxes, valid):
        """Iterative boundary-driven box evolution (reference :582-612,379-488).

        Returns (boxes, labels, rounds_used). labels: -1 dropped,
        0 still-active (ran out of rounds), 1 converged.
        """
        c = self.cfg
        S = c.crop_size
        h, w = hw[0], hw[1]
        labels0 = jnp.where(valid, 0.0, -1.0)

        def cond(state):
            boxes, labels, rnd = state
            return (rnd < c.n_round) & jnp.any(labels == 0)

        def body(state):
            boxes, labels, rnd = state
            x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
            # area filter applies to every surviving proposal each round
            # (reference filter_small_proposal :293-299)
            area = (x2 - x1) * (y2 - y1)
            labels = jnp.where((labels >= 0) & (area <= c.proposal_area_thres), -1.0, labels)
            active = labels == 0

            sdf = self._predict_sdf(self._crops(canvas, boxes))
            max_sdf = jnp.max(sdf, axis=(1, 2))
            labels = jnp.where(active & (max_sdf <= c.max_sdf_thres), -1.0, labels)
            active = labels == 0

            d_x1, d_y1, d_x2, d_y2 = self._boundary_step_deltas(sdf)

            on_edge = jnp.stack(
                [
                    jnp.floor(x1) == 0,
                    jnp.floor(y1) == 0,
                    jnp.ceil(x2) == w,
                    jnp.ceil(y2) == h,
                ],
                axis=1,
            )
            signed = jnp.stack([-d_x1, -d_y1, d_x2, d_y2], axis=1)
            signed = jnp.where((signed > 0) & on_edge, 0.0, signed)
            max_exp = jnp.max(signed, axis=1)
            max_shr = jnp.min(signed, axis=1)
            converged = (max_exp <= 0) & (max_shr >= -c.max_shrink_threshold)
            labels = jnp.where(active & converged, 1.0, labels)

            # overshoot by delta_ratio (reference :457-460)
            d_x1 = d_x1 - jnp.abs(d_x1) * c.delta_ratio
            d_y1 = d_y1 - jnp.abs(d_y1) * c.delta_ratio
            d_x2 = d_x2 + jnp.abs(d_x2) * c.delta_ratio
            d_y2 = d_y2 + jnp.abs(d_y2) * c.delta_ratio

            still_active = labels == 0
            xr = (x2 - x1) / S
            yr = (y2 - y1) / S
            new = jnp.stack(
                [
                    jnp.clip(x1 + d_x1 * xr, 0.0, w),
                    jnp.clip(y1 + d_y1 * yr, 0.0, h),
                    jnp.clip(x2 + d_x2 * xr, 0.0, w),
                    jnp.clip(y2 + d_y2 * yr, 0.0, h),
                ],
                axis=1,
            )
            boxes = jnp.where(still_active[:, None], new, boxes)
            return boxes, labels, rnd + 1

        boxes, labels, rounds = jax.lax.while_loop(cond, body, (boxes, labels0, jnp.int32(0)))
        return boxes, labels, rounds

    # ----------------------------------------------------------- full image
    def discover(self, image: np.ndarray) -> dict:
        """Run full discovery on one image [H, W, 3] float32 in [0, 1].

        Returns dict(boxes [N,4] np.ndarray xyxy, stats dict).
        """
        c = self.cfg
        h, w = image.shape[:2]
        if h > c.canvas_size or w > c.canvas_size:
            raise ValueError(f"image {h}x{w} exceeds canvas {c.canvas_size}")
        canvas = np.zeros((c.canvas_size, c.canvas_size, 3), np.float32)
        canvas[:h, :w] = image
        canvas = jnp.asarray(canvas)
        hw = jnp.asarray([h, w], jnp.float32)

        seeds = seed_proposals(h, w).astype(np.float32)
        n_seed = len(seeds)
        if n_seed > c.max_proposals:
            raise ValueError(f"{n_seed} seeds exceed lattice {c.max_proposals}")
        boxes = np.zeros((c.max_proposals, 4), np.float32)
        boxes[:n_seed] = seeds
        boxes = jnp.asarray(boxes)
        valid = jnp.arange(c.max_proposals) < n_seed

        stats = {"n_seed": n_seed}

        # step 1: existence checking
        scores = self._existence_j(canvas, boxes, valid)
        valid = valid & (scores >= c.class_score_thres)
        stats["n_exist"] = int(jnp.sum(valid))
        if stats["n_exist"] == 0:
            return {"boxes": np.zeros((0, 4), np.float32), "stats": stats}

        # step 2: center reasoning
        center_out = self._center_j(canvas, hw, boxes, valid)
        passed = center_out["passed"]
        split_boxes = center_out["split_boxes"]
        split_valid = center_out["split_valid"]
        if c.analyze_cc:
            split_boxes = jnp.concatenate([split_boxes, center_out["cc_boxes"]], axis=0)
            split_valid = jnp.concatenate([split_valid, center_out["cc_valid"]], axis=0)
            stats["cc_overflow"] = int(center_out["cc_overflow"])
        split_boxes, split_valid, n_split, split_overflow = self._compact_splits_j(split_boxes, split_valid)
        stats["n_split"] = int(n_split)
        stats["split_overflow"] = int(split_overflow)

        # re-check split proposals: existence then singularity (reference :639-646)
        if stats["n_split"] > 0:
            s_scores = self._existence_j(canvas, split_boxes, split_valid)
            split_valid = split_valid & (s_scores >= c.class_score_thres)
            recheck = self._center_nocc_j(canvas, hw, split_boxes, split_valid)
            split_passed = recheck["passed"]
        else:
            split_passed = jnp.zeros_like(split_valid)

        all_boxes = jnp.concatenate([boxes, split_boxes], axis=0)
        all_valid = jnp.concatenate([passed, split_passed], axis=0)
        act_boxes, act_valid, n_act, act_overflow = self._compact_j(all_boxes, all_valid)
        stats["n_boundary_in"] = int(n_act)
        stats["active_overflow"] = int(act_overflow)
        if stats["n_boundary_in"] == 0:
            return {"boxes": np.zeros((0, 4), np.float32), "stats": stats}

        # step 3: boundary reasoning
        final_boxes, labels, rounds = self._boundary_j(canvas, hw, act_boxes, act_valid)
        stats["boundary_rounds"] = int(rounds)
        keep = labels == 1
        stats["n_converged"] = int(jnp.sum(keep))
        if stats["n_converged"] == 0:
            return {"boxes": np.zeros((0, 4), np.float32), "stats": stats}

        # NMS (scores are all 1 -> deterministic index-order tie-break)
        nms_keep = self._nms_j(final_boxes, jnp.ones(final_boxes.shape[0]), keep)
        out_boxes = np.asarray(final_boxes)[np.asarray(nms_keep)]
        stats["n_final"] = len(out_boxes)
        return {"boxes": out_boxes, "stats": stats}

"""Object scoring: turn discovered boxes into scored COCO annotations.

Re-design of reference ``object_scoring.py:43-272``. The split of labor
is TPU-idiomatic: everything per-crop (model forwards, field decodes,
score reductions) runs as one fixed-shape jitted program; the per-image
full-resolution work (mask paste-back, RLE encoding, tight boxes) runs
on the host where variable image sizes are natural.

Per proposal:
  center score   = max ||center field||            (reference :188-190)
  boundary score = max SDF                          (:192-193)
  masks: (||center||>.5) and (sigmoid(sdf)>.5) pasted back into the
  full-image canvas at the box location, union = (sum > 0)  (:195-228)
  tight box from the union mask (RLE toBbox)        (:230-235)
  NMS on tight boxes scored by boundary score       (:237-243)
  area score = (mask area / max kept area)^0.25     (:244-245)
  final = existence * center * boundary * area^0.25 (:255)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from unmore_tpu.ops.image import crop_and_resize, paste_mask_into_canvas
from unmore_tpu.ops.nms import nms_mask
from unmore_tpu import native as rle_codec  # C++ RLE fast path (numpy fallback inside)


@dataclasses.dataclass(frozen=True)
class ScoringConfig:
    crop_size: int = 128
    canvas_size: int = 640
    slot_multiple: int = 128  # proposals padded to a multiple of this
    crop_chunk: int = 128  # both-model microbatch (528 vs 363 crops/s at 32, measured)
    nms_iou: float = 0.5


class ObjectScoringEngine:
    """Model fns take (variables, crops, ...) — variables are threaded
    through jit as arguments, never closed over (see engine.py)."""

    def __init__(self, objectness_fn, classifier_fn, config: ScoringConfig = ScoringConfig(), variables=None):
        self.cfg = config
        self._objectness = objectness_fn
        self._classifier = classifier_fn
        self.variables = {} if variables is None else variables
        self._device_fn = jax.jit(self._device_scores)
        self._nms_j = jax.jit(functools.partial(nms_mask, iou_threshold=config.nms_iou))

    def _device_scores(self, variables, canvas, boxes, valid):
        c = self.cfg
        crops = crop_and_resize(canvas, boxes, out_size=c.crop_size, chunk=64)

        def chunked(fn, x):
            n = x.shape[0]
            pad = (-n) % c.crop_chunk
            if pad:
                x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
            xs = x.reshape(-1, c.crop_chunk, *x.shape[1:])
            ys = jax.lax.map(fn, xs)
            return jax.tree_util.tree_map(lambda y: y.reshape(-1, *y.shape[2:])[:n], ys)

        fields = chunked(lambda x: self._objectness(variables, x, True), crops)
        exist = chunked(lambda x: self._classifier(variables, x), crops).reshape(-1)
        sdf = fields["sdf_maps"]
        center = fields["center_fields"]
        center_norm = jnp.linalg.norm(center, axis=-1)
        return {
            "existence": jnp.where(valid, exist, 0.0),
            "center_score": jnp.max(center_norm, axis=(1, 2)),
            "boundary_score": jnp.max(sdf, axis=(1, 2)),
            "center_mask": (center_norm > 0.5).astype(jnp.uint8),
            "boundary_mask": (jax.nn.sigmoid(sdf) > 0.5).astype(jnp.uint8),
        }

    def score_image(self, image: np.ndarray, boxes: np.ndarray, image_id) -> list[dict]:
        """image [H, W, 3] in [0,1]; boxes [N, 4] xyxy. Returns COCO anns."""
        c = self.cfg
        h, w = image.shape[:2]
        n = len(boxes)
        if n == 0:
            return []
        slots = -(-n // c.slot_multiple) * c.slot_multiple
        canvas = np.zeros((c.canvas_size, c.canvas_size, 3), np.float32)
        canvas[:h, :w] = image
        padded = np.zeros((slots, 4), np.float32)
        padded[:n] = boxes
        valid = np.arange(slots) < n

        out = self._device_fn(self.variables, jnp.asarray(canvas), jnp.asarray(padded), jnp.asarray(valid))
        out = {k: np.asarray(v) for k, v in out.items()}

        # host: paste-back + union + tight boxes
        union_masks = []
        tight = np.zeros((slots, 4), np.float32)
        for i in range(n):
            cm = paste_mask_into_canvas(out["center_mask"][i].astype(np.float32), boxes[i], (h, w))
            bm = paste_mask_into_canvas(out["boundary_mask"][i].astype(np.float32), boxes[i], (h, w))
            union = ((cm + bm) > 0).astype(np.uint8)
            union_masks.append(union)
            ys, xs = np.nonzero(union)
            if len(ys):
                x, y = float(xs.min()), float(ys.min())
                bw, bh = float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)
            else:
                x = y = bw = bh = 0.0
            tight[i] = [x, y, x + bw, y + bh]

        keep = np.asarray(
            self._nms_j(jnp.asarray(tight), jnp.asarray(out["boundary_score"]), jnp.asarray(valid))
        )
        keep_idx = np.nonzero(keep)[0]
        if len(keep_idx) == 0:
            return []

        areas = np.array([union_masks[i].sum() for i in keep_idx], np.float64)
        max_area = max(areas.max(), 1.0)
        anns = []
        for i, area in zip(keep_idx, areas):
            area_score = float((area / max_area) ** 0.25)
            existence = float(out["existence"][i])
            center_s = float(out["center_score"][i])
            boundary_s = float(out["boundary_score"][i])
            x1, y1, x2, y2 = tight[i]
            enc = rle_codec.encode(union_masks[i])
            anns.append(
                {
                    "image_id": image_id,
                    "category_id": 1,
                    "score": existence * center_s * boundary_s * area_score,
                    "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                    "segmentation": enc,
                    "existence_score": existence,
                    "center_score": center_s,
                    "boundary_score": boundary_s,
                    "area_score": area_score,
                }
            )
        return anns

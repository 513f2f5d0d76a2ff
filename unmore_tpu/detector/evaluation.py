"""Detector inference -> COCO predictions, and dataset evaluation.

The TPU analog of the reference eval loop
(``cad/engine/defaults.py:642-695`` + ``cad/evaluation/coco_evaluation.py``):
images are resized into the fixed square canvas, batched inference runs
under jit, detections are mapped back to original image coordinates and
(optionally) 28x28 box-frame mask probabilities are pasted to full
resolution and RLE-encoded. Metrics come from
:mod:`unmore_tpu.evaluation.coco_eval`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from unmore_tpu.detector.cascade_rcnn import DetectorConfig, detector_forward_inference
from unmore_tpu.ops.image import paste_mask_into_canvas
from unmore_tpu.utils import rle as rle_codec


def prepare_eval_image(image: np.ndarray, canvas_size: int, min_size: int = 800):
    """Resize shorter side to min_size (capped by canvas), pad to square.

    Returns (canvas [S,S,3] uint8, scale, (nh, nw)) — uint8 is the wire
    format (4x less host->device transfer; the model normalizes on
    device, cascade_rcnn._normalize)."""
    import cv2

    h0, w0 = image.shape[:2]
    scale = min_size / min(h0, w0)
    scale = min(scale, canvas_size / max(h0, w0))
    nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    if resized.dtype != np.uint8:
        resized = np.clip(resized * 255.0 + 0.5, 0, 255).astype(np.uint8)
    canvas = np.zeros((canvas_size, canvas_size, 3), np.uint8)
    canvas[:nh, :nw] = resized
    return canvas, scale, (nh, nw)


def detections_to_coco(
    dets: dict, image_id, scale: float, orig_hw: tuple[int, int],
    batch_index: int = 0, with_masks: bool = True, mask_thresh: float = 0.5,
) -> list[dict]:
    """One image's fixed-lattice detections -> COCO annotation dicts."""
    boxes = np.asarray(dets["boxes"][batch_index])
    scores = np.asarray(dets["scores"][batch_index])
    valid = np.asarray(dets["valid"][batch_index])
    masks = np.asarray(dets["masks"][batch_index]) if with_masks and "masks" in dets else None
    h0, w0 = orig_hw
    anns = []
    for i in np.nonzero(valid)[0]:
        x1, y1, x2, y2 = boxes[i] / scale
        x1, x2 = np.clip([x1, x2], 0, w0)
        y1, y2 = np.clip([y1, y2], 0, h0)
        if x2 - x1 < 1e-3 or y2 - y1 < 1e-3:
            continue
        ann = {
            "image_id": image_id,
            "category_id": 1,
            "score": float(scores[i]),
            "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
        }
        if masks is not None:
            prob = paste_mask_into_canvas(
                masks[i].astype(np.float32), np.array([x1, y1, x2, y2]), (h0, w0)
            )
            ann["segmentation"] = rle_codec.encode((prob > mask_thresh).astype(np.uint8))
        anns.append(ann)
    return anns


class DetectorEvaluator:
    """Batched jit inference over an image iterator -> COCO predictions.

    With ``mesh`` (a data-parallel ``Mesh`` over local devices), the
    inference batch is sharded along axis 0 and params are replicated —
    one GSPMD program uses every local chip (the reference instead gives
    each GPU its own process via InferenceSampler,
    ``cad/data/build.py:488-550``). Batch size must then be a multiple
    of the mesh size.
    """

    def __init__(self, model, variables, cfg: DetectorConfig, min_size_test: int = 800,
                 mesh=None):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        # host numpy trees would re-upload on every jit call; pin once
        if mesh is not None:
            from unmore_tpu.parallel.mesh import replicate

            self.variables = replicate(mesh, variables)
        else:
            self.variables = jax.device_put(variables)
        self.min_size_test = min_size_test
        self._infer = jax.jit(
            lambda v, images, hw: detector_forward_inference(model, v, cfg, images, hw)
        )

    def predict_image(self, image: np.ndarray, image_id) -> list[dict]:
        return self.predict_batch([image], [image_id])

    def predict_batch(self, images: list, image_ids: list) -> list[dict]:
        """One jitted inference call over a stack of canvases.

        The reference evaluates one image per forward
        (``cad/engine/defaults.py:679-683`` InferenceSampler batch 1); on
        TPU a batch amortizes the dispatch + trunk cost — measured 27.6
        vs 3.6 img/s at canvas 1024 (scripts/cad_profile_results.json).
        Returns the concatenated COCO annotation dicts.
        """
        S = self.cfg.image_size
        B = len(images)
        canvases = np.zeros((B, S, S, 3), np.uint8)
        hw = np.ones((B, 2), np.float32)
        scales = []
        for i, image in enumerate(images):
            canvases[i], scale, (nh, nw) = prepare_eval_image(image, S, self.min_size_test)
            hw[i] = (nh, nw)
            scales.append(scale)
        if self.mesh is not None:
            from unmore_tpu.parallel.mesh import shard_batch

            n_dev = self.mesh.devices.size
            if B % n_dev:
                raise ValueError(
                    f"eval batch {B} must be a multiple of the {n_dev}-device mesh"
                )
            canv_j, hw_j = shard_batch(self.mesh, (canvases, hw))
        else:
            canv_j, hw_j = jnp.asarray(canvases), jnp.asarray(hw)
        dets = jax.device_get(self._infer(self.variables, canv_j, hw_j))
        anns = []
        for i, image_id in enumerate(image_ids):
            anns.extend(
                detections_to_coco(
                    dets, image_id, scales[i], images[i].shape[:2],
                    batch_index=i, with_masks=self.cfg.mask_on,
                )
            )
        return anns

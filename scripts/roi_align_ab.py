"""ROIAlign sampling-ratio A/B (VERDICT round-2 item 10).

detectron2 pools with ``sampling_ratio=0`` — per-ROI, per-axis adaptive
sample counts (``ceil(roi_size_feat / out_size)``; reference pooler
config cad/modeling/roi_heads/roi_heads.py:426-431). Round 1 fixed the
count at 2x2 for static shapes. Round 2 added an exact jit-able
adaptive mode (roi_align.py::roi_align_level_adaptive). This script
quantifies the deviation:

  1. value-level: pooled-feature deltas fixed-2 vs adaptive across the
     FPN-banded ROI size distribution;
  2. AP-level: the tiny-fixture detector evaluated twice with identical
     weights, pooler_sampling=2 vs "adaptive"; reports per-metric AP
     deltas.

Run: JAX_PLATFORMS=cpu python scripts/roi_align_ab.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def value_level_ab(rng):
    import jax.numpy as jnp

    from unmore_tpu.detector.roi_align import roi_align_level, roi_align_level_adaptive

    print("value-level |fixed2 - adaptive| by ROI size (stride 16, out 7):")
    feat = jnp.asarray(rng.rand(64, 64, 8).astype(np.float32))
    for side in (56, 112, 224, 448, 896):
        boxes = []
        for _ in range(64):
            x1 = rng.rand() * (1024 - side)
            y1 = rng.rand() * (1024 - side)
            s = side * (0.75 + 0.5 * rng.rand())
            boxes.append([x1, y1, x1 + s, y1 + s])
        boxes = jnp.asarray(np.asarray(boxes, np.float32))
        fixed = roi_align_level(feat, boxes, 16, 7, 2)
        adaptive = roi_align_level_adaptive(feat, boxes, 16, 7)
        d = np.abs(np.asarray(fixed) - np.asarray(adaptive))
        ratio = int(np.ceil(side / 16 / 7))
        print(
            f"  side~{side:4d}px (true ratio {ratio}): max|d|={d.max():.4f} "
            f"mean|d|={d.mean():.5f} rel={d.mean() / (np.abs(np.asarray(adaptive)).mean() + 1e-9):.4%}"
        )


def ap_level_ab(rng):
    import dataclasses

    import jax

    from tests.test_detector import _tiny_batch, _tiny_cfg
    from unmore_tpu.detector.cascade_rcnn import CascadeMaskRCNN, detector_forward_inference
    from unmore_tpu.evaluation.coco_eval import evaluate_ap

    from unmore_tpu.train.detector import (
        init_detector_state,
        make_detector_optimizer,
        make_detector_train_step,
    )

    cfg2 = _tiny_cfg()
    model2 = CascadeMaskRCNN(cfg2)
    batch = _tiny_batch(cfg2, B=4)

    # briefly train on the fixture (fixed-2 pooler) so the A/B compares a
    # model that actually detects its GT boxes, not random-weight noise
    tx = make_detector_optimizer(base_lr=0.01, warmup_iters=0)
    state = init_detector_state(model2, tx, jax.random.PRNGKey(0), cfg2)
    step = make_detector_train_step(model2, tx, cfg2)
    for i in range(40):
        state, losses = step(state, batch)
    print(f"fixture-trained: loss {float(losses['total']):.3f} after 40 steps")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    gt_images, gt_anns, preds = [], [], {2: [], "adaptive": []}
    ann_id = 1
    for b in range(4):
        gt_images.append({"id": b + 1, "file_name": f"{b}.jpg",
                          "height": cfg2.image_size, "width": cfg2.image_size})
        for g in range(int(np.asarray(batch["gt_valid"][b]).sum())):
            box = np.asarray(batch["gt_boxes"][b][g])
            gt_anns.append({
                "id": ann_id, "image_id": b + 1, "category_id": 1,
                "bbox": [float(box[0]), float(box[1]), float(box[2] - box[0]), float(box[3] - box[1])],
                "area": float((box[2] - box[0]) * (box[3] - box[1])), "iscrowd": 0,
            })
            ann_id += 1

    for mode in (2, "adaptive"):
        cfg_m = dataclasses.replace(cfg2, pooler_sampling=mode)
        model_m = CascadeMaskRCNN(cfg_m)
        out = jax.jit(
            lambda v, im, hw: detector_forward_inference(model_m, v, cfg_m, im, hw)
        )(variables, batch["images"], batch["image_hw"])
        for b in range(4):
            boxes = np.asarray(out["boxes"][b])
            scores = np.asarray(out["scores"][b])
            valid = np.asarray(out["valid"][b])
            for i in np.nonzero(valid)[0]:
                x1, y1, x2, y2 = boxes[i]
                preds[mode].append({
                    "image_id": b + 1, "category_id": 1, "score": float(scores[i]),
                    "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                })

    gt = {"images": gt_images, "annotations": gt_anns, "categories": [{"id": 1, "name": "fg"}]}
    m2 = evaluate_ap(gt, preds[2])["bbox"]
    ma = evaluate_ap(gt, preds["adaptive"])["bbox"]
    print("AP-level A/B (same fixture-trained weights, tiny fixture):")
    print("  metric    fixed2  adaptive   delta")
    for k in ("AP", "AP50", "AP75", "AR100"):
        print(f"  {k:8s} {m2[k]:7.4f} {ma[k]:9.4f} {ma[k] - m2[k]:+8.4f}")


def main():
    rng = np.random.RandomState(0)
    value_level_ab(rng)
    ap_level_ab(rng)


if __name__ == "__main__":
    main()

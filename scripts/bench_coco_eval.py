"""COCOeval throughput benchmark: C++ matcher + vectorized IoU vs the
pure-Python fallback, on a synthetic 5000-image / 100-dets eval
(VERDICT round-2 item 6: "Done" = >=10x with identical metrics).

Usage: python scripts/bench_coco_eval.py [--images 5000] [--dets 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unmore_tpu import native
from unmore_tpu.evaluation.coco_eval import COCOMetrics


def synth_eval_set(n_images: int, n_gt: int, n_det: int, seed=0):
    rng = np.random.RandomState(seed)
    images, annotations, preds = [], [], []
    ann_id = 1
    for i in range(1, n_images + 1):
        images.append({"id": i, "file_name": f"{i}.jpg", "height": 480, "width": 640})
        gts = []
        for _ in range(n_gt):
            x, y = rng.rand() * 500, rng.rand() * 380
            w, h = rng.rand() * 120 + 16, rng.rand() * 120 + 16
            gts.append([x, y, w, h])
            annotations.append(
                {
                    "id": ann_id, "image_id": i, "category_id": 1,
                    "bbox": [x, y, w, h], "area": w * h,
                    "iscrowd": int(rng.rand() < 0.05),
                }
            )
            ann_id += 1
        for d in range(n_det):
            if d < n_gt and rng.rand() < 0.7:  # jittered true positive
                x, y, w, h = gts[d]
                j = rng.randn(4) * 6
                bbox = [x + j[0], y + j[1], max(w + j[2], 4), max(h + j[3], 4)]
            else:  # background false positive
                bbox = [rng.rand() * 500, rng.rand() * 380, rng.rand() * 100 + 8, rng.rand() * 100 + 8]
            preds.append(
                {"image_id": i, "category_id": 1, "bbox": bbox, "score": float(rng.rand())}
            )
    gt = {"images": images, "annotations": annotations, "categories": [{"id": 1, "name": "fg"}]}
    return gt, preds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=5000)
    ap.add_argument("--gts", type=int, default=10)
    ap.add_argument("--dets", type=int, default=100)
    args = ap.parse_args()

    gt, preds = synth_eval_set(args.images, args.gts, args.dets)
    ev = COCOMetrics(gt, iou_type="bbox", class_agnostic=True)

    assert native.available(), "native lib must build for the fast path"
    t0 = time.perf_counter()
    fast = ev.evaluate(preds)
    t_fast = time.perf_counter() - t0
    print(f"fast path ({args.images} imgs x {args.dets} dets): {t_fast:.2f}s")

    # force the pure-Python fallback (matcher off) for a subset
    sub = max(args.images // 20, 1)
    gt_s, preds_s = synth_eval_set(sub, args.gts, args.dets)
    ev_s = COCOMetrics(gt_s, iou_type="bbox", class_agnostic=True)
    orig = native.coco_match
    try:
        native.coco_match = lambda *a, **k: None
        t0 = time.perf_counter()
        slow_sub = ev_s.evaluate(preds_s)
        t_slow_sub = time.perf_counter() - t0
    finally:
        native.coco_match = orig
    fast_sub = ev_s.evaluate(preds_s)
    for k in fast_sub:
        a, b = fast_sub[k], slow_sub[k]
        assert (np.isnan(a) and np.isnan(b)) or abs(a - b) < 1e-12, (k, a, b)
    print(f"metrics identical fast vs fallback on {sub}-img subset")
    t_slow_est = t_slow_sub * args.images / sub
    print(
        f"fallback: {t_slow_sub:.2f}s on {sub} imgs -> est {t_slow_est:.1f}s full; "
        f"speedup ~{t_slow_est / t_fast:.1f}x"
    )
    print({k: round(v, 4) for k, v in fast.items()})


if __name__ == "__main__":
    main()

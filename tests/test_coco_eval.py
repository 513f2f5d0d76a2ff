"""COCO metrics tests against hand-computed AP/AR values."""

import numpy as np

from unmore_tpu.evaluation.coco_eval import COCOMetrics, bbox_iou, evaluate_ap
from unmore_tpu.utils import rle


def _gt(images, anns):
    return {
        "images": [{"id": i, "height": 100, "width": 100} for i in images],
        "annotations": [
            {
                "id": k,
                "image_id": a[0],
                "category_id": 1,
                "bbox": list(a[1]),
                "area": a[1][2] * a[1][3],
                "iscrowd": a[2] if len(a) > 2 else 0,
            }
            for k, a in enumerate(anns)
        ],
    }


def _det(image_id, bbox, score):
    return {"image_id": image_id, "category_id": 1, "bbox": list(bbox), "score": score}


def test_bbox_iou_with_crowd():
    dt = np.array([[0, 0, 10, 10]], np.float64)
    gt = np.array([[0, 0, 10, 10], [5, 5, 10, 10]], np.float64)
    m = bbox_iou(dt, gt, np.array([0, 0]))
    assert abs(m[0, 0] - 1.0) < 1e-9
    assert abs(m[0, 1] - 25 / 175) < 1e-9
    m = bbox_iou(dt, gt, np.array([0, 1]))
    assert abs(m[0, 1] - 25 / 100) < 1e-9  # crowd: inter / det area


def test_perfect_detection():
    gt = _gt([1], [(1, (10, 10, 20, 20)), (1, (50, 50, 30, 30))])
    dets = [_det(1, (10, 10, 20, 20), 0.9), _det(1, (50, 50, 30, 30), 0.8)]
    m = COCOMetrics(gt).evaluate(dets)
    assert abs(m["AP"] - 1.0) < 1e-6
    assert abs(m["AP50"] - 1.0) < 1e-6
    assert abs(m["AR100"] - 1.0) < 1e-6
    assert abs(m["AR1"] - 0.5) < 1e-6  # only one det allowed


def test_iou_060_detection():
    # det IoU with GT is exactly 0.6: TP at thresholds .5,.55,.6 only
    gt = _gt([1], [(1, (0, 0, 10, 10))])
    dets = [_det(1, (0, 0, 10, 6), 0.9)]
    m = COCOMetrics(gt).evaluate(dets)
    assert abs(m["AP50"] - 1.0) < 1e-6
    assert abs(m["AP75"] - 0.0) < 1e-6
    assert abs(m["AP"] - 0.3) < 1e-6


def test_false_positive_halves_precision():
    gt = _gt([1], [(1, (10, 10, 20, 20))])
    dets = [
        _det(1, (70, 70, 10, 10), 0.95),  # FP, ranked first
        _det(1, (10, 10, 20, 20), 0.90),  # TP
    ]
    m = COCOMetrics(gt).evaluate(dets)
    assert abs(m["AP50"] - 0.5) < 1e-6
    assert abs(m["AR100"] - 1.0) < 1e-6


def test_crowd_gt_is_ignored_not_fp():
    gt = _gt([1], [(1, (10, 10, 20, 20)), (1, (60, 60, 20, 20), 1)])
    dets = [
        _det(1, (60, 60, 20, 20), 0.95),  # matches the crowd -> ignored
        _det(1, (10, 10, 20, 20), 0.90),  # TP
    ]
    m = COCOMetrics(gt).evaluate(dets)
    assert abs(m["AP50"] - 1.0) < 1e-6


def test_area_range_buckets():
    # one small (16x16=256 < 32^2) and one large (97x97 > 96^2) GT
    gt = _gt([1], [(1, (0, 0, 16, 16)), (1, (2, 2, 97, 97))])
    dets = [_det(1, (0, 0, 16, 16), 0.9), _det(1, (2, 2, 97, 97), 0.8)]
    m = COCOMetrics(gt).evaluate(dets)
    assert abs(m["APs"] - 1.0) < 1e-6
    assert abs(m["APl"] - 1.0) < 1e-6
    assert np.isnan(m["APm"])  # no medium GT anywhere


def test_missed_gt_lowers_recall():
    gt = _gt([1], [(1, (10, 10, 20, 20)), (1, (60, 60, 20, 20))])
    dets = [_det(1, (10, 10, 20, 20), 0.9)]
    m = COCOMetrics(gt).evaluate(dets)
    assert abs(m["AR100"] - 0.5) < 1e-6
    # precision 1 up to recall .5 then 0; 101-point interpolation -> 51/101
    assert abs(m["AP50"] - 51 / 101) < 1e-6


def test_segm_evaluation():
    mask_gt = np.zeros((100, 100), np.uint8)
    mask_gt[10:30, 10:30] = 1
    mask_dt = np.zeros((100, 100), np.uint8)
    mask_dt[10:30, 10:30] = 1
    gt = _gt([1], [(1, (10, 10, 20, 20))])
    gt["annotations"][0]["segmentation"] = rle.encode(mask_gt)
    det = _det(1, (10, 10, 20, 20), 0.9)
    det["segmentation"] = rle.encode(mask_dt)
    out = evaluate_ap(gt, [det], iou_types=("bbox", "segm"))
    assert abs(out["bbox"]["AP"] - 1.0) < 1e-6
    assert abs(out["segm"]["AP"] - 1.0) < 1e-6


def test_score_fallback_to_weight():
    gt = _gt([1], [(1, (10, 10, 20, 20))])
    det = {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "weight": 0.7}
    out = evaluate_ap(gt, [det])
    assert abs(out["bbox"]["AP50"] - 1.0) < 1e-6

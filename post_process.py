#!/usr/bin/env python
"""Threshold-filter scored discoveries into detector training labels.

Reference-compatible (``post_process.py``): keeps annotations with
existence >= t1, center >= t2, boundary >= t3; sets score <- area_score;
writes ``selected_training_annotations.json`` next to the input with the
GT image list attached. The hard-coded GT path of the reference
(:49-54) is replaced by ``--gt_annotation_path``.
"""

import argparse
import json
import os

CATEGORIES = {"is_crowd": 0, "id": 1}


def convert_pred_annotations_to_training_format(selected, gt_annotation_path, out_path):
    with open(gt_annotation_path) as f:
        gt = json.load(f)
    training = {
        "categories": CATEGORIES,
        "images": gt["images"],
        "annotations": selected,
    }
    with open(out_path, "w") as f:
        json.dump(training, f, indent=2)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pred_annotations_path", type=str, default=None)
    p.add_argument("--existence_score_thres", type=float, default=0.5)
    p.add_argument("--center_score_thres", type=float, default=0.8)
    p.add_argument("--boundary_score_thres", type=float, default=0.75)
    p.add_argument("--dataset", type=str, default="COCO")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--gt_annotation_path", type=str, required=True,
                   help="cls-agnostic instances JSON for the split")
    args = p.parse_args(argv)

    result_folder = "/".join(args.pred_annotations_path.split("/")[0:-1])
    with open(os.path.join(result_folder, "configs_post_process.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    with open(args.pred_annotations_path) as f:
        pred_annotations = json.load(f)

    selected = []
    for ann in pred_annotations:
        if ann["existence_score"] < args.existence_score_thres:
            continue
        if ann["center_score"] < args.center_score_thres:
            continue
        if ann["boundary_score"] < args.boundary_score_thres:
            continue
        ann["id"] = len(selected)
        ann["score"] = ann["area_score"]
        selected.append(ann)

    out_path = os.path.join(result_folder, "selected_training_annotations.json")
    convert_pred_annotations_to_training_format(selected, args.gt_annotation_path, out_path)
    print(f"kept {len(selected)}/{len(pred_annotations)} annotations -> {out_path}")


if __name__ == "__main__":
    main()

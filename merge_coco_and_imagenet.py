#!/usr/bin/env python
"""Merge COCO pseudo-labels with ImageNet VoteCut labels for CAD training.

Reference-compatible (``merge_coco_and_imagenet.py``): prefixes image
ids with ``coco_``/``imagenet_``, maps ImageNet ``weight`` to ``score``
and drops < 0.5, re-indexes annotation ids, single ``fg`` category.
Writes ``merged_with_imagenet/COCO_merged_IN_training_format.json``.
"""

import argparse
import json
import os

CATEGORIES = [{"id": 1, "name": "fg", "supercategory": "fg"}]


def merge(coco_training: dict, imagenet_training: dict) -> dict:
    out = {"categories": CATEGORIES, "images": [], "annotations": []}
    for info in imagenet_training["images"]:
        info = dict(info)
        info["id"] = "imagenet_" + str(info["id"])
        out["images"].append(info)
    for info in coco_training["images"]:
        info = dict(info)
        info["id"] = "coco_" + str(info["id"])
        out["images"].append(info)

    anns = []
    for ann in imagenet_training["annotations"]:
        ann = dict(ann)
        ann["score"] = ann["weight"]
        if ann["score"] < 0.5:
            continue
        ann["image_id"] = "imagenet_" + str(ann["image_id"])
        anns.append(ann)
    for ann in coco_training["annotations"]:
        ann = dict(ann)
        ann["image_id"] = "coco_" + str(ann["image_id"])
        anns.append(ann)
    for idx, ann in enumerate(anns):
        ann["id"] = idx
    out["annotations"] = anns
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coco_annotations_training_format_path", type=str, default=None)
    p.add_argument("--imagenet_annotations_training_format_path", type=str, default=None)
    args = p.parse_args(argv)

    result_folder = "/".join(args.coco_annotations_training_format_path.split("/")[0:-1])
    result_folder = os.path.join(result_folder, "merged_with_imagenet")
    os.makedirs(result_folder, exist_ok=True)

    with open(args.coco_annotations_training_format_path) as f:
        coco = json.load(f)
    with open(args.imagenet_annotations_training_format_path) as f:
        imagenet = json.load(f)

    out = merge(coco, imagenet)
    print("# of merged images", len(out["images"]))
    print("total number of annotations", len(out["annotations"]))
    out_path = os.path.join(result_folder, "COCO_merged_IN_training_format.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""COCO* construction: merge human-annotated extra labels with COCO.

Re-implementation of the reference COCO* merge tooling
(``COCO*/utils/merge_extra_labels_with_original.py``): unions the
category tables, concatenates annotations, re-densifies annotation ids,
and emits both the class-aware ``COCO*_val2017.json`` and the
class-agnostic ``COCO*_val2017_cls_agnostic.json`` (single ``fg``
category). Paths are flags instead of hard-coded strings.
"""

import argparse
import json
import os


def merge_annotations(original: dict, extra: dict) -> dict:
    """Union categories, concatenate + re-index annotations."""
    merged = dict(original)
    seen_cat_ids = {c["id"] for c in original["categories"]}
    categories = list(original["categories"])
    for c in extra["categories"]:
        if c["id"] not in seen_cat_ids:
            categories.append(c)
    anns = [dict(a) for a in original["annotations"]] + [dict(a) for a in extra["annotations"]]
    for idx, ann in enumerate(anns):
        ann["id"] = idx
    merged["categories"] = categories
    merged["annotations"] = anns
    return merged


def to_class_agnostic(merged: dict) -> dict:
    out = dict(merged)
    anns = [dict(a) for a in merged["annotations"]]
    for idx, ann in enumerate(anns):
        ann["id"] = idx
        ann["category_id"] = 1
    out["annotations"] = anns
    out["categories"] = [{"id": 1, "name": "fg", "supercategory": "fg"}]
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--original_annotations", required=True, help="instances_val2017.json")
    p.add_argument("--extra_annotations", required=True,
                   help="COCO*_val2017_extra_labels_with_mask.json")
    p.add_argument("--out_dir", required=True)
    args = p.parse_args(argv)

    with open(args.original_annotations) as f:
        original = json.load(f)
    with open(args.extra_annotations) as f:
        extra = json.load(f)

    merged = merge_annotations(original, extra)
    agnostic = to_class_agnostic(merged)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "COCO_star_val2017.json"), "w") as f:
        json.dump(merged, f)
    with open(os.path.join(args.out_dir, "COCO_star_val2017_cls_agnostic.json"), "w") as f:
        json.dump(agnostic, f)
    print(
        f"merged: {len(merged['annotations'])} annotations, "
        f"{len(merged['categories'])} categories, {len(merged['images'])} images"
    )


if __name__ == "__main__":
    main()

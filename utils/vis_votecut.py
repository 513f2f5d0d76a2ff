#!/usr/bin/env python
"""Visualize / export VoteCut pseudo-mask annotations.

Counterpart of reference ``utils/vis_votecut.py`` (:43-79): reads the
VoteCut annotation JSON (``imagenet_train_votecut_kmax_3_tuam_0.2.json``
format), writes per-image instance-id mask PNGs under
``<out>/masks/<cls>/`` (ids re-densified like the reference's
``unify_instance_id``) and hue-colorized visualizations under
``<out>/masks_vis/<cls>/``, plus the per-image object-count histogram
the reference prints. Hard-coded paths become flags; pycocotools is
replaced by the in-repo RLE codec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unmore_tpu.utils import rle as rle_codec
from unmore_tpu.utils.vis import vis_label_map


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--votecut_json", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--limit", type=int, default=0, help="0 = all images")
    ap.add_argument("--no_vis", action="store_true",
                    help="write only the id-mask PNGs, skip colorized previews")
    args = ap.parse_args(argv)

    import cv2

    with open(args.votecut_json) as f:
        data = json.load(f)
    anns_by_img = defaultdict(list)
    for ann in data["annotations"]:
        anns_by_img[ann["image_id"]].append(ann)
    images = sorted(data["images"], key=lambda im: im["id"])
    if args.limit:
        images = images[: args.limit]

    os.makedirs(os.path.join(args.out_dir, "masks"), exist_ok=True)
    if not args.no_vis:
        os.makedirs(os.path.join(args.out_dir, "masks_vis"), exist_ok=True)

    obj_count: Counter = Counter()
    for info in images:
        anns = anns_by_img.get(info["id"], [])
        h, w = info["height"], info["width"]
        label_map = np.zeros((h, w), np.int32)
        # densified instance ids 1..N (reference unify_instance_id :32-40)
        for new_id, ann in enumerate(sorted(anns, key=lambda a: a["id"]), start=1):
            m = rle_codec.decode(ann["segmentation"]).astype(bool)
            label_map[m] = new_id
        obj_count[len(anns)] += 1

        cls_dir = os.path.dirname(info["file_name"])
        base = os.path.basename(info["file_name"]).replace("JPEG", "png").replace("jpg", "png")
        mdir = os.path.join(args.out_dir, "masks", cls_dir)
        os.makedirs(mdir, exist_ok=True)
        cv2.imwrite(os.path.join(mdir, base), label_map.astype(np.uint8))
        if not args.no_vis:
            vdir = os.path.join(args.out_dir, "masks_vis", cls_dir)
            os.makedirs(vdir, exist_ok=True)
            cv2.imwrite(os.path.join(vdir, base), vis_label_map(label_map)[..., ::-1])

    print("object-count histogram:", dict(sorted(obj_count.items())))
    print(f"wrote {len(images)} mask PNGs to {args.out_dir}")


if __name__ == "__main__":
    main()

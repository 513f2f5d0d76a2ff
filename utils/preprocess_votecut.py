#!/usr/bin/env python
"""VoteCut preprocessing: top-1 mask PNGs + full instance-mask PNGs.

Re-implementation of the reference's two preprocessing utilities
(``utils/preprocess_votecut.py`` and ``utils/vis_votecut.py``) in one
CLI with explicit path flags (the reference hard-codes them):

* ``--mode top1`` (default): per image, pick the annotation with the
  highest ``weight``, RLE-decode, keep the LARGEST 4-connected
  component, write ``masks_top1_single_component/<class>/<name>.png``
  (255 = foreground).
* ``--mode full``: rasterize every annotation into one instance-id map
  (ids re-densified in ascending order), write
  ``masks/<class>/<name>.png`` — the background-region source for
  existence-classifier negatives.
"""

import argparse
import json
import os
import sys
from collections import defaultdict

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from unmore_tpu import native  # noqa: E402
from unmore_tpu.utils import rle as rle_codec  # noqa: E402


def largest_component_4(mask: np.ndarray) -> np.ndarray:
    num, labels, stats, _ = cv2.connectedComponentsWithStats(mask.astype(np.uint8), 4, cv2.CV_32S)
    if num <= 1:
        return mask.astype(np.uint8)
    areas = stats[1:, -1]
    keep = int(np.argmax(areas)) + 1
    return (labels == keep).astype(np.uint8)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--annotation_file", required=True,
                   help="votecut annotation json (imagenet_train_votecut_kmax_3_tuam_0.2.json)")
    p.add_argument("--dest_folder", required=True)
    p.add_argument("--mode", choices=["top1", "full"], default="top1")
    args = p.parse_args(argv)

    with open(args.annotation_file) as f:
        data = json.load(f)
    id_to_fname = {im["id"]: im["file_name"] for im in data["images"]}
    id_to_hw = {im["id"]: (im.get("height"), im.get("width")) for im in data["images"]}
    anns_by_image = defaultdict(list)
    for ann in data["annotations"]:
        anns_by_image[ann["image_id"]].append(ann)

    sub = "masks_top1_single_component" if args.mode == "top1" else "masks"
    os.makedirs(os.path.join(args.dest_folder, sub), exist_ok=True)

    for n, image_id in enumerate(sorted(anns_by_image)):
        fname = id_to_fname[image_id]
        anns = anns_by_image[image_id]
        out_dir = os.path.join(args.dest_folder, sub, os.path.dirname(fname))
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(args.dest_folder, sub, fname).rsplit(".", 1)[0] + ".png"

        if args.mode == "top1":
            best = max(anns, key=lambda a: a.get("weight", 0.0))
            mask = native.decode(best["segmentation"])
            if mask.sum() > 0:
                mask = largest_component_4(mask)
            cv2.imwrite(out_path, mask * 255)
        else:
            h, w = id_to_hw[image_id]
            canvas = np.zeros((h, w), np.int32)
            for ann in anns:
                m = native.decode(ann["segmentation"])
                canvas = np.maximum(canvas, m.astype(np.int32) * ann["id"])
            # densify instance ids in ascending order, starting at 1
            out = np.zeros_like(canvas)
            for new_id, obj in enumerate([o for o in sorted(np.unique(canvas)) if o != 0], start=1):
                out[canvas == obj] = new_id
            cv2.imwrite(out_path, out.astype(np.uint8))
        if (n + 1) % 1000 == 0:
            print(f"{n + 1}/{len(anns_by_image)}", flush=True)
    print("done:", len(anns_by_image), "images")


if __name__ == "__main__":
    main()

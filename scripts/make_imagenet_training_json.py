"""Emit a VoteCut-style ImageNet training-format JSON for the synthetic
stage-1 world.

The reference recipe's merge step (``merge_coco_and_imagenet.py``,
reference ``script.sh:46-48``) consumes
``imagenet_train_votecut_kmax_3_tuam_0.2.json`` — COCO-shaped
{images, annotations} where each annotation carries a VoteCut
``weight`` (mapped to ``score`` by the merge, dropped < 0.5). That
artifact doesn't ship in this image, so the at-scale e2e builds the
equivalent from the synthetic single-shape world's exact masks
(``scripts/make_synthetic_shapes.py`` stage-1 layout): one annotation
per image, weight 1.0, RLE from the mask PNG, file_name relative to
the imagenet root (the CAD loader joins it under
``--image-root imagenet=...``).

Usage: python scripts/make_imagenet_training_json.py \
           --synth /tmp/synth500 --out /tmp/synth500/imagenet_training.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unmore_tpu.utils.rle import encode as encode_rle  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synth", required=True, help="world root (imagenet/ + masks/)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--weight", type=float, default=1.0)
    args = ap.parse_args()

    img_root = os.path.join(args.synth, "imagenet")
    mask_root = os.path.join(args.synth, "masks")
    images, annotations = [], []
    ann_id = 1
    img_id = 1
    for cls in sorted(os.listdir(mask_root)):
        for fname in sorted(os.listdir(os.path.join(mask_root, cls))):
            mask = cv2.imread(os.path.join(mask_root, cls, fname), cv2.IMREAD_GRAYSCALE)
            if mask is None or mask.max() == 0:
                continue
            m = mask > 127
            ys, xs = np.nonzero(m)
            jpeg = os.path.splitext(fname)[0] + ".JPEG"
            if not os.path.exists(os.path.join(img_root, cls, jpeg)):
                continue
            h, w = m.shape
            images.append(
                {"id": img_id, "file_name": f"{cls}/{jpeg}", "height": h, "width": w}
            )
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": [
                        int(xs.min()),
                        int(ys.min()),
                        int(xs.max() - xs.min() + 1),
                        int(ys.max() - ys.min() + 1),
                    ],
                    "area": int(m.sum()),
                    "iscrowd": 0,
                    "weight": args.weight,
                    "segmentation": encode_rle(m),
                }
            )
            ann_id += 1
            img_id += 1
    out = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "fg", "supercategory": "fg"}],
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"{len(images)} images, {len(annotations)} annotations -> {args.out}")


if __name__ == "__main__":
    main()

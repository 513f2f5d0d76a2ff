#!/usr/bin/env python
"""Stage-2 scoring CLI (reference-compatible flags + JSON contract).

Reads ``discovery_results.json``, scores every box, writes
``object_discovery_with_scores.json`` (COCO annotation list with
existence/center/boundary/area sub-scores) next to the input — the
reference contract (``object_scoring.py:271-272``).
"""

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gpu_index", type=int, default=0, help="ignored (TPU build)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--run_name", type=str, default=None)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--backbone_type", type=str, default="dpt_large")
    p.add_argument("--sdf_activation", type=str, default=None)
    p.add_argument("--use_bg_sdf", action="store_true")
    p.add_argument("--objectness_resume", type=str, default=None)
    p.add_argument("--binary_classifier_resume", type=str, default=None)
    p.add_argument("--start_idx", type=int, default=-1)
    p.add_argument("--end_idx", type=int, default=-1)
    p.add_argument("--dataset_split", type=str, default="test")
    p.add_argument("--dataset", type=str, default="COCO")
    p.add_argument("--raw_annotations_path", type=str, default=None)
    # TPU-build flags
    p.add_argument("--coco_image_dir", type=str, required=True)
    p.add_argument("--coco_annotations", type=str, required=True)
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--canvas_size", type=int, default=640)
    p.add_argument("--crop_chunk", type=int, default=128)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

    from unmore_tpu.cli.common import (
        NpEncoder,
        build_classifier,
        build_objectness,
        load_classifier_variables,
        load_objectness_params,
        make_apply_fns,
    )
    from unmore_tpu.data.coco import COCOImages
    from unmore_tpu.reasoning.scoring import ObjectScoringEngine, ScoringConfig

    result_folder = "/".join(args.raw_annotations_path.split("/")[0:-1])
    with open(os.path.join(result_folder, "configs_object_scoring.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    print("result_folder", result_folder)

    with open(args.raw_annotations_path) as f:
        raw_annotations = json.load(f)
    print("# of loaded images", len(raw_annotations))

    objectness = build_objectness(args, args.dtype)
    classifier = build_classifier(args.dtype)
    obj_params = load_objectness_params(args.objectness_resume)
    cls_vars = load_classifier_variables(args.binary_classifier_resume)
    objectness_fn, classifier_fn, variables = make_apply_fns(objectness, obj_params, classifier, cls_vars)

    engine = ObjectScoringEngine(
        objectness_fn,
        classifier_fn,
        ScoringConfig(crop_size=args.image_size, canvas_size=args.canvas_size, crop_chunk=args.crop_chunk),
        variables=variables,
    )

    dataset = COCOImages(args.coco_image_dir, args.coco_annotations, args.start_idx, args.end_idx)
    out_annotations = []
    t0 = time.time()
    for idx in range(len(dataset)):
        image, image_id = dataset.get(idx)
        if str(image_id) not in raw_annotations:
            continue
        boxes = np.asarray(raw_annotations[str(image_id)], np.float32).reshape(-1, 4)
        anns = engine.score_image(image, boxes, int(image_id))
        out_annotations.extend(anns)
        done = idx + 1
        print(f"[{done}/{len(dataset)}] image {image_id}: {len(anns)} anns "
              f"({done / (time.time() - t0):.3f} img/s)", flush=True)

    print("# of final annotations", len(out_annotations))
    out_path = os.path.join(result_folder, "object_discovery_with_scores.json")
    with open(out_path, "w") as f:
        json.dump(out_annotations, f, indent=2, cls=NpEncoder)
    print("wrote", out_path)


if __name__ == "__main__":
    main()

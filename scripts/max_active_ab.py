"""A/B the boundary-lattice capacity for AP on the dense tail (VERDICT r4).

The engine's boundary phase runs on a fixed ``max_active``-per-image
lattice; the reference keeps unbounded Python candidate lists and never
truncates (``/root/reference/object_reasoning.py:615-666``). Round 4's
dense scenes overflowed the then-default 1024 lattice by 575-963
candidates per 4-image group (``active_overflow`` in the discovery
stats) with an unmeasured AP effect. This script quantifies it:

* leg A ("main"): the main scale run's already-scored annotations
  (produced at ``--main_max_active``, demand-sized so overflow is 0),
  filtered to the dense-tail subset and evaluated against the subset GT;
* leg B ("truncated"): fresh discovery + scoring on the same subset at
  ``--max_active`` (default 1024 — the old lattice), with the engine's
  score-ranked shedding, evaluated identically.

The delta is the measured cost of the 1024-lattice truncation on the
densest scenes. Both legs share the scorer and the evaluation protocol;
the only variable is the boundary-lattice capacity.

Usage (after the main run's step_scoring):

  python scripts/max_active_ab.py --synth /tmp/synth500 \
      --objectness <obj.ckpt> --classifier <cls.ckpt> \
      --main_scored $WORK/results_reasoning/disc_r5/object_discovery_with_scores.json \
      --main_max_active 1536 --max_active 1024 \
      --start_idx 0 --end_idx 40 --out scripts/max_active_ab_results.json
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sticky_ab import run_mode  # noqa: E402  (same directory)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synth", required=True)
    ap.add_argument("--objectness", required=True)
    ap.add_argument("--classifier", required=True)
    ap.add_argument("--main_scored", required=True,
                    help="object_discovery_with_scores.json from the main "
                         "scale run (the non-truncated leg)")
    ap.add_argument("--main_max_active", type=int, required=True,
                    help="max_active the main run used (provenance only)")
    ap.add_argument("--max_active", type=int, default=1024,
                    help="the truncated leg's boundary-lattice capacity")
    ap.add_argument("--canvas_size", type=int, default=512)
    ap.add_argument("--image_batch", type=int, default=4)
    ap.add_argument("--start_idx", type=int, default=0)
    ap.add_argument("--end_idx", type=int, default=40)
    ap.add_argument("--sdf_activation", default=None)
    ap.add_argument("--backbone_type", default="dpt_large")
    ap.add_argument("--use_bg_sdf", action="store_true", default=True)
    ap.add_argument("--boundary_segment", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

    from unmore_tpu.cli.common import (
        build_classifier, build_objectness, load_classifier_variables,
        load_objectness_params, make_apply_fns,
    )
    from unmore_tpu.data.coco import COCOImages
    from unmore_tpu.evaluation.coco_eval import evaluate_ap
    from unmore_tpu.reasoning.engine import ReasoningConfig
    from unmore_tpu.reasoning.scoring import ObjectScoringEngine, ScoringConfig

    objectness = build_objectness(args, "bfloat16")
    classifier = build_classifier("bfloat16")
    obj_params = load_objectness_params(args.objectness)
    cls_vars = load_classifier_variables(args.classifier)
    objectness_fn, classifier_fn, variables = make_apply_fns(
        objectness, obj_params, classifier, cls_vars
    )
    dataset = COCOImages(
        os.path.join(args.synth, "coco", "images"),
        os.path.join(args.synth, "coco", "instances.json"),
        args.start_idx, args.end_idx,
    )
    subset_ids = {int(dataset.image_id(i)) for i in range(len(dataset))}
    with open(os.path.join(args.synth, "coco", "instances.json")) as f:
        gt = json.load(f)
    gt = dict(
        gt,
        images=[im for im in gt["images"] if im["id"] in subset_ids],
        annotations=[a for a in gt["annotations"] if a["image_id"] in subset_ids],
    )
    print(f"subset: {len(gt['images'])} images, {len(gt['annotations'])} GT anns")

    meta = {
        "n_images": len(dataset),
        "start_idx": args.start_idx,
        "end_idx": args.end_idx,
        "synth": args.synth,
        "recorded_utc": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%M"
        ),
        "backend": jax.default_backend(),
    }
    report = {"meta": meta}

    # ---- leg A: the main run's annotations, filtered to the subset ----
    with open(args.main_scored) as f:
        main_anns = [a for a in json.load(f) if int(a["image_id"]) in subset_ids]
    m = evaluate_ap(gt, main_anns, iou_types=("bbox", "segm"))
    report["main"] = {
        "max_active": args.main_max_active,
        "bbox_AP": round(m["bbox"]["AP"], 4),
        "bbox_AP50": round(m["bbox"]["AP50"], 4),
        "segm_AP": round(m["segm"]["AP"], 4),
        "segm_AP50": round(m["segm"]["AP50"], 4),
        "n_annotations": len(main_anns),
    }
    print(json.dumps(report["main"], indent=2), flush=True)

    # ---- leg B: fresh discovery at the truncated lattice --------------
    cfg = ReasoningConfig(
        canvas_size=args.canvas_size, image_batch=args.image_batch,
        max_active=args.max_active, boundary_segment=args.boundary_segment,
    )
    boxes_by_img, crops, wall = run_mode(
        cfg, variables, objectness_fn, classifier_fn, dataset, args.image_batch
    )
    scorer = ObjectScoringEngine(
        objectness_fn, classifier_fn,
        ScoringConfig(canvas_size=args.canvas_size, image_batch=args.image_batch),
        variables=variables,
    )
    anns = []
    ids = sorted(boxes_by_img)
    for base in range(0, len(ids), args.image_batch):
        chunk = ids[base: base + args.image_batch]
        images = [dataset.get_by_id(i)[0] for i in chunk]
        blist = [boxes_by_img[i].reshape(-1, 4) for i in chunk]
        for a in scorer.score_batch(images, blist, chunk):
            anns.extend(a)
    m = evaluate_ap(gt, anns, iou_types=("bbox", "segm"))
    report["truncated"] = {
        "max_active": args.max_active,
        "bbox_AP": round(m["bbox"]["AP"], 4),
        "bbox_AP50": round(m["bbox"]["AP50"], 4),
        "segm_AP": round(m["segm"]["AP"], 4),
        "segm_AP50": round(m["segm"]["AP50"], 4),
        "n_annotations": len(anns),
        "active_overflow": int(crops["active_overflow"]),
        "split_overflow": int(crops["split_overflow"]),
        "discovery_wall_s": round(wall, 1),
    }
    print(json.dumps(report["truncated"], indent=2), flush=True)

    a, b = report["main"], report["truncated"]
    report["delta_main_minus_truncated"] = {
        k: round(a[k] - b[k], 4)
        for k in ("bbox_AP", "bbox_AP50", "segm_AP", "segm_AP50")
    }
    print(json.dumps(report["delta_main_minus_truncated"], indent=2))

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "max_active_ab_results.json"
        if jax.default_backend() == "tpu" else "max_active_ab_results_cpu.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()

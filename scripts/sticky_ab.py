"""A/B the sticky-convergence deviation for AP (VERDICT r3 item 3).

The engine's default freezes converged boxes (label 1 sticky — they
stop costing model FLOPs, measured 9.9x fewer boundary crops); the
reference re-predicts every surviving box all n_round rounds
(``/root/reference/object_reasoning.py:393`` resets labels each round).
This script runs BOTH modes with *trained* weights over the synthetic
shape world (exact GT), scores + evaluates each, and records the
AP/AP50 deltas plus the measured crop-load ratio.

Usage (after training stage-1 on the shape world, see STATUS.md):

  python scripts/sticky_ab.py \
      --synth /tmp/synth_r3 \
      --objectness <objectness.ckpt> --classifier <classifier.ckpt> \
      [--canvas_size 512 --image_batch 4 --scenes 24]

Writes scripts/sticky_ab_results.json on TPU (…_cpu.json elsewhere, so
CPU smokes never clobber recorded chip numbers).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(engine_cfg, variables, objectness_fn, classifier_fn, dataset, image_batch):
    from unmore_tpu.reasoning.engine import ObjectDiscoveryEngine

    engine = ObjectDiscoveryEngine(objectness_fn, classifier_fn, engine_cfg, variables=variables)
    results = {}
    crops = {"boundary": 0, "existence": 0, "center": 0,
             "split_overflow": 0, "active_overflow": 0, "cc_overflow": 0}
    t0 = time.time()
    n = len(dataset)
    for base in range(0, n, image_batch):
        group = [dataset.get(i) for i in range(base, min(base + image_batch, n))]
        outs = engine.discover_batch([g[0] for g in group])
        for (image, image_id), out in zip(group, outs):
            results[int(image_id)] = np.asarray(out["boxes"], np.float32)
        # trace / n_* are GROUP-level stats (shared lattice): count once
        s = outs[0]["stats"]
        crops["boundary"] += sum(s.get("boundary_active_trace", []))
        crops["existence"] += sum(o["stats"]["n_seed"] for o in outs) + s.get("n_split", 0)
        crops["center"] += s.get("n_center_in", 0) + s.get("n_recheck_center_in", 0)
        for k in ("split_overflow", "active_overflow", "cc_overflow"):
            crops[k] += int(s.get(k, 0))
        print(f"  [{min(base + image_batch, n)}/{n}]", flush=True)
    wall = time.time() - t0
    return results, crops, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synth", required=True)
    ap.add_argument("--objectness", required=True)
    ap.add_argument("--classifier", required=True)
    ap.add_argument("--canvas_size", type=int, default=512)
    ap.add_argument("--image_batch", type=int, default=4)
    ap.add_argument("--max_active", type=int, default=None,
                    help="override ReasoningConfig.max_active — the "
                         "boundary-lattice capacity A/B for the measured "
                         "active_overflow at scale (images keep ~20%% more "
                         "candidates at 2048; does the AP move?)")
    ap.add_argument("--max_splits", type=int, default=None,
                    help="override ReasoningConfig.max_splits — at scale "
                         "dense split phases overflow the per-image split "
                         "lattice too (split_overflow in discovery stats)")
    ap.add_argument("--start_idx", type=int, default=-1,
                    help="scene-index subset (with --end_idx): lets the "
                         "at-scale A/B bound the slow reference-rounds leg; "
                         "GT is filtered to the subset for evaluation")
    ap.add_argument("--end_idx", type=int, default=-1)
    ap.add_argument("--sdf_activation", default=None)
    ap.add_argument("--backbone_type", default="dpt_large")
    ap.add_argument("--use_bg_sdf", action="store_true", default=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--modes", default="sticky,reference_rounds",
                    help="comma list; a partial run merges into an existing "
                         "results file (lets a crashed leg be retried alone)")
    ap.add_argument("--boundary_segment", type=int, default=5,
                    help="host-driven boundary segmentation (rounds per device "
                         "call): reference mode re-predicts every box for all "
                         "50 rounds, and one multi-minute XLA execution trips "
                         "the TPU worker watchdog through the relay")
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
    with open(os.path.join(args.synth, "coco", "instances.json")) as f:
        gt = json.load(f)
    if args.start_idx != -1 or args.end_idx != -1:
        keep = {int(dataset.image_id(i)) for i in range(len(dataset))}
        gt = dict(
            gt,
            images=[im for im in gt["images"] if im["id"] in keep],
            annotations=[a for a in gt["annotations"] if a["image_id"] in keep],
        )
        print(f"subset: {len(gt['images'])} images, {len(gt['annotations'])} GT anns")

    scorer = ObjectScoringEngine(
        objectness_fn, classifier_fn,
        ScoringConfig(canvas_size=args.canvas_size, image_batch=args.image_batch),
        variables=variables,
    )

    # provenance stamp (ADVICE r4): bench.py and scale_report.py must be
    # able to tell a fresh A/B from a stale merge of an older world
    import datetime

    run_meta = {
        "n_images": len(dataset),
        "start_idx": args.start_idx,
        "end_idx": args.end_idx,
        "synth": args.synth,
        "max_active": args.max_active,
        "max_splits": args.max_splits,
        "recorded_utc": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%M"
        ),
        "backend": jax.default_backend(),
    }

    on_tpu_early = jax.default_backend() == "tpu"
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "sticky_ab_results.json" if on_tpu_early else "sticky_ab_results_cpu.json",
    )
    report = {}
    if os.path.isfile(out_path):
        with open(out_path) as f:
            report.update(json.load(f))
    wanted = {m.strip() for m in args.modes.split(",")}
    for mode, sticky in (("sticky", True), ("reference_rounds", False)):
        if mode not in wanted:
            continue
        print(f"== discovery [{mode}]", flush=True)
        cfg_kw = {}
        if args.max_active is not None:
            cfg_kw["max_active"] = args.max_active
        if args.max_splits is not None:
            cfg_kw["max_splits"] = args.max_splits
        cfg = ReasoningConfig(
            canvas_size=args.canvas_size, image_batch=args.image_batch,
            sticky_convergence=sticky, boundary_segment=args.boundary_segment,
            **cfg_kw,
        )
        boxes_by_img, crops, wall = run_mode(
            cfg, variables, objectness_fn, classifier_fn, dataset, args.image_batch
        )
        print(f"== scoring [{mode}]", flush=True)
        anns = []
        ids = sorted(boxes_by_img)
        for base in range(0, len(ids), args.image_batch):
            chunk = ids[base : base + args.image_batch]
            images = [dataset.get_by_id(i)[0] for i in chunk]
            blist = [boxes_by_img[i].reshape(-1, 4) for i in chunk]
            for a in scorer.score_batch(images, blist, chunk):
                anns.extend(a)
        metrics = evaluate_ap(gt, anns, iou_types=("bbox", "segm"))
        report[mode] = {
            "meta": dict(run_meta),
            "bbox_AP": round(metrics["bbox"]["AP"], 4),
            "bbox_AP50": round(metrics["bbox"]["AP50"], 4),
            "segm_AP": round(metrics["segm"]["AP"], 4),
            "segm_AP50": round(metrics["segm"]["AP50"], 4),
            "boundary_crops": int(crops["boundary"]),
            "split_overflow": crops["split_overflow"],
            "active_overflow": crops["active_overflow"],
            "cc_overflow": crops["cc_overflow"],
            "discovery_wall_s": round(wall, 1),
            "n_annotations": len(anns),
        }
        print(json.dumps(report[mode], indent=2), flush=True)
        with open(out_path, "w") as f:  # persist per leg (crash-safe)
            json.dump(report, f, indent=2)

    if "sticky" in report and "reference_rounds" in report:
        s, r = report["sticky"], report["reference_rounds"]
        # a merged file can pair legs from different runs/worlds: the
        # delta is only meaningful when both legs saw the same images
        sm, rm = s.get("meta", {}), r.get("meta", {})
        same_world = all(
            sm.get(k) == rm.get(k)
            for k in ("n_images", "start_idx", "end_idx", "synth", "max_active")
        )
        report["delta_legs_comparable"] = bool(same_world and sm and rm)
        report["delta"] = {
            "bbox_AP50": round(s["bbox_AP50"] - r["bbox_AP50"], 4),
            "segm_AP50": round(s["segm_AP50"] - r["segm_AP50"], 4),
            "bbox_AP": round(s["bbox_AP"] - r["bbox_AP"], 4),
            "boundary_crop_ratio": round(r["boundary_crops"] / max(s["boundary_crops"], 1), 2),
            "speedup": round(r["discovery_wall_s"] / max(s["discovery_wall_s"], 1e-9), 2),
        }
        print(json.dumps(report["delta"], indent=2))

    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()

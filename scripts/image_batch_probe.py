"""A/B discovery throughput vs ``--image_batch`` (group size).

Discovery packs ``image_batch`` images onto one shared proposal
lattice; per-box work is independent of the grouping, so the OUTPUT is
invariant (verified here via the total final-box count) and only the
packing efficiency changes. The lever matters in the boundary phase's
convergence tail: late rounds run with tens of live boxes per image,
so a bigger group shares full ``crop_chunk`` model batches across more
images instead of paying the 32-crop tail tier per small group
(engine docstring; reference per-image loop:
``/root/reference/object_reasoning.py:615-666`` has no analog — it
processes one image at a time).

Run AFTER a scale chain, with its trained checkpoints (the chip must
be free — each new group shape compiles a fresh HLO through the relay,
minutes apiece cold):

  python scripts/image_batch_probe.py --synth /tmp/synth500 \
      --objectness <s1.ckpt> --classifier <exist.ckpt> \
      --start_idx 1 --end_idx 25 --batches 4,8

Writes scripts/image_batch_probe_results.json on TPU (…_cpu.json
elsewhere, so CPU smokes never clobber recorded chip numbers).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(engine, dataset, image_batch):
    """Per-group timings over the subset; returns (rates, stats)."""
    n = len(dataset)
    group_times = []
    n_final = 0
    boundary_crops = 0
    for base in range(0, n, image_batch):
        group = [dataset.get(i) for i in range(base, min(base + image_batch, n))]
        t0 = time.time()
        outs = engine.discover_batch([g[0] for g in group])
        group_times.append((len(group), time.time() - t0))
        n_final += sum(int(o["stats"]["n_final"]) for o in outs)
        # group-level stat: identical across a group's outputs
        boundary_crops += sum(outs[0]["stats"].get("boundary_active_trace", []))
        done = min(base + image_batch, n)
        print(f"  [{done}/{n}] {group_times[-1][1]:.1f}s", flush=True)
    total_imgs = sum(g for g, _ in group_times)
    total_s = sum(t for _, t in group_times)
    warm = group_times[1:] or group_times  # first group carries compiles
    warm_imgs = sum(g for g, _ in warm)
    warm_s = sum(t for _, t in warm)
    return {
        "images": total_imgs,
        "images_per_sec": round(total_imgs / total_s, 4),
        "images_per_sec_warm": round(warm_imgs / warm_s, 4),
        "wall_s": round(total_s, 1),
        "n_final_boxes": int(n_final),
        "boundary_crops": int(boundary_crops),
        "groups": len(group_times),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synth", required=True)
    ap.add_argument("--objectness", default=None)
    ap.add_argument("--classifier", default=None)
    ap.add_argument("--random_weights", action="store_true",
                    help="smoke without checkpoints (invariance check only "
                    "— random weights converge ~nothing, rates are noise)")
    ap.add_argument("--canvas_size", type=int, default=512)
    ap.add_argument("--batches", default="4,8",
                    help="comma list of image_batch values to time")
    ap.add_argument("--start_idx", type=int, default=-1)
    ap.add_argument("--end_idx", type=int, default=-1)
    ap.add_argument("--max_active", type=int, default=1536)
    ap.add_argument("--max_splits", type=int, default=3072)
    ap.add_argument("--boundary_segment", type=int, default=10)
    ap.add_argument("--n_round", type=int, default=50)
    ap.add_argument("--sdf_activation", default=None)
    ap.add_argument("--backbone_type", default="dpt_large")
    ap.add_argument("--use_bg_sdf", action="store_true", default=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

    from unmore_tpu.cli.common import (
        build_classifier, build_objectness, init_random_variables,
        load_classifier_variables, load_objectness_params, make_apply_fns,
    )
    from unmore_tpu.data.coco import COCOImages
    from unmore_tpu.reasoning.engine import ObjectDiscoveryEngine, ReasoningConfig

    objectness = build_objectness(args, "bfloat16")
    classifier = build_classifier("bfloat16")
    if args.random_weights:
        obj_params, cls_vars = init_random_variables(objectness, classifier)
    else:
        assert args.objectness and args.classifier, \
            "--objectness/--classifier required without --random_weights"
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

    on_tpu = jax.default_backend() == "tpu"
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "image_batch_probe_results.json" if on_tpu else "image_batch_probe_results_cpu.json",
    )
    report = {
        "meta": {
            "n_images": len(dataset),
            "start_idx": args.start_idx,
            "end_idx": args.end_idx,
            "synth": args.synth,
            "canvas_size": args.canvas_size,
            "max_active": args.max_active,
            "max_splits": args.max_splits,
            "boundary_segment": args.boundary_segment,
            "backend": jax.default_backend(),
            "recorded_utc": datetime.datetime.now(datetime.timezone.utc).strftime(
                "%Y-%m-%d %H:%M"
            ),
        },
        "legs": {},
    }
    for b in [int(x) for x in args.batches.split(",")]:
        print(f"== image_batch {b}", flush=True)
        cfg = ReasoningConfig(
            canvas_size=args.canvas_size, image_batch=b,
            max_active=args.max_active, max_splits=args.max_splits,
            boundary_segment=args.boundary_segment, n_round=args.n_round,
        )
        engine = ObjectDiscoveryEngine(
            objectness_fn, classifier_fn, cfg, variables=variables
        )
        report["legs"][str(b)] = run_leg(engine, dataset, b)

    finals = {b: leg["n_final_boxes"] for b, leg in report["legs"].items()}
    report["output_invariant"] = len(set(finals.values())) <= 1
    if len(report["legs"]) >= 2:
        bs = sorted(report["legs"], key=int)
        lo, hi = report["legs"][bs[0]], report["legs"][bs[-1]]
        report["warm_speedup_largest_vs_smallest"] = round(
            hi["images_per_sec_warm"] / max(lo["images_per_sec_warm"], 1e-9), 3
        )
    text = json.dumps(report, indent=2)
    print(text)
    with open(out_path, "w") as f:
        f.write(text)
    print("wrote", out_path)


if __name__ == "__main__":
    main()

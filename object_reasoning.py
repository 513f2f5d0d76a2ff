#!/usr/bin/env python
"""Stage-2 object discovery CLI (reference-compatible flags + JSON contract).

Runs the batched reasoning engine over a COCO split and writes
``results_reasoning/<run_name>/discovery_results.json`` mapping
image_id -> [N, 4] xyxy boxes, exactly the reference contract
(``object_reasoning.py:664-665``). Flags mirror reference :671-708 with
explicit dataset-path flags replacing hard-coded paths.
"""

import argparse
import datetime
import json
import os
import sys
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
    p.add_argument("--class_score_thres", type=float, default=0.1)
    p.add_argument("--center_score_max_thres", type=float, default=0.009)
    p.add_argument("--analyze_cc", action="store_true")
    p.add_argument("--max_sdf_thres", type=float, default=0.5)
    p.add_argument("--max_shrink_threshold", type=float, default=16)
    p.add_argument("--delta_ratio", type=float, default=0.5)
    p.add_argument("--n_round", type=int, default=50)
    p.add_argument("--proposal_area_thres", type=int, default=50)
    # TPU-build flags
    p.add_argument("--coco_image_dir", type=str, required=True)
    p.add_argument("--coco_annotations", type=str, required=True)
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--canvas_size", type=int, default=640)
    p.add_argument("--max_proposals", type=int, default=2048)
    p.add_argument("--max_active", type=int, default=1024)
    p.add_argument("--max_splits", type=int, default=2048,
                   help="per-image split/CC lattice capacity; raise when "
                        "the stats lines show split_overflow > 0 on dense "
                        "scenes (dropped split candidates can cost recall)")
    p.add_argument("--image_batch", type=int, default=1,
                   help="images discovered per shared proposal lattice")
    p.add_argument("--crop_chunk", type=int, default=256,
                   help="model microbatch while enough proposals are live")
    p.add_argument("--crop_chunk_tail", type=int, default=32,
                   help="model microbatch for the live remainder")
    p.add_argument("--exist_chunk", type=int, default=1024,
                   help="classifier microbatch (the existence model is "
                        "~100x cheaper per crop and latency-bound at crop_chunk)")
    p.add_argument("--vit_pack", type=int, default=1,
                   help="ViT sequence packing: crops per packed encoder "
                        "sequence (numerically identical; must divide "
                        "crop_chunk and crop_chunk_tail)")
    p.add_argument("--pallas_decode", choices=["auto", "on", "off"], default="auto",
                   help="fused Pallas center-decode kernel (auto = on TPU)")
    p.add_argument("--boundary_segment", type=int, default=0,
                   help="split the boundary evolution into host-driven "
                        "segments of N rounds (0 = fully fused). Use ~5-10 "
                        "when a single dense group's fused execution runs "
                        "for minutes and trips an execution watchdog "
                        "('TPU worker process crashed or restarted' through "
                        "the axon relay); results are bit-identical")
    p.add_argument("--devices", type=int, default=-1,
                   help="local devices to shard image groups over "
                        "(-1 = all local devices; each device discovers "
                        "image_batch images per call)")
    p.add_argument("--reference_rounds", action="store_true",
                   help="faithful reference boundary semantics: re-predict "
                        "converged boxes every round (object_reasoning.py:393) "
                        "instead of the sticky-convergence default")
    p.add_argument("--max_restarts", type=int, default=0,
                   help="supervise the run: relaunch up to N times on crashes "
                        "or output-silence hangs (relay wedges leave the "
                        "client blocked forever inside a device op); restarts "
                        "resume from the per-group partial results, losing at "
                        "most one image group")
    p.add_argument("--hang_timeout_min", type=float, default=30.0,
                   help="supervised runs only: kill + restart the child when "
                        "it prints nothing for this long (warm-cache groups "
                        "print every ~2 min; the longest legitimate silence "
                        "is a cold remote compile)")
    p.add_argument("--busy_hang_timeout_min", type=float, default=15.0,
                   help="supervised runs only: kill + restart sooner when the "
                        "silent child is burning CPU (a spinning relay wedge, "
                        "not a compile, which blocks at ~0%% CPU)")
    return p.parse_args(argv)


def load_partial_results(part_path, fingerprint=None):
    """Load the per-group durability file written by the main loop.

    Returns ``(done_ids, results)``: every image id already processed
    (including zero-box images — "processed" and "kept" are different
    facts) and the id -> boxes mapping for the kept ones. Torn tail
    lines from a mid-append kill are skipped; the next append rewrites
    that group in full.
    """
    from unmore_tpu.cli.common import load_partial_jsonl

    return load_partial_jsonl(part_path, "boxes", fingerprint=fingerprint)


def main(argv=None):
    args = parse_args(argv)

    if args.max_restarts > 0:
        # supervisor mode (same embedding as the trainer CLIs): pin the
        # run name so restarts share one result dir (children find the
        # partial-results file there), then re-invoke this CLI
        # single-shot under the hang/busy-wedge watchdogs
        from unmore_tpu.train.supervisor import child_argv, strip_flag, supervise

        if args.run_name is None:
            args.run_name = (
                datetime.datetime.now().strftime("%y%m%d_%H%M%S")
                + "_" + args.dataset + "_" + args.dataset_split
            )
        raw = list(argv) if argv is not None else sys.argv[1:]
        raw = strip_flag(raw, "--run_name", True) + ["--run_name", args.run_name]
        base = child_argv(os.path.abspath(__file__), raw, "--max_restarts")
        busy = args.busy_hang_timeout_min * 60 or None
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            # on a CPU backend the model compute IS host CPU: "silent
            # + busy" is the normal state between prints, not the
            # TPU-relay wedge signature the heuristic targets
            busy = None
        sys.exit(supervise(
            lambda attempt: base,
            args.max_restarts,
            hang_timeout=args.hang_timeout_min * 60 or None,
            busy_hang_timeout=busy,
        ))

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
    from unmore_tpu.parallel import distributed as dist
    from unmore_tpu.reasoning.engine import ObjectDiscoveryEngine, ReasoningConfig
    from unmore_tpu.utils.profiling import StageTimer, profiler_trace

    # multi-host: deterministic per-host image sharding + gather to
    # process 0 replaces the reference's manual --start_idx/--end_idx
    # job splitting (datasets.py:432-435); single-process runs unaffected
    dist.initialize()

    if args.run_name is None:
        args.run_name = (
            datetime.datetime.now().strftime("%y%m%d_%H%M%S") + "_" + args.dataset + "_" + args.dataset_split
        )
    if args.start_idx != -1 and args.end_idx != -1:
        args.run_name += f"_{args.start_idx}_{args.end_idx}"
    result_folder = os.path.join("results_reasoning", args.run_name)
    os.makedirs(result_folder, exist_ok=True)
    with open(os.path.join(result_folder, "configs_object_reasoning.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    print("result_folder", result_folder)

    if args.vit_pack > 1 and (args.crop_chunk % args.vit_pack or args.crop_chunk_tail % args.vit_pack):
        raise SystemExit(
            f"--vit_pack {args.vit_pack} must divide --crop_chunk {args.crop_chunk} "
            f"and --crop_chunk_tail {args.crop_chunk_tail}"
        )
    objectness = build_objectness(args, args.dtype)
    classifier = build_classifier(args.dtype)
    obj_params = load_objectness_params(args.objectness_resume)
    cls_vars = load_classifier_variables(args.binary_classifier_resume)
    objectness_fn, classifier_fn, variables = make_apply_fns(objectness, obj_params, classifier, cls_vars)

    cfg = ReasoningConfig(
        crop_size=args.image_size,
        canvas_size=args.canvas_size,
        image_batch=args.image_batch,
        max_proposals=args.max_proposals,
        max_active=args.max_active,
        max_splits=args.max_splits,
        crop_chunk=args.crop_chunk,
        crop_chunk_tail=args.crop_chunk_tail,
        exist_chunk=args.exist_chunk,
        class_score_thres=args.class_score_thres,
        center_score_max_thres=args.center_score_max_thres,
        analyze_cc=args.analyze_cc,
        max_sdf_thres=args.max_sdf_thres,
        max_shrink_threshold=args.max_shrink_threshold,
        delta_ratio=args.delta_ratio,
        n_round=args.n_round,
        proposal_area_thres=args.proposal_area_thres,
        use_pallas_decode={"auto": None, "on": True, "off": False}[args.pallas_decode],
        boundary_segment=args.boundary_segment,
        sticky_convergence=not args.reference_rounds,
    )
    # shard image groups over every local device (shard_map inside the
    # engine); the reference splits work manually across GPUs via
    # --start_idx/--end_idx jobs (datasets.py:432-435)
    local = jax.local_devices()
    devices = local if args.devices < 0 else local[: max(args.devices, 1)]
    engine = ObjectDiscoveryEngine(
        objectness_fn, classifier_fn, cfg, variables=variables,
        devices=devices if len(devices) > 1 else None,
    )
    print(f"devices_used {engine.n_devices} (images per dispatch: {engine.image_slots})")

    dataset = COCOImages(args.coco_image_dir, args.coco_annotations, args.start_idx, args.end_idx)
    my_indices = dist.host_shard_indices(len(dataset))
    # group-level durability: every processed image is appended to a
    # per-process JSONL so a relay wedge, watchdog kill, or crash loses
    # at most one in-flight group — the restarted process (supervised
    # via --max_restarts, or relaunched by a chain script) loads the
    # file and skips what's done. Zero-box images get a record too:
    # "processed" and "kept" are different facts.
    part_path = os.path.join(
        result_folder, f"partial_results_p{dist.process_index()}.jsonl"
    )
    from unmore_tpu.cli.common import partial_fingerprint

    fp = partial_fingerprint(
        args, [args.objectness_resume, args.binary_classifier_resume]
    )
    done_ids, results = load_partial_results(part_path, fingerprint=fp)
    if done_ids:
        print(
            f"resuming: {len(done_ids)} images already discovered in "
            f"{part_path}; skipping them",
            flush=True,
        )
        my_indices = np.asarray(
            [i for i in my_indices if int(dataset.image_id(int(i))) not in done_ids],
            dtype=np.int64,
        )
    timer = StageTimer()
    t0 = time.time()
    B = engine.image_slots
    # JPEG decode of the next group overlaps the device dispatch (the
    # same one-chunk-ahead scheme as the detector eval loop); matters
    # once multi-device sharding multiplies group throughput
    from concurrent.futures import ThreadPoolExecutor

    def load_group(c0):
        # uint8 wire format: 4x less canvas upload per group
        return [dataset.get(int(i), dtype=np.uint8) for i in my_indices[c0 : c0 + B]]

    pool = ThreadPoolExecutor(1)
    fut = pool.submit(load_group, 0) if len(my_indices) else None
    for base in range(0, len(my_indices), B):
        with timer.stage("load"):
            group = fut.result()
        if base + B < len(my_indices):
            fut = pool.submit(load_group, base + B)
        images = [g[0] for g in group]
        with timer.stage("discover"):
            outs = engine.discover_batch(images)
        part_lines = []
        for (image, image_id), out in zip(group, outs):
            boxes = np.asarray(out["boxes"]).tolist() if len(out["boxes"]) else []
            if boxes:
                results[int(image_id)] = boxes
            part_lines.append(
                json.dumps({"image_id": int(image_id), "boxes": boxes}, cls=NpEncoder)
            )
            print(
                f"[{base + len(group)}/{len(my_indices)}] image {image_id}: {out['stats']} "
                f"({(base + len(group)) / (time.time() - t0):.3f} img/s)",
                flush=True,
            )
        with open(part_path, "a") as f:
            f.write("".join(line + "\n" for line in part_lines))

    pool.shutdown()
    # gather per-host shards; process 0 writes the single contract JSON
    merged = {}
    for part in dist.all_gather_objects(results):
        merged.update(part)
    if dist.is_main():
        out_path = os.path.join(result_folder, "discovery_results.json")
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=2, cls=NpEncoder)
        timer.dump(os.path.join(result_folder, "stage_timings.json"))
        print("wrote", out_path)


if __name__ == "__main__":
    main()

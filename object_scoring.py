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
    p.add_argument("--vit_pack", type=int, default=1,
                   help="ViT sequence packing: crops per packed encoder "
                        "sequence (numerically identical; must divide "
                        "crop_chunk)")
    p.add_argument("--image_batch", type=int, default=4,
                   help="images scored per shared proposal lattice (per device)")
    p.add_argument("--devices", type=int, default=-1,
                   help="local devices to shard image groups over (-1 = all)")
    p.add_argument("--max_restarts", type=int, default=0,
                   help="supervise the run: relaunch up to N times on crashes "
                        "or output-silence hangs (relay wedges); restarts "
                        "resume from the per-group partial annotations, "
                        "losing at most one image group")
    p.add_argument("--hang_timeout_min", type=float, default=30.0,
                   help="supervised runs only: kill + restart the child when "
                        "it prints nothing for this long (warm groups print "
                        "every few seconds; the longest legitimate silence "
                        "is a cold remote compile)")
    p.add_argument("--busy_hang_timeout_min", type=float, default=15.0,
                   help="supervised runs only: kill + restart sooner when the "
                        "silent child is burning CPU (a spinning relay wedge, "
                        "not a compile, which blocks at ~0%% CPU)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    if args.max_restarts > 0:
        # self-supervision (same embedding as the discovery CLI): the
        # output dir derives from --raw_annotations_path, so restarts
        # find the partial-annotations file with no name pinning needed
        import sys

        from unmore_tpu.train.supervisor import child_argv, supervise

        raw = list(argv) if argv is not None else sys.argv[1:]
        base = child_argv(os.path.abspath(__file__), raw, "--max_restarts")
        busy = args.busy_hang_timeout_min * 60 or None
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            # on a CPU backend the model compute IS host CPU: "silent
            # + busy" is normal between prints, not a wedge signature
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
    from unmore_tpu.reasoning.scoring import ObjectScoringEngine, ScoringConfig

    # multi-host: deterministic per-host image sharding + gather to
    # process 0 (the discovery CLI's treatment), replacing the
    # reference's manual --start_idx/--end_idx jobs (object_scoring.py:
    # 275-311)
    dist.initialize()

    result_folder = "/".join(args.raw_annotations_path.split("/")[0:-1])
    if dist.is_main():
        with open(os.path.join(result_folder, "configs_object_scoring.json"), "w") as f:
            json.dump(vars(args), f, indent=2)
    print("result_folder", result_folder)

    if args.vit_pack > 1 and args.crop_chunk % args.vit_pack:
        raise SystemExit(
            f"--vit_pack {args.vit_pack} must divide --crop_chunk {args.crop_chunk}"
        )
    with open(args.raw_annotations_path) as f:
        raw_annotations = json.load(f)
    print("# of loaded images", len(raw_annotations))

    objectness = build_objectness(args, args.dtype)
    classifier = build_classifier(args.dtype)
    obj_params = load_objectness_params(args.objectness_resume)
    cls_vars = load_classifier_variables(args.binary_classifier_resume)
    objectness_fn, classifier_fn, variables = make_apply_fns(objectness, obj_params, classifier, cls_vars)

    local = jax.local_devices()
    devices = local if args.devices < 0 else local[: max(args.devices, 1)]
    engine = ObjectScoringEngine(
        objectness_fn,
        classifier_fn,
        ScoringConfig(
            crop_size=args.image_size, canvas_size=args.canvas_size,
            crop_chunk=args.crop_chunk, image_batch=args.image_batch,
        ),
        variables=variables,
        devices=devices if len(devices) > 1 else None,
    )
    print(f"devices_used {engine.n_devices} (images per dispatch: {engine.image_slots})")

    dataset = COCOImages(args.coco_image_dir, args.coco_annotations, args.start_idx, args.end_idx)
    # only images present in the discovery JSON are scored
    todo = [i for i in range(len(dataset)) if str(dataset.image_id(i)) in raw_annotations]
    my_indices = dist.host_shard_indices(len(todo))
    # group-level durability (same contract as the discovery CLI): a
    # relay wedge or kill loses at most one in-flight group. Filter
    # AFTER sharding so multi-process shard boundaries stay stable
    # across restarts.
    from unmore_tpu.cli.common import load_partial_jsonl, partial_fingerprint

    part_path = os.path.join(
        result_folder, f"scoring_partial_p{dist.process_index()}.jsonl"
    )
    fp = partial_fingerprint(
        args,
        [args.objectness_resume, args.binary_classifier_resume,
         args.raw_annotations_path],
    )
    done_ids, kept = load_partial_jsonl(part_path, "anns", fingerprint=fp)
    out_annotations = [a for anns in kept.values() for a in anns]
    if done_ids:
        print(
            f"resuming: {len(done_ids)} images already scored in {part_path}; "
            f"skipping them",
            flush=True,
        )
        my_indices = [
            i for i in my_indices
            if int(dataset.image_id(todo[int(i)])) not in done_ids
        ]
    t0 = time.time()
    t_device = t_host = 0.0
    B = engine.image_slots
    for base in range(0, len(my_indices), B):
        group = [dataset.get(todo[int(i)], dtype=np.uint8) for i in my_indices[base : base + B]]
        images = [g[0] for g in group]
        ids = [int(g[1]) for g in group]
        boxes_list = [
            np.asarray(raw_annotations[str(i)], np.float32).reshape(-1, 4) for i in ids
        ]
        part_lines = []
        for image_id, anns in zip(ids, engine.score_batch(images, boxes_list, ids)):
            out_annotations.extend(anns)
            part_lines.append(
                json.dumps({"image_id": image_id, "anns": anns}, cls=NpEncoder)
            )
        with open(part_path, "a") as f:
            f.write("".join(line + "\n" for line in part_lines))
        t_device += engine.last_timings.get("device_s", 0.0)
        t_host += engine.last_timings.get("host_s", 0.0)
        done = min(base + B, len(my_indices))
        print(f"[{done}/{len(my_indices)}] images {ids}: "
              f"({done / (time.time() - t0):.3f} img/s)", flush=True)
    if t_device:
        # host paste-back/NMS/RLE tail vs the device pass (VERDICT r3
        # item 5: the tail must stay within ~2x of the device time)
        print(f"timing split: device {t_device:.1f}s, host tail {t_host:.1f}s "
              f"(host/device {t_host / t_device:.3f})", flush=True)

    # gather per-host shards; process 0 writes the single contract JSON
    merged = [a for part in dist.all_gather_objects(out_annotations) for a in part]
    if dist.is_main():
        print("# of final annotations", len(merged))
        out_path = os.path.join(result_folder, "object_discovery_with_scores.json")
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=2, cls=NpEncoder)
        print("wrote", out_path)


if __name__ == "__main__":
    main()

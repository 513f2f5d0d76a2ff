#!/usr/bin/env python
"""CAD detector training/evaluation CLI (reference-compatible invocation).

Mirrors the reference ``cad/train_net.py`` contract: yacs-style YAML
configs with ``_BASE_`` inheritance, ``--eval-only``,
``--test-dataset``/``--train-dataset`` overrides, and dotted ``opts``
(e.g. ``MODEL.WEIGHTS path``). ``--num-gpus`` is accepted and ignored:
parallelism comes from the JAX device mesh (all visible chips).

TPU-build additions: dataset paths are given via ``--train-json``,
``--image-root PREFIX=DIR`` (repeatable), ``--test-json``/``--test-image-dir``
because the reference hard-codes catalog roots
(``cad/data/datasets/builtin.py:31``).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", type=str, default=None)
    p.add_argument("--num-gpus", type=int, default=1, help="ignored (TPU mesh)")
    p.add_argument("--num-machines", type=int, default=1, help="ignored")
    p.add_argument("--machine-rank", type=int, default=0, help="ignored")
    p.add_argument("--dist-url", type=str, default=None, help="ignored")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--test-dataset", type=str, default="")
    p.add_argument("--train-dataset", type=str, default="")
    p.add_argument("--no-segm", action="store_true")
    # TPU-build dataset plumbing
    p.add_argument("--train-json", type=str, default=None)
    p.add_argument("--image-root", action="append", default=[],
                   help="PREFIX=DIR (e.g. coco=/data/train2017); repeatable")
    p.add_argument("--test-json", type=str, default=None)
    p.add_argument("--test-image-dir", type=str, default=None)
    p.add_argument("--data-root", type=str, default=None,
                   help="resolve --test-dataset names via the dataset registry")
    p.add_argument("--canvas-size", type=int, default=1024)
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--eval-bs", type=int, default=0,
                   help="eval inference batch (0 = auto: 4 per local device)")
    p.add_argument("--eval-workers", type=int, default=2,
                   help="JPEG-decode threads overlapping the eval device step")
    p.add_argument("--train-workers", type=int, default=4,
                   help="training prefetch workers (decode + copy-paste); "
                        "raise on many-core hosts if data_starved grows")
    p.add_argument("--max-restarts", type=int, default=0,
                   help="supervise the run: relaunch with --resume up to N "
                        "times on corruption fail-fast (exit 3) or crashes")
    p.add_argument("--hang-timeout-min", type=float, default=40.0,
                   help="supervised runs only: kill + restart the child when "
                        "it prints nothing for this long (relay-wedge hangs "
                        "never exit on their own; must outlast a cold remote "
                        "compile, ~20 min). 0 disables")
    p.add_argument("--busy-hang-timeout-min", type=float, default=15.0,
                   help="supervised runs only: kill + restart sooner when the "
                        "silent child is also burning >25%% of a core — a "
                        "wedged relay client spins, while a remote compile "
                        "blocks at ~0%% CPU (graph tracing IS CPU-heavy, but "
                        "minutes, not this long). 0 disables")
    p.add_argument("--corrupt-loss-ceiling", type=float, default=1e3,
                   help="finite loss above this (post-warmup) counts as a "
                        "corrupt log window for the fail-fast detector")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args(argv)


def build_from_config(args):
    import jax.numpy as jnp

    from unmore_tpu.detector.cascade_rcnn import DetectorConfig
    from unmore_tpu.detector.config_yaml import apply_opts, get, load_yacs_config

    cfg_yaml = load_yacs_config(args.config_file) if args.config_file else {}
    if args.opts:
        apply_opts(cfg_yaml, [o for o in args.opts if o != "--"])

    dtypes = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}
    det_cfg = DetectorConfig(
        num_classes=get(cfg_yaml, "MODEL.ROI_HEADS.NUM_CLASSES", 1),
        image_size=args.canvas_size,
        # TPU-build sizing knobs (lattice/backbone dims; let tiny test
        # configs express themselves in yaml)
        max_gt=get(cfg_yaml, "INPUT.MAX_GT", 128),
        gt_mask_res=get(cfg_yaml, "INPUT.GT_MASK_RES", 128),
        stage_blocks=tuple(get(cfg_yaml, "MODEL.RESNETS.STAGE_BLOCKS", (3, 4, 6, 3))),
        stage_samples=get(cfg_yaml, "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", 512),
        rpn_pre_nms_topk_train=get(cfg_yaml, "MODEL.RPN.PRE_NMS_TOPK_TRAIN", 2000),
        rpn_pre_nms_topk_test=get(cfg_yaml, "MODEL.RPN.PRE_NMS_TOPK_TEST", 1000),
        rpn_post_nms_topk_test=get(cfg_yaml, "MODEL.RPN.POST_NMS_TOPK_TEST", 1000),
        rpn_post_nms_topk_train=get(cfg_yaml, "MODEL.RPN.POST_NMS_TOPK_TRAIN", 4000),
        rpn_nms_thresh=get(cfg_yaml, "MODEL.RPN.NMS_THRESH", 0.65),
        use_droploss=get(cfg_yaml, "MODEL.ROI_HEADS.USE_DROPLOSS", True),
        droploss_iou_thresh=get(cfg_yaml, "MODEL.ROI_HEADS.DROPLOSS_IOU_THRESH", 0.01),
        use_soft_targets=get(cfg_yaml, "MODEL.ROI_HEADS.USE_SOFT_TARGETS", True),
        positive_fraction=get(cfg_yaml, "MODEL.ROI_HEADS.POSITIVE_FRACTION", 0.25),
        mask_on=get(cfg_yaml, "MODEL.MASK_ON", True) and not args.no_segm,
        test_score_thresh=get(cfg_yaml, "MODEL.ROI_HEADS.SCORE_THRESH_TEST", 0.0),
        detections_per_image=get(cfg_yaml, "TEST.DETECTIONS_PER_IMAGE", 100),
        dtype=dtypes[args.dtype],
        bn_axis_name=None,
    )
    solver = {
        "base_lr": get(cfg_yaml, "SOLVER.BASE_LR", 0.01),
        "max_iter": get(cfg_yaml, "SOLVER.MAX_ITER", 30000),
        "ims_per_batch": get(cfg_yaml, "SOLVER.IMS_PER_BATCH", 16),
        "weight_decay": get(cfg_yaml, "SOLVER.WEIGHT_DECAY", 5e-5),
        "steps": tuple(get(cfg_yaml, "SOLVER.STEPS", ()) or ()),
        "gamma": get(cfg_yaml, "SOLVER.GAMMA", 0.02),
        "clip_norm": get(cfg_yaml, "SOLVER.CLIP_GRADIENTS.CLIP_VALUE", 1.0),
        "checkpoint_period": get(cfg_yaml, "SOLVER.CHECKPOINT_PERIOD", 1000),
        "min_sizes": tuple(get(cfg_yaml, "INPUT.MIN_SIZE_TRAIN", (640, 672, 704, 736, 768, 800))),
        "copy_paste": get(cfg_yaml, "DATALOADER.COPY_PASTE", True),
        "copy_paste_rate": get(cfg_yaml, "DATALOADER.COPY_PASTE_RATE", 1.0),
        "copy_paste_random_num": get(cfg_yaml, "DATALOADER.COPY_PASTE_RANDOM_NUM", True),
        "copy_paste_min_ratio": get(cfg_yaml, "DATALOADER.COPY_PASTE_MIN_RATIO", 0.3),
        "copy_paste_max_ratio": get(cfg_yaml, "DATALOADER.COPY_PASTE_MAX_RATIO", 1.0),
        "output_dir": get(cfg_yaml, "OUTPUT_DIR", "cad_results/run"),
        "weights": get(cfg_yaml, "MODEL.WEIGHTS", None),
        # in-train eval + PreciseBN (reference EvalHook defaults.py:517-523,
        # PreciseBN hook defaults.py:498-507 + yaml PRECISE_BN NUM_ITER 200)
        "eval_period": get(cfg_yaml, "TEST.EVAL_PERIOD", 0),
        "precise_bn": get(cfg_yaml, "TEST.PRECISE_BN.ENABLED", False),
        "precise_bn_iters": get(cfg_yaml, "TEST.PRECISE_BN.NUM_ITER", 200),
        "warmup_iters": get(cfg_yaml, "SOLVER.WARMUP_ITERS", 1000),
        "reference_world_size": get(cfg_yaml, "SOLVER.REFERENCE_WORLD_SIZE", 0),
    }
    return det_cfg, solver, cfg_yaml


def auto_scale_workers(solver: dict, num_workers: int) -> dict:
    """Linear-scaling-rule config rescale when the chip count differs
    from SOLVER.REFERENCE_WORLD_SIZE (reference defaults.py:697-766):
    batch/LR scale up with workers, iterations/steps/periods scale down,
    keeping per-chip batch and total epochs invariant. No-op when
    REFERENCE_WORLD_SIZE is 0 or already matches."""
    old = solver["reference_world_size"]
    if old == 0 or old == num_workers:
        return solver
    assert solver["ims_per_batch"] % old == 0, "Invalid REFERENCE_WORLD_SIZE in config!"
    scale = num_workers / old
    s = dict(solver)
    s["ims_per_batch"] = int(round(solver["ims_per_batch"] * scale))
    s["base_lr"] = solver["base_lr"] * scale
    s["max_iter"] = int(round(solver["max_iter"] / scale))
    s["warmup_iters"] = int(round(solver["warmup_iters"] / scale))
    s["steps"] = tuple(int(round(x / scale)) for x in solver["steps"])
    s["eval_period"] = int(round(solver["eval_period"] / scale))
    s["checkpoint_period"] = int(round(solver["checkpoint_period"] / scale))
    s["reference_world_size"] = num_workers
    print(
        f"auto-scaled config to batch_size={s['ims_per_batch']}, "
        f"learning_rate={s['base_lr']}, max_iter={s['max_iter']}, "
        f"warmup={s['warmup_iters']}."
    )
    return s


def verify_results(cfg_yaml: dict, metrics: dict) -> bool:
    """Check eval metrics against config-declared expectations
    (reference ``verify_results``, ``cad/train_net.py:150-151`` +
    d2 ``TEST.EXPECTED_RESULTS``, ``defaults.py:550-555``).

    TEST.EXPECTED_RESULTS entries are [task, metric, expected,
    tolerance], e.g. [["bbox", "AP50", 55.0, 2.0]]. Metrics here are in
    [0, 1]; expected values follow the reference's 0-100 convention.
    Raises on violation so CI/e2e runs gate on AP, not just completion.
    """
    from unmore_tpu.detector.config_yaml import get

    expected = get(cfg_yaml, "TEST.EXPECTED_RESULTS", []) or []
    ok = True
    for task, metric, target, tol in expected:
        actual = 100.0 * float(metrics.get(task, {}).get(metric, float("nan")))
        good = np.isfinite(actual) and abs(actual - float(target)) <= float(tol)
        print(
            f"verify_results: {task}/{metric} = {actual:.2f} "
            f"(expected {target} +/- {tol}) -> {'OK' if good else 'FAIL'}",
            flush=True,
        )
        ok = ok and good
    if not ok:
        raise AssertionError(f"eval metrics outside TEST.EXPECTED_RESULTS: {expected}")
    return ok


def find_last_checkpoint(out_dir: str) -> str | None:
    """Latest model_NNNNNNN.ckpt in out_dir (reference resume_or_load /
    the d2 last_checkpoint mechanism, defaults.py:458-481)."""
    import re

    best, best_iter = None, -1
    if not os.path.isdir(out_dir):
        return None
    for name in os.listdir(out_dir):
        m = re.fullmatch(r"model_(\d+)\.ckpt", name)
        if m and int(m.group(1)) > best_iter:
            best, best_iter = os.path.join(out_dir, name), int(m.group(1))
    return best


def main(argv=None):
    args = parse_args(argv)

    if args.max_restarts > 0:
        # supervisor mode: re-invoke this CLI single-shot; restarted
        # attempts add --resume so training continues from the newest
        # checkpoint in OUTPUT_DIR (find_last_checkpoint). Completes
        # the fail-fast contract of unmore_tpu/train/resilience.py.
        from unmore_tpu.train.supervisor import child_argv, supervise

        raw = list(argv) if argv is not None else sys.argv[1:]
        base = child_argv(os.path.abspath(__file__), raw, "--max-restarts")

        def build(attempt):
            if attempt and "--resume" not in base:
                # opts is a REMAINDER arg: flags must go before it
                i = len(base) - len(args.opts)
                return base[:i] + ["--resume"] + base[i:]
            return base

        sys.exit(supervise(
            build,
            args.max_restarts,
            hang_timeout=args.hang_timeout_min * 60 or None,
            busy_hang_timeout=args.busy_hang_timeout_min * 60 or None,
        ))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

    from unmore_tpu.data.detection import DetectionDataset, detection_batch_iterator
    from unmore_tpu.detector.cascade_rcnn import CascadeMaskRCNN, detector_forward_train
    from unmore_tpu.detector.evaluation import DetectorEvaluator
    from unmore_tpu.evaluation.coco_eval import evaluate_ap
    from unmore_tpu.parallel import distributed as dist
    from unmore_tpu.parallel.mesh import replicate
    from unmore_tpu.train.checkpoints import AsyncCheckpointer, load_checkpoint
    from unmore_tpu.train.detector import (
        init_detector_state,
        make_detector_optimizer,
        make_detector_train_step,
    )
    from unmore_tpu.train.precise_bn import precise_bn_stats
    from unmore_tpu.cli.common import NpEncoder

    # multi-host: configured via JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    # JAX_PROCESS_ID env vars; single-process runs are unaffected
    # (replaces the reference's NCCL launch(), cad/train_net.py:168-181)
    dist.initialize()

    det_cfg, solver, cfg_yaml = build_from_config(args)
    solver = auto_scale_workers(solver, jax.device_count())
    out_dir = solver["output_dir"]
    if dist.is_main():
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "config.yaml"), "w") as f:
            import yaml

            yaml.safe_dump(cfg_yaml, f)
    dist.barrier("setup")

    model = CascadeMaskRCNN(det_cfg)
    tx = make_detector_optimizer(
        base_lr=solver["base_lr"], weight_decay=solver["weight_decay"],
        warmup_iters=solver["warmup_iters"],
        steps=solver["steps"], gamma=solver["gamma"], clip_norm=solver["clip_norm"],
    )
    state = init_detector_state(model, tx, jax.random.PRNGKey(0), det_cfg)
    resumed = False
    if args.resume:
        last = find_last_checkpoint(out_dir)
        if last:
            state = load_checkpoint(last, target=state)
            resumed = True
            print(f"resumed from {last} at iter {int(state.step)}")
    if not resumed and solver["weights"] and os.path.isfile(str(solver["weights"])):
        state = load_checkpoint(solver["weights"], target=state)
        print(f"loaded weights from {solver['weights']}")

    def resolve_test_set():
        if args.test_dataset and args.data_root:
            from unmore_tpu.data.registry import resolve_dataset

            return resolve_dataset(args.test_dataset, args.data_root)
        return args.test_image_dir, args.test_json

    def run_eval(state, tag: str, verify: bool = False):
        """Evaluate the current weights on the test set; images are
        sharded across hosts, predictions gathered to process 0.

        ``verify`` gates TEST.EXPECTED_RESULTS enforcement: the
        reference only verifies on the eval-only path (its
        ``cad/train_net.py:150-151``), so mid-training periodic evals
        here just log metrics — a below-target AP early in training
        must not abort the run (and in multi-host runs a main-process
        raise would leave workers blocked on the next collective)."""
        from unmore_tpu.data.coco import COCOImages

        test_image_dir, test_json = resolve_test_set()
        assert test_json and test_image_dir, (
            "--test-json/--test-image-dir (or --test-dataset with --data-root) required"
        )
        if dist.process_count() > 1:
            # multi-host: evaluate from host-local copies (each process
            # runs inference on its own local chips over its image shard)
            variables = {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            }
        else:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
        # all local chips serve one sharded inference program (the
        # reference gives each GPU its own process + InferenceSampler
        # shard, cad/data/build.py:488-550)
        from unmore_tpu.parallel.mesh import data_parallel_mesh

        local = jax.local_devices()
        mesh = data_parallel_mesh(local) if len(local) > 1 else None
        evaluator = DetectorEvaluator(model, variables, det_cfg, mesh=mesh)
        dataset = COCOImages(test_image_dir, test_json)
        my_indices = dist.host_shard_indices(len(dataset))
        print(
            f"* eval[{tag}]: {len(my_indices)} images on this host "
            "(first batch compiles the inference graph on a cold cache)",
            flush=True,
        )
        preds = []
        t0 = time.time()
        # batched inference: pad the trailing chunk with tiny blank images
        # under a sentinel id so the jitted forward compiles for exactly
        # one batch size, then drop the sentinel's predictions. JPEG
        # decode of the next chunk overlaps the device call on
        # --eval-workers threads.
        from concurrent.futures import ThreadPoolExecutor

        eval_bs = args.eval_bs if args.eval_bs > 0 else 4 * len(local)
        eval_bs = -(-eval_bs // len(local)) * len(local)  # mesh-divisible
        pad = (np.zeros((8, 8, 3), np.float32), -1)
        decode_pool = ThreadPoolExecutor(max(args.eval_workers, 1))

        def load_chunk(c0):
            idxs = [int(i) for i in my_indices[c0 : c0 + eval_bs]]
            # uint8 wire format (prepare_eval_image emits uint8 canvases)
            chunk = list(decode_pool.map(lambda i: dataset.get(i, dtype=np.uint8), idxs))
            chunk += [pad] * (eval_bs - len(chunk))
            return chunk

        with ThreadPoolExecutor(1) as pool:
            fut = pool.submit(load_chunk, 0) if len(my_indices) else None
            for c0 in range(0, len(my_indices), eval_bs):
                chunk = fut.result()
                if c0 + eval_bs < len(my_indices):
                    fut = pool.submit(load_chunk, c0 + eval_bs)
                anns = evaluator.predict_batch(
                    [im for im, _ in chunk], [int(i) for _, i in chunk]
                )
                preds.extend(a for a in anns if a["image_id"] != -1)
                n_done = min(c0 + eval_bs, len(my_indices))
                print(f"[{n_done}/{len(my_indices)}] ({n_done / (time.time() - t0):.2f} img/s)", flush=True)
        decode_pool.shutdown()
        all_preds = [p for chunk in dist.all_gather_objects(preds) for p in chunk]
        if not dist.is_main():
            return None
        pred_path = os.path.join(out_dir, "coco_instances_results.json")
        with open(pred_path, "w") as f:
            json.dump(all_preds, f, cls=NpEncoder)
        tasks = ("bbox",) if args.no_segm or not det_cfg.mask_on else ("bbox", "segm")
        metrics = evaluate_ap(test_json, all_preds, iou_types=tasks)
        with open(os.path.join(out_dir, f"metrics_{tag}.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(json.dumps(metrics, indent=2))
        if verify:
            verify_results(cfg_yaml, metrics)
        return metrics

    if args.eval_only:
        run_eval(state, "eval_only", verify=True)
        return

    assert args.train_json, "--train-json required for training"
    image_roots = {"": "."}
    for spec in args.image_root:
        prefix, _, root = spec.partition("=")
        image_roots[prefix] = root

    mesh = dist.global_mesh()
    state = replicate(mesh, state)
    step_fn = make_detector_train_step(model, tx, det_cfg, mesh)
    # each host draws an independent stream and feeds its slice of the
    # global batch (per-host deterministic seeding, reference
    # cad/data/build.py:560-562)
    local_bs = dist.local_batch_size(solver["ims_per_batch"])

    # threaded prefetch workers hide JPEG-decode/copy-paste latency
    # behind the device step (the reference's DataLoader worker
    # processes, cad/data/build.py:395-456); per-worker dataset + RNG
    from unmore_tpu.data.prefetch import PrefetchIterator

    def _worker_fn(worker_seed):
        ds = DetectionDataset(
            args.train_json, image_roots, canvas_size=det_cfg.image_size,
            min_sizes=solver["min_sizes"], seed=worker_seed,
        )
        w_it = detection_batch_iterator(
            ds, local_bs, det_cfg.max_gt, det_cfg.gt_mask_res,
            np.random.default_rng(worker_seed),
            copy_paste=solver["copy_paste"], rate=solver["copy_paste_rate"],
            min_ratio=solver["copy_paste_min_ratio"], max_ratio=solver["copy_paste_max_ratio"],
            random_num=solver["copy_paste_random_num"],
        )
        return lambda: next(w_it)

    it = PrefetchIterator(
        worker_fns=[
            _worker_fn(1000 + 17 * dist.process_index() + w)
            for w in range(max(args.train_workers, 1))
        ]
    )

    def next_global_batch():
        batch = next(it)
        batch.pop("n_gt_dropped", None)
        return dist.global_batch(mesh, batch)

    def maybe_precise_bn(state):
        if not solver["precise_bn"]:
            return state
        # recompute BN running stats from fresh train batches before eval
        # (reference PreciseBN hook, defaults.py:498-507; NUM_ITER batches)
        def apply_fn(variables, batch):
            _, new_stats = detector_forward_train(
                model, variables, det_cfg, batch, jax.random.PRNGKey(0)
            )
            return new_stats

        n_bn = max(1, solver["precise_bn_iters"] // max(local_bs, 1))
        # liveness: this sweep plus the eval graph's first compile can be
        # many silent minutes on a cold cache — enough for a supervisor
        # busy-wedge watchdog to mistake it for a hang (observed: the r5
        # scale chain's CAD leg was killed here twice at the 15-min
        # default). Announce the phase so the silence is attributable,
        # and size --busy-hang-timeout-min above the cold-compile cost.
        print(f"* precise_bn: {n_bn} stat batches (may compile first)", flush=True)
        batches = (next_global_batch() for _ in range(n_bn))
        stats = precise_bn_stats(apply_fn, state.params, state.batch_stats, batches)
        return state.replace(batch_stats=stats)

    ckpt_writer = AsyncCheckpointer()
    metrics_path = os.path.join(out_dir, "metrics.json")
    tb = None
    if dist.is_main():
        from unmore_tpu.utils.tensorboard import EventWriter

        tb = EventWriter(os.path.join(out_dir, "tb"))
    t0 = time.time()
    from unmore_tpu.train.resilience import (
        FATAL_EXIT_CODE,
        CorruptionDetector,
        fault_injection_active,
        mark_fault_injected,
    )

    detector = CorruptionDetector()
    for it_no in range(int(state.step), solver["max_iter"]):
        state, losses = step_fn(state, next_global_batch())
        ckpt_writer.pump()  # advance any in-flight save a few leaves/iter
        step_no = it_no + 1
        if step_no % 20 == 0:
            line = {k: round(float(v), 4) for k, v in losses.items()}
            # silent device corruption shows as persistent non-finite /
            # absurd losses (STATUS.md post-mortem); after onset neither
            # the weights nor a checkpoint pull can be trusted —
            # exit WITHOUT saving so a retry wrapper resumes from the
            # last periodic checkpoint afresh. During LR warmup a large
            # finite loss is normal — only non-finite counts then.
            total = line.get("total", 0.0)
            corrupt = detector.loss_window_corrupt(
                total, ceiling=args.corrupt_loss_ceiling,
                in_warmup=step_no <= solver["warmup_iters"],
            ) or fault_injection_active(step_no)
            if detector.update(corrupt):
                it.close()  # join prefetch workers (C++-call-at-exit abort)
                mark_fault_injected()
                print(
                    f"FATAL: {detector.consecutive} consecutive corrupt loss "
                    f"windows at iter {step_no} (total={total}); NOT saving — "
                    f"restart with --resume.",
                    flush=True,
                )
                sys.exit(FATAL_EXIT_CODE)
            line["iteration"] = step_no
            line["ips"] = round(20 * solver["ims_per_batch"] / (time.time() - t0), 2)
            line["data_starved"] = round(it.starved_fraction, 3)
            t0 = time.time()
            if dist.is_main():
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(line) + "\n")
                tb.add_scalars({k: v for k, v in line.items() if k != "iteration"}, step_no)
                tb.flush()
            print(line, flush=True)
        if step_no % solver["checkpoint_period"] == 0 or step_no == solver["max_iter"]:
            if detector.last_window_corrupt:
                # the window before this save already looked corrupt: a
                # checkpoint now would snapshot suspect state, and the
                # retry wrapper's "--resume from last checkpoint" must
                # never resume INTO the corruption it is escaping
                print(f"* skipping checkpoint at iter {step_no} (last loss window corrupt)")
            else:
                if dist.is_main():
                    ckpt_writer.save(os.path.join(out_dir, f"model_{step_no:07d}.ckpt"), state)
                    print(f"* checkpoint scheduled at iter {step_no} (async; durable after drain)")
                dist.barrier("ckpt")
        if solver["eval_period"] and (step_no % solver["eval_period"] == 0 or step_no == solver["max_iter"]):
            eval_state = maybe_precise_bn(state)
            run_eval(eval_state, f"iter_{step_no:07d}", verify=step_no == solver["max_iter"])
            t0 = time.time()
    ckpt_writer.wait()


if __name__ == "__main__":
    main()

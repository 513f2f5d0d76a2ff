#!/usr/bin/env python
"""Stage-1 training CLI (reference-compatible flags).

Re-implementation of the reference ``train_objectness_net.py`` CLI
(flags at reference :747-835) on the TPU stack: same run-directory
layout (``results_objectness/<mode>/<run>/{configs.json, train_log.json,
ckpt/iter_N_model.ckpt}``), same cadence semantics, plus explicit data
directory flags replacing the reference's hard-coded paths
(``datasets.py:85-86,265-267``) and a data-parallel device mesh.
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
    p.add_argument("--save_ckpt_every", type=int, default=5000)
    p.add_argument("--evaluate_loss_every", type=int, default=1000,
                   help="accepted for reference CLI compatibility; the "
                        "reference parses but never consumes this flag "
                        "(train_objectness_net.py:762 is its only mention), "
                        "so it is a no-op here too")
    p.add_argument("--evaluate_every", type=int, default=5000)
    p.add_argument("--visualize_every", type=int, default=5000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--N_vis", type=int, default=10)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--eval_mode", action="store_true")
    p.add_argument("--train_iter", type=int, default=500000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--test_batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=0.0001)
    p.add_argument("--lr_scheduler_type", type=str, default="multi_step_lr")
    p.add_argument("--lr_scheduler_milestones", nargs="+", type=int, default=[10000, 20000])
    p.add_argument("--lr_scheduler_gamma", type=float, default=1)
    p.add_argument("--ema_lr", type=float, default=0.001)
    p.add_argument("--optimizer", type=str, default="adam")
    p.add_argument("--dataset", type=str, default="ImageNet_votecut_top1_Dataset")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--random_crop_scale_min", type=float, default=0.08)
    p.add_argument("--random_crop_scale_max", type=float, default=1.0)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--backbone_type", type=str, default="dpt_large")
    p.add_argument("--sdf_activation", type=str, default=None)
    p.add_argument("--use_bg_sdf", action="store_true")
    p.add_argument("--sdf_loss_type", type=str, default="l1")
    p.add_argument("--center_field_loss_type", type=str, default="l2")
    p.add_argument("--use_sdf_gradient_loss", action="store_true")
    p.add_argument("--use_sdf_binary_mask_loss", action="store_true")
    p.add_argument("--train_center_and_boundary", action="store_true")
    p.add_argument("--train_existence", action="store_true")
    # TPU-build flags (the reference hard-codes these paths)
    p.add_argument("--imagenet_dir", type=str, default=None, help="ImageNet train images root")
    p.add_argument("--votecut_mask_dir", type=str, default=None, help="masks_top1_single_component root")
    p.add_argument("--votecut_full_mask_dir", type=str, default=None, help="full votecut masks (existence bg crops)")
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--max_restarts", type=int, default=0,
                   help="supervise the run: relaunch with --resume from the "
                        "newest checkpoint up to N times on corruption "
                        "fail-fast (exit 3) or crashes")
    p.add_argument("--hang_timeout_min", type=float, default=40.0,
                   help="supervised runs only: kill + restart the child when "
                        "it prints nothing for this long (relay-wedge hangs "
                        "never exit on their own; must outlast a cold remote "
                        "compile, ~20 min). 0 disables")
    p.add_argument("--busy_hang_timeout_min", type=float, default=15.0,
                   help="supervised runs only: kill + restart sooner when the "
                        "silent child is also burning >25%% of a core — a "
                        "wedged relay client spins, while a remote compile "
                        "blocks at ~0%% CPU (graph tracing IS CPU-heavy, but "
                        "minutes, not this long). 0 disables")
    p.add_argument("--remat_vit", action="store_true",
                   help="checkpoint ViT blocks (rematerialize in backward); "
                        "required for batch >= 96 on 16 GB parts — without "
                        "it saved activations exceed HBM and the compile "
                        "fails (scripts/compile_oom_results.json)")
    p.add_argument("--vit_pack", type=int, default=1,
                   help="ViT sequence packing: images per packed encoder "
                        "sequence (numerically identical; must divide the "
                        "per-device batch)")
    p.add_argument("--skip_loss_above", type=float, default=1000.0,
                   help="spike guard: skip the update when the batch loss "
                        "exceeds this (non-finite always skips; 0 disables)")
    p.add_argument("--spike_guard_warmup", type=int, default=500,
                   help="the skip_loss_above ceiling only arms after this "
                        "many steps: the Adam early-training transient can "
                        "legitimately exceed any fixed ceiling (non-finite "
                        "losses still skip during warmup)")
    return p.parse_args(argv)


def _run_dir_of_ckpt(ckpt_path: str) -> str:
    """Run directory a checkpoint belongs to (…/<run>/ckpt/iter_N_model.ckpt
    -> …/<run>). Checkpoints outside the run-dir layout fall back to
    their containing directory instead of crashing os.makedirs."""
    if "/ckpt/" in ckpt_path:
        return ckpt_path.split("/ckpt/")[0]
    return os.path.dirname(os.path.abspath(ckpt_path))


def find_last_stage1_checkpoint(run_dir: str) -> str | None:
    """Newest ckpt/iter_N_model.ckpt under a stage-1 run directory."""
    import re

    ckpt_dir = os.path.join(run_dir, "ckpt")
    best, best_iter = None, -1
    if not os.path.isdir(ckpt_dir):
        return None
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"iter_(\d+)_model\.ckpt", name)
        if m and int(m.group(1)) > best_iter:
            best, best_iter = os.path.join(ckpt_dir, name), int(m.group(1))
    return best


def _make_run_dir(args, mode: str):
    if args.run_name is None:
        args.run_name = (
            datetime.datetime.now().strftime("%y%m%d_%H%M%S") + "_" + args.dataset + "_" + args.backbone_type
        )
    result_folder = os.path.join("results_objectness", mode, args.run_name)
    os.makedirs(os.path.join(result_folder, "ckpt"), exist_ok=True)
    os.makedirs(os.path.join(result_folder, "imgs"), exist_ok=True)
    with open(os.path.join(result_folder, "configs.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    return result_folder


def _append_train_log(path, iteration, avg_loss):
    data = {}
    if os.path.isfile(path):
        with open(path) as f:
            data = json.load(f)
    data[str(iteration)] = float(avg_loss)
    with open(path, "w") as f:
        json.dump(data, f, indent=2)


def train_center_and_boundary(args):
    import jax

    from unmore_tpu.config import ModelConfig, OptimConfig, TrainObjectnessConfig
    from unmore_tpu.cli.common import DTYPES
    from unmore_tpu.data.votecut import VoteCutObjectnessDataset, batch_iterator
    from unmore_tpu.models.objectness import ObjectnessNet
    from unmore_tpu.parallel.mesh import data_parallel_mesh, replicate, shard_batch
    from unmore_tpu.train.checkpoints import AsyncCheckpointer, load_checkpoint
    from unmore_tpu.train.objectness import init_state, make_optimizer, make_train_step

    cfg = TrainObjectnessConfig(
        model=ModelConfig(
            backbone_type=args.backbone_type,
            sdf_activation=args.sdf_activation,
            use_bg_sdf=args.use_bg_sdf,
            image_size=args.image_size,
            dtype=args.dtype,
        ),
        optim=OptimConfig(
            optimizer=args.optimizer,
            learning_rate=args.learning_rate,
            lr_scheduler_type=args.lr_scheduler_type,
            lr_scheduler_milestones=tuple(args.lr_scheduler_milestones),
            lr_scheduler_gamma=args.lr_scheduler_gamma,
        ),
        seed=args.seed,
        batch_size=args.batch_size,
        train_iter=args.train_iter,
        save_ckpt_every=args.save_ckpt_every,
        log_every=args.log_every,
        sdf_loss_type=args.sdf_loss_type,
        center_field_loss_type=args.center_field_loss_type,
        use_sdf_gradient_loss=args.use_sdf_gradient_loss,
        use_sdf_binary_mask_loss=args.use_sdf_binary_mask_loss,
        random_crop_scale_min=args.random_crop_scale_min,
        random_crop_scale_max=args.random_crop_scale_max,
        skip_loss_above=args.skip_loss_above,
        spike_guard_warmup=args.spike_guard_warmup,
    )

    if args.vit_pack > 1 and args.batch_size % args.vit_pack:
        raise SystemExit(f"--vit_pack {args.vit_pack} must divide --batch_size {args.batch_size}")
    model = ObjectnessNet(
        backbone_type=args.backbone_type,
        sdf_activation=args.sdf_activation,
        use_bg_sdf=args.use_bg_sdf,
        dtype=DTYPES[args.dtype],
        remat_vit=args.remat_vit,
        vit_pack=args.vit_pack,
    )
    tx = make_optimizer(cfg.optim)
    mesh = data_parallel_mesh()
    state = init_state(model, tx, jax.random.PRNGKey(args.seed), args.image_size)
    start_iter = 0
    if args.resume:
        state = load_checkpoint(args.resume, target=state)
        start_iter = int(state.step)
        print(f"resumed from {args.resume} at iter {start_iter}")

    if args.eval_mode:
        # evaluate-and-exit: dump prediction diagnostics for N_vis fresh
        # samples into <resumed_run>/evaluation (reference
        # train_objectness_net.py:160-164 visualizes the test loader)
        assert args.resume, "--eval_mode requires --resume"
        from unmore_tpu.data.votecut import VoteCutObjectnessDataset
        from unmore_tpu.utils.vis import dump_objectness_diagnostics

        eval_folder = os.path.join(_run_dir_of_ckpt(args.resume), "evaluation")
        os.makedirs(eval_folder, exist_ok=True)
        ds = VoteCutObjectnessDataset(
            args.imagenet_dir, args.votecut_mask_dir, args.image_size, args.use_bg_sdf,
            crop_scale=(args.random_crop_scale_min, args.random_crop_scale_max),
            seed=args.seed,
        )
        samples, i = [], 0
        while len(samples) < args.N_vis and i < 10 * args.N_vis:
            s = ds.get(i % len(ds))
            i += 1
            if s is not None:
                samples.append(s)
        images = np.stack([s.image for s in samples])
        out = jax.jit(lambda p, x: model.apply({"params": p}, x))(state.params, images)
        for s_idx, s in enumerate(samples):
            dump_objectness_diagnostics(
                eval_folder, f"s{s_idx}",
                image=s.image,
                pred_center=np.asarray(out["center_fields"][s_idx]),
                pred_sdf=np.asarray(out["sdf_maps"][s_idx]),
                gt_center=s.center_field,
                gt_sdf=s.sdf,
                gt_mask=s.saliency_mask,
            )
        print(f"Finish evaluation (wrote {eval_folder})")
        return

    result_folder = _make_run_dir(args, "center_and_boundary")
    train_log_path = os.path.join(result_folder, "train_log.json")
    state = replicate(mesh, state)
    step_fn = make_train_step(model, tx, cfg, mesh)

    # threaded prefetch workers hide JPEG-decode/EDT/crop latency behind
    # the device step (reference uses DataLoader worker processes,
    # train_objectness_net.py:137-143; cv2 releases the GIL so threads
    # give the same overlap). Each worker owns a dataset+RNG.
    from unmore_tpu.data.prefetch import PrefetchIterator

    def _worker_fn(worker_seed):
        ds = VoteCutObjectnessDataset(
            args.imagenet_dir, args.votecut_mask_dir, args.image_size, args.use_bg_sdf,
            crop_scale=(args.random_crop_scale_min, args.random_crop_scale_max),
            seed=worker_seed,
        )
        it = batch_iterator(
            lambda i: ds.get(i), len(ds), args.batch_size, np.random.default_rng(worker_seed)
        )
        return lambda: next(it)

    prefetch = PrefetchIterator(
        worker_fns=[_worker_fn(args.seed + 1000 * w) for w in range(max(args.num_workers, 1))]
    )

    ckpt_writer = AsyncCheckpointer()
    from unmore_tpu.utils.tensorboard import EventWriter

    tb = EventWriter(os.path.join(result_folder, "tb"))
    from unmore_tpu.train.resilience import (
        CorruptionDetector,
        fault_injection_active,
        mark_fault_injected,
    )

    loss_acc = None  # device-side scalar; pulled to host once per log window
    skip_acc = None  # spike-guard skip counter (same device-side treatment)
    detector = CorruptionDetector()  # consecutive 100%-skipped windows -> fatal
    host_batch = None
    t0 = time.time()
    for iteration in range(start_iter, args.train_iter + 1):
        host_batch = next(prefetch)
        batch = shard_batch(mesh, host_batch)
        state, metrics = step_fn(state, batch)
        # accumulate on device: a per-step float() pull would force a
        # host sync every step (VERDICT round-2 item 7)
        loss_acc = metrics["total"] if loss_acc is None else loss_acc + metrics["total"]
        skip_acc = metrics["skipped"] + (0.0 if skip_acc is None else skip_acc) \
            if "skipped" in metrics else skip_acc
        ckpt_writer.pump()  # advance any in-flight save a few leaves/iter
        step_no = iteration + 1
        if step_no % args.save_ckpt_every == 0:
            if detector.last_window_corrupt:
                # last window was fully spike-skipped: state may already
                # be poisoned, and the supervisor's resume must never
                # land on a checkpoint written inside the incident
                print(f"* skipping checkpoint at iter {step_no} (last window corrupt)")
            else:
                path = os.path.join(result_folder, "ckpt", f"iter_{step_no}_model.ckpt")
                ckpt_writer.save(path, state)
                print(f"* checkpoint scheduled {path} (async; durable after drain)")
        if step_no % args.visualize_every == 0:
            from unmore_tpu.utils.vis import dump_objectness_diagnostics
            import jax as _jax
            import numpy as _np

            vis_imgs = host_batch["image"][: args.N_vis]
            if vis_imgs.dtype == _np.uint8:  # decode the wire format
                vis_imgs = vis_imgs.astype(_np.float32) / 255.0
            out = model.apply({"params": _jax.device_get(state.params)}, vis_imgs)
            vis_dir = os.path.join(result_folder, "imgs", f"iter_{step_no}")
            for s_idx in range(min(args.N_vis, len(host_batch["image"]))):
                dump_objectness_diagnostics(
                    vis_dir, f"s{s_idx}",
                    image=vis_imgs[s_idx],
                    pred_center=_np.asarray(out["center_fields"][s_idx]),
                    pred_sdf=_np.asarray(out["sdf_maps"][s_idx]),
                    gt_center=_np.asarray(host_batch["center_field"][s_idx], _np.float32),
                    gt_sdf=_np.asarray(host_batch["sdf"][s_idx], _np.float32),
                    gt_mask=_np.asarray(host_batch["saliency_mask"][s_idx], _np.float32),
                )
            print(f"* wrote diagnostics to {vis_dir}")
        if step_no % args.log_every == 0:
            # single device->host pull per window (forces sync through
            # the axon relay, so the measured rate is honest)
            n = step_no - start_iter if step_no - start_iter < args.log_every else args.log_every
            avg = float(loss_acc) / max(n, 1)
            loss_acc = None
            n_skipped = int(skip_acc) if skip_acc is not None else 0
            skip_acc = None
            dt = time.time() - t0
            rate = args.log_every / dt
            t0 = time.time()
            _append_train_log(train_log_path, step_no, avg)
            tb.add_scalar("total_loss", avg, step_no)
            tb.add_scalar("imgs_per_sec", rate * args.batch_size, step_no)
            tb.flush()
            skip_note = f", {n_skipped} spike-skipped" if n_skipped else ""
            print(
                f"iter {step_no} loss {avg:.4f} ({rate:.2f} it/s, "
                f"{rate * args.batch_size:.1f} imgs/s, "
                f"data-starved {prefetch.starved_fraction:.1%}{skip_note})",
                flush=True,
            )
            # persistent 100%-skip windows = silent device-side
            # corruption (observed twice: after ~35-50 min of sustained
            # relay traffic every batch computes the same huge loss —
            # weights in HBM and/or transfers are corrupt, and a
            # checkpoint written now scores 0 AP). NOTHING leaving this
            # process is trustworthy anymore: do NOT save; exit so a
            # retry wrapper resumes from the last periodic checkpoint
            # in a fresh process (unmore_tpu/train/resilience.py).
            if detector.update(n_skipped >= n or fault_injection_active(step_no)):
                prefetch.close()
                mark_fault_injected()
                print(
                    f"FATAL: {detector.consecutive} consecutive fully-"
                    f"skipped log windows at iter {step_no} — silent "
                    f"device corruption. NOT saving (state "
                    f"untrustworthy); restart with --resume from the "
                    f"last periodic checkpoint.",
                    flush=True,
                )
                from unmore_tpu.train.resilience import FATAL_EXIT_CODE

                sys.exit(FATAL_EXIT_CODE)
    ckpt_writer.wait()
    prefetch.close()


def _existence_batch_worker(args, worker_seed):
    """One prefetch worker: owns a dataset index + RNG, draws whole
    batches (the reference's DataLoader workers, num_workers=4,
    train_objectness_net.py:640-660)."""
    import os as _os

    from unmore_tpu.data.existence import classifier_sample
    from unmore_tpu.data.votecut import (
        VoteCutObjectnessDataset,
        load_image_mask_pair,
        load_mask,
    )

    index = VoteCutObjectnessDataset(
        args.imagenet_dir, args.votecut_mask_dir, args.image_size, seed=worker_seed
    )
    full_mask_dir = args.votecut_full_mask_dir or args.votecut_mask_dir
    rng = np.random.default_rng(worker_seed)

    def sample():
        while True:
            name = index.names[int(rng.integers(0, len(index.names)))]
            image, top1 = load_image_mask_pair(
                _os.path.join(args.imagenet_dir, name.replace(".png", ".JPEG")),
                _os.path.join(args.votecut_mask_dir, name.replace(".JPEG", ".png")),
            )
            if image is None:
                continue
            if full_mask_dir == args.votecut_mask_dir:
                full = top1  # same file — skip the redundant decode
            else:
                full = load_mask(
                    _os.path.join(full_mask_dir, name.replace(".JPEG", ".png")),
                    image.shape[:2],
                )
            if full is None:
                full = top1
            return classifier_sample(image, top1, full, args.image_size, rng)

    def batch():
        samples = [sample() for _ in range(args.batch_size)]
        images = np.stack([s[0] for s in samples])
        if images.dtype != np.uint8:  # uint8 wire format (see votecut.py)
            images = np.clip(images * 255.0 + 0.5, 0, 255).astype(np.uint8)
        return {
            "image": images,
            "label": np.array([s[1] for s in samples], np.float32),
        }

    return batch


def train_existence(args):
    import jax
    import optax

    from unmore_tpu.cli.common import DTYPES
    from unmore_tpu.data.prefetch import PrefetchIterator
    from unmore_tpu.models.resnet import BinaryClassifier
    from unmore_tpu.parallel.mesh import data_parallel_mesh, replicate, shard_batch
    from unmore_tpu.train.checkpoints import AsyncCheckpointer, load_checkpoint
    from unmore_tpu.train.classifier import (
        init_classifier_state,
        make_classifier_train_step,
        make_eval_step,
    )

    model = BinaryClassifier(dtype=DTYPES[args.dtype], bn_axis_name=None)
    schedule = optax.piecewise_constant_schedule(
        args.learning_rate, {int(m): args.lr_scheduler_gamma for m in args.lr_scheduler_milestones}
    )
    tx = optax.adam(schedule)
    mesh = data_parallel_mesh()
    state = init_classifier_state(model, tx, jax.random.PRNGKey(args.seed), args.image_size)
    start_iter = 0
    if args.resume:
        state = load_checkpoint(args.resume, target=state)
        start_iter = int(state.step)
    eval_step = make_eval_step(model)
    eval_draw_holder: list = []  # lazily-built, reused across evals

    def evaluate_classification(state, step_no, result_folder):
        """Accuracy at 0.5 on freshly drawn samples + eval_log.json +
        first-batch image dumps with gt/pred in the filename (reference
        evaluate_classification, train_objectness_net.py:703-743)."""
        eval_log_path = os.path.join(result_folder, "eval_log.json")
        # pull weights once per evaluation, not once per batch
        params = jax.device_get(state.params)
        batch_stats = jax.device_get(state.batch_stats)
        # build the eval sampler ONCE (its dataset index walks the whole
        # mask directory tree; rebuilding per periodic eval would redo
        # that scan every 5000 iters)
        if not eval_draw_holder:
            eval_draw_holder.append(_existence_batch_worker(args, args.seed + 99991))
        draw = eval_draw_holder[0]
        hits = total = 0.0
        for b_idx in range(max(1, args.test_batch_size // args.batch_size * 4)):
            eb = draw()
            h, t, pred = eval_step(params, batch_stats, eb)
            hits += float(h)
            total += float(t)
            if b_idx == 0:
                # sample dumps: <idx>_input_image_gt_<l>_pred_<p>.png
                from PIL import Image

                img_folder = os.path.join(result_folder, "imgs", f"iter_{step_no}")
                os.makedirs(img_folder, exist_ok=True)
                pred = np.asarray(pred)
                for i in range(min(len(eb["image"]), 64)):
                    im = eb["image"][i]
                    if im.dtype != np.uint8:
                        im = (im * 255).astype(np.uint8)
                    Image.fromarray(im).save(
                        os.path.join(
                            img_folder,
                            f"{i}_input_image_gt_{eb['label'][i]:.0f}_pred_{pred[i]:.3f}.png",
                        )
                    )
        acc = hits / max(total, 1.0)
        _append_train_log(eval_log_path, step_no, acc)
        print(f"* eval acc = {hits:.0f}/{total:.0f} = {acc:.4f}")
        return acc

    if args.eval_mode:
        # evaluate-and-exit into <resumed_run>/evaluation (reference
        # train_objectness_net.py:632-636)
        assert args.resume, "--eval_mode requires --resume"
        result_folder = os.path.join(_run_dir_of_ckpt(args.resume), "evaluation")
        os.makedirs(result_folder, exist_ok=True)
        evaluate_classification(state, start_iter, result_folder)
        print("Finish evaluation")
        return

    result_folder = _make_run_dir(args, "existence")
    train_log_path = os.path.join(result_folder, "train_log.json")
    state = replicate(mesh, state)
    step_fn = make_classifier_train_step(model, tx, mesh)

    # prefetch workers hide crop synthesis behind the device step; the
    # chip was idling on serial host sampling before (VERDICT r2 #4)
    prefetch = PrefetchIterator(
        worker_fns=[
            _existence_batch_worker(args, args.seed + 1000 * w)
            for w in range(max(args.num_workers, 1))
        ]
    )

    ckpt_writer = AsyncCheckpointer()
    from unmore_tpu.train.resilience import (
        CorruptionDetector,
        fault_injection_active,
        mark_fault_injected,
    )

    detector = CorruptionDetector()
    loss_acc = None  # device-side scalar; pulled once per log window
    t0 = time.time()
    for iteration in range(start_iter, args.train_iter + 1):
        batch = shard_batch(mesh, next(prefetch))
        state, metrics = step_fn(state, batch)
        loss_acc = metrics["loss"] if loss_acc is None else loss_acc + metrics["loss"]
        ckpt_writer.pump()  # advance any in-flight save a few leaves/iter
        step_no = iteration + 1
        if step_no % args.save_ckpt_every == 0:
            if detector.last_window_corrupt:
                print(f"* skipping checkpoint at iter {step_no} (last window corrupt)")
            else:
                path = os.path.join(result_folder, "ckpt", f"iter_{step_no}_model.ckpt")
                ckpt_writer.save(path, state)
                print(f"* checkpoint scheduled {path} (async; durable after drain)")
        if step_no % args.evaluate_every == 0:
            evaluate_classification(state, step_no, result_folder)
        if step_no % args.log_every == 0:
            n = step_no - start_iter if step_no - start_iter < args.log_every else args.log_every
            avg = float(loss_acc) / max(n, 1)
            loss_acc = None
            rate = args.log_every / (time.time() - t0)
            t0 = time.time()
            _append_train_log(train_log_path, step_no, avg)
            print(
                f"iter {step_no} loss {avg:.4f} ({rate:.2f} it/s, "
                f"{rate * args.batch_size:.1f} imgs/s, "
                f"data-starved {prefetch.starved_fraction:.1%})",
                flush=True,
            )
            # same fail-fast contract as the objectness trainer: a BCE
            # loss that is non-finite (or absurd) for consecutive
            # windows means the device channel is corrupt
            corrupt = detector.loss_window_corrupt(avg) or fault_injection_active(step_no)
            if detector.update(corrupt):
                prefetch.close()
                mark_fault_injected()
                print(
                    f"FATAL: {detector.consecutive} consecutive corrupt loss "
                    f"windows at iter {step_no} (loss={avg}); NOT saving — "
                    f"restart with --resume from the last periodic checkpoint.",
                    flush=True,
                )
                from unmore_tpu.train.resilience import FATAL_EXIT_CODE

                sys.exit(FATAL_EXIT_CODE)
    ckpt_writer.wait()
    prefetch.close()


def main(argv=None):
    args = parse_args(argv)

    if args.max_restarts > 0 and not args.eval_mode:
        # supervisor mode: pin the run name (children must share one
        # run directory so restarts find its checkpoints), then re-invoke
        # this CLI single-shot, resuming from the newest checkpoint on
        # each retryable failure (unmore_tpu/train/supervisor.py)
        from unmore_tpu.train.supervisor import child_argv, strip_flag, supervise

        if args.run_name is None:
            args.run_name = (
                datetime.datetime.now().strftime("%y%m%d_%H%M%S")
                + "_" + args.dataset + "_" + args.backbone_type
            )
        mode = "center_and_boundary" if args.train_center_and_boundary else "existence"
        run_dir = os.path.join("results_objectness", mode, args.run_name)
        raw = list(argv) if argv is not None else sys.argv[1:]
        raw = strip_flag(raw, "--run_name", True) + ["--run_name", args.run_name]
        base = child_argv(os.path.abspath(__file__), raw, "--max_restarts")

        def build(attempt):
            if attempt:
                last = find_last_stage1_checkpoint(run_dir)
                if last:
                    return (
                        base[:2]
                        + strip_flag(base[2:], "--resume", True)
                        + ["--resume", last]
                    )
            return base

        sys.exit(supervise(
            build,
            args.max_restarts,
            hang_timeout=args.hang_timeout_min * 60 or None,
            busy_hang_timeout=args.busy_hang_timeout_min * 60 or None,
        ))

    import jax

    # persistent compile cache: remote compile of the ViT-L graphs takes
    # ~20 min through the axon relay per NEW process without it
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.train_center_and_boundary:
        train_center_and_boundary(args)
    elif args.train_existence:
        train_existence(args)
    else:
        print("Please Specify Models To Be Trained.")


if __name__ == "__main__":
    main()

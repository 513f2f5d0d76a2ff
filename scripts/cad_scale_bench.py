"""CAD detector at realistic scale on the real TPU (VERDICT round-2 item 5).

Times, at the production operating point (canvas 1024, R50-FPN,
3-stage cascade, bf16):

  * one training step (batch >= 2) — fwd+bwd+SGD, RPN topk 4000
  * inference img/s (batch 1 and 2), including the 2000-long
    sequential greedy-NMS fori_loop the round-1 STATUS flagged

and per-piece timings (RPN NMS isolated) so the NMS risk is measured,
not guessed. Uses randomly initialized weights — FLOP cost is
weight-independent.

Run: python scripts/cad_scale_bench.py  (~10-30 min cold compile)
Writes scripts/cad_scale_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unmore_tpu.detector.cascade_rcnn import (
        CascadeMaskRCNN,
        DetectorConfig,
        detector_forward_inference,
    )
    from unmore_tpu.ops.nms import nms_mask
    from unmore_tpu.train.detector import (
        init_detector_state,
        make_detector_optimizer,
        make_detector_train_step,
    )

    cfg = DetectorConfig(image_size=1024, dtype=jnp.bfloat16)
    model = CascadeMaskRCNN(cfg)
    results = {"device": jax.devices()[0].device_kind, "canvas": cfg.image_size}

    from scripts.benchlib import measure as bench_measure

    def timed(label, fn, *args, iters=3):
        # one-scalar-pull timing harness (scripts/benchlib.py)
        row = bench_measure(fn, args, iters=iters)
        results[label] = {"s": row["s"], "compile_s": row["compile_s"]}
        print(f"{label}: {row['s']:.3f}s (compile/warm {row['compile_s']:.1f}s)", flush=True)

    rng = np.random.RandomState(0)

    # ---- isolated RPN-style NMS at production size ------------------
    n = cfg.rpn_post_nms_topk_train
    xy = rng.rand(n, 2).astype(np.float32) * 900
    wh = rng.rand(n, 2).astype(np.float32) * 120 + 8
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    valid = jnp.ones((n,), bool)
    nms_j = jax.jit(lambda b, s, v: nms_mask(b, s, v, iou_threshold=0.65))
    timed(f"greedy_nms_{n}", nms_j, boxes, scores, valid)

    # ---- training step (full pipeline) at batch 2 and 8 --------------
    tx = make_detector_optimizer()
    step = make_detector_train_step(model, tx, cfg)
    good_state = None
    for B in (2, 8):
        gt_boxes = np.zeros((B, cfg.max_gt, 4), np.float32)
        gt_valid = np.zeros((B, cfg.max_gt), bool)
        gt_masks = np.zeros((B, cfg.max_gt, cfg.gt_mask_res, cfg.gt_mask_res), np.float32)
        for b in range(B):
            for g in range(12):
                x1, y1 = rng.rand(2) * 700
                w, h = rng.rand(2) * 250 + 30
                gt_boxes[b, g] = [x1, y1, x1 + w, y1 + h]
                gt_valid[b, g] = True
                gt_masks[b, g, 16:-16, 16:-16] = 1.0
        batch = {
            "images": jnp.asarray(rng.rand(B, 1024, 1024, 3).astype(np.float32)),
            "image_hw": jnp.asarray(np.tile([1024.0, 1024.0], (B, 1)).astype(np.float32)),
            "gt_boxes": jnp.asarray(gt_boxes),
            "gt_scores": jnp.asarray(gt_valid.astype(np.float32) * 0.9),
            "gt_valid": jnp.asarray(gt_valid),
            "gt_masks": jnp.asarray(gt_masks),
            "is_single_object": jnp.zeros((B,)),
        }
        # fresh state per batch size: the step donates its state argument
        state = init_detector_state(model, tx, jax.random.PRNGKey(0), cfg)
        try:
            t0 = time.perf_counter()
            state, losses = step(state, batch)
            float(losses["total"])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                state, losses = step(state, batch)
            float(losses["total"])  # one end-of-window sync
            dt = (time.perf_counter() - t0) / iters
        except Exception as e:  # e.g. HBM OOM at batch 8
            results[f"train_step_b{B}_1024"] = {"error": str(e)[:200]}
            print(f"train_step_b{B}_1024 failed: {str(e)[:120]}", flush=True)
            continue
        results[f"train_step_b{B}_1024"] = {"s": round(dt, 3), "compile_s": round(compile_s, 1)}
        results[f"train_imgs_per_sec_b{B}"] = round(B / dt, 2)
        print(f"train_step_b{B}_1024: {dt:.3f}s (compile/warm {compile_s:.1f}s)", flush=True)
        print("losses:", {k: round(float(v), 3) for k, v in losses.items()})
        good_state = state

    # ---- inference ---------------------------------------------------
    if good_state is None:  # every train batch size failed: fresh weights
        good_state = init_detector_state(model, tx, jax.random.PRNGKey(0), cfg)
    variables = {"params": good_state.params, "batch_stats": good_state.batch_stats}
    for Bi in (1, 2):
        infer = jax.jit(lambda v, im, hw: detector_forward_inference(model, v, cfg, im, hw))
        timed(
            f"inference_b{Bi}_1024", infer, variables,
            batch["images"][:Bi], batch["image_hw"][:Bi],
        )
        results[f"inference_imgs_per_sec_b{Bi}"] = round(
            Bi / results[f"inference_b{Bi}_1024"]["s"], 2
        )

    # CPU smoke runs must not clobber the recorded TPU numbers
    name = "cad_scale_results.json" if jax.default_backend() == "tpu" else "cad_scale_results_cpu.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), name), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""CAD detector cost breakdown: where do the milliseconds go?

Round-2 measured the 1024^2 operating point (scripts/cad_scale_results.json:
train b2 0.964 s, infer b1 0.277 s) but those are ~2% MFU against the
compiled-HLO FLOP totals (train b2 = 4.02 TF, infer b1 = 1.35 TF). This
script decomposes the step into pieces and times each on the current
backend so the bottleneck is measured, not guessed:

  * backbone+FPN+RPN-head forward (the dense conv trunk)
  * trunk forward+backward
  * RPN proposal generation (topk + NMS fori_loop)
  * ROIAlign pooling fwd and fwd+bwd (512 boxes, out 7)
  * box/mask heads on pooled features
  * full train fwd (loss only), full train step, full inference

Run:  python -u scripts/cad_profile.py [--batch 2] [--canvas 1024]
Writes scripts/cad_profile_results.json. On CPU it reports FLOPs only
(--flops-only implied by platform) — wall times are meaningful on TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--canvas", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unmore_tpu.detector import anchors as anchor_lib
    from unmore_tpu.detector.cascade_rcnn import (
        CascadeMaskRCNN,
        DetectorConfig,
        detector_forward_inference,
        detector_forward_train,
    )
    from unmore_tpu.detector.roi_align import roi_align_fpn
    from unmore_tpu.detector.rpn import generate_proposals
    from unmore_tpu.train.detector import (
        init_detector_state,
        make_detector_optimizer,
        make_detector_train_step,
    )

    B, S = args.batch, args.canvas
    cfg = DetectorConfig(image_size=S, dtype=jnp.bfloat16)
    model = CascadeMaskRCNN(cfg)
    tx = make_detector_optimizer()
    state = init_detector_state(model, tx, jax.random.PRNGKey(0), cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    rng = np.random.RandomState(0)
    G = 20
    batch = {
        "images": jnp.asarray(rng.rand(B, S, S, 3), jnp.float32),
        "image_hw": jnp.asarray([[float(S), float(S)]] * B),
        "gt_boxes": jnp.asarray(rng.rand(B, G, 4) * S / 2, jnp.float32),
        "gt_scores": jnp.ones((B, G), jnp.float32),
        "gt_valid": jnp.asarray(rng.rand(B, G) > 0.5),
        "gt_masks": jnp.asarray(rng.rand(B, G, 16, 16) > 0.5, jnp.float32),
        "is_single_object": jnp.zeros((B,), bool),
    }
    results = {"device": jax.devices()[0].device_kind, "batch": B, "canvas": S}

    from scripts.benchlib import measure as bench_measure

    def measure(label, fn, *fargs):
        """One-scalar-pull timing + compiled-HLO FLOPs (scripts/benchlib.py)."""
        row = bench_measure(fn, fargs, iters=args.iters)
        results[label] = row
        print(f"{label}: {row['s']*1e3:.1f} ms, {row['gflops']:.0f} GF, "
              f"{row['tflops_per_s']:.1f} TF/s (compile {row['compile_s']:.0f}s)",
              flush=True)

    # ---- trunk ------------------------------------------------------
    def trunk_fwd(variables, images):
        return model.apply(variables, images, train=False)

    measure("trunk_fwd", trunk_fwd, variables, batch["images"])

    def trunk_fwd_bwd(params, batch_stats, images):
        def loss(p):
            (feats, rpn_out), _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, images, train=True,
                mutable=["batch_stats"],
            )
            s = sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in feats.values())
            s += sum(
                jnp.sum(o["objectness"].astype(jnp.float32) ** 2)
                + jnp.sum(o["deltas"].astype(jnp.float32) ** 2)
                for o in rpn_out.values()
            )
            return s
        return jax.grad(loss)(params)

    measure("trunk_fwd_bwd", trunk_fwd_bwd, state.params, state.batch_stats, batch["images"])

    # ---- RPN proposal generation (given trunk outputs) --------------
    feats, rpn_out = jax.jit(trunk_fwd)(variables, batch["images"])
    names = ["P2", "P3", "P4", "P5", "P6"]
    anchors_l = [jnp.asarray(a) for a in anchor_lib.fpn_anchors(S)]

    def proposals_only(rpn_out, hw):
        def per_image(obj_l, del_l, hw_b):
            p, s, v = generate_proposals(
                anchors_l, obj_l, del_l, hw_b,
                cfg.rpn_pre_nms_topk_train, cfg.rpn_post_nms_topk_train, cfg.rpn_nms_thresh,
            )
            return p, s, v
        obj = [rpn_out[n]["objectness"] for n in names]
        dl = [rpn_out[n]["deltas"] for n in names]
        return jax.vmap(per_image)(obj, dl, hw)

    measure("rpn_proposals", proposals_only, rpn_out, batch["image_hw"])

    # ---- ROIAlign (512 boxes, out 7) fwd and fwd+bwd ------------------
    boxes512 = jnp.asarray(rng.rand(B, 512, 4) * S / 2, jnp.float32)
    boxes512 = boxes512.at[..., 2:].add(boxes512[..., :2])
    feats_roi = {n: feats[n] for n in ("P2", "P3", "P4", "P5")}

    def roi_fwd(feats_roi, boxes):
        return jax.vmap(lambda f, b: roi_align_fpn(f, b, out_size=7, sampling=2))(
            feats_roi, boxes
        )

    measure("roi_align_512_fwd", roi_fwd, feats_roi, boxes512)

    def roi_fwd_bwd(feats_roi, boxes):
        def loss(f):
            return jnp.sum(roi_fwd(f, boxes).astype(jnp.float32) ** 2)
        return jax.grad(loss)(feats_roi)

    measure("roi_align_512_fwd_bwd", roi_fwd_bwd, feats_roi, boxes512)

    # ---- heads on pooled features ------------------------------------
    pooled7 = jnp.zeros((B * 512, 7, 7, 256), cfg.dtype)
    pooled14 = jnp.zeros((B * 128, 14, 14, 256), cfg.dtype)

    def box_heads_fwd(variables, pooled):
        outs = []
        for k in range(3):
            outs.append(model.apply(variables, pooled, k, method=CascadeMaskRCNN.run_box_head))
        return outs

    measure("box_heads_3x_fwd", box_heads_fwd, variables, pooled7)

    def mask_head_fwd(variables, pooled):
        return model.apply(variables, pooled, method=CascadeMaskRCNN.run_mask_head)

    measure("mask_head_fwd", mask_head_fwd, variables, pooled14)

    # ---- full paths ---------------------------------------------------
    def train_fwd(params, batch_stats, batch):
        losses, _ = detector_forward_train(
            model, {"params": params, "batch_stats": batch_stats}, cfg, batch,
            jax.random.PRNGKey(1),
        )
        return losses

    measure("train_fwd_loss", train_fwd, state.params, state.batch_stats, batch)

    step = make_detector_train_step(model, tx, cfg)
    # return the FULL new state: returning only the losses lets XLA DCE
    # the entire backward+update inside the scalarizing wrapper (inner
    # donation is a no-op under the outer jit, so reusing state is safe)
    measure("train_step", step, state, batch)

    def infer(variables, images, hw):
        return detector_forward_inference(model, variables, cfg, images, hw)

    measure("inference", infer, variables, batch["images"], batch["image_hw"])

    # CPU smoke runs must not clobber the recorded TPU numbers
    name = "cad_profile_results.json" if jax.default_backend() == "tpu" else "cad_profile_results_cpu.json"
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()

"""Stage-1 ObjectnessNet training-step throughput sweep (real TPU).

Round-2 measured 71 imgs/s end-to-end at the reference batch size (20,
``train_objectness_net.py:783``) — that's ~0.27 MFU against the 3x-forward
rule of thumb, because batch 20 under-fills the chip. This sweep times
the jitted 4-loss train step alone at several batch sizes with
compiled-HLO FLOP counts, so the framework's recommended TPU operating
point is a measured number rather than the reference GPU default.

Run: python -u scripts/stage1_train_bench.py [--batches 20 64 128]
Writes scripts/stage1_train_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = {"v5 lite": 197.0, "v5e": 197.0, "v4": 275.0, "v5p": 459.0, "v6 lite": 918.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[20, 64, 128])
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--remat", action="store_true",
                    help="checkpoint ViT blocks (--remat_vit CLI flag): "
                         "required for batch >= 96, see "
                         "scripts/compile_oom_tpu_results.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unmore_tpu.config import OptimConfig, TrainObjectnessConfig
    from unmore_tpu.models.objectness import ObjectnessNet
    from unmore_tpu.train.objectness import init_state, make_optimizer, make_train_step

    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in PEAK_TFLOPS.items() if k in kind), None)

    cfg = TrainObjectnessConfig()
    model = ObjectnessNet(
        backbone_type="dpt_large", sdf_activation="tanh", use_bg_sdf=True,
        dtype=jnp.bfloat16, remat_vit=args.remat,
    )
    tx = make_optimizer(OptimConfig())
    S = args.image_size
    results = {"device": jax.devices()[0].device_kind, "peak_bf16_tflops": peak, "sweep": []}

    for B in args.batches:
        state = init_state(model, tx, jax.random.PRNGKey(0), S, batch_size=1)
        rng = np.random.RandomState(0)
        batch = {
            "image": jnp.asarray(rng.rand(B, S, S, 3), jnp.float32),
            "center_field": jnp.asarray(rng.rand(B, S, S, 2), jnp.float32),
            "sdf": jnp.asarray(rng.rand(B, S, S), jnp.float32),
            "saliency_mask": jnp.asarray(rng.rand(B, S, S) > 0.5, jnp.float32),
        }
        step = make_train_step(model, tx, cfg)
        t0 = time.perf_counter()
        try:
            compiled = step.lower(state, batch).compile()
        except Exception as e:  # e.g. HBM OOM at compile time
            results["sweep"].append({"batch": B, "error": str(e)[:200]})
            print(f"batch {B}: compile failed ({str(e)[:120]})", flush=True)
            continue
        compile_s = time.perf_counter() - t0
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) if ca else 0.0

        # run the AOT-compiled object: the dispatch cache is not populated
        # by .lower().compile(), so calling `step` would compile again
        state, metrics = compiled(state, batch)
        _ = float(metrics["total"])  # sync warmup
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = compiled(state, batch)
        _ = float(metrics["total"])  # single end-of-window sync, like the CLI
        dt = (time.perf_counter() - t0) / args.steps
        row = {
            "batch": B,
            "ms_per_step": round(dt * 1e3, 1),
            "imgs_per_s": round(B / dt, 1),
            "gflops_per_step": round(flops / 1e9, 1),
            "achieved_tflops": round(flops / dt / 1e12, 2),
            "compile_s": round(compile_s, 1),
        }
        if peak:
            row["mfu"] = round(flops / dt / 1e12 / peak, 4)
        results["sweep"].append(row)
        print(row, flush=True)
        del state

    # CPU smoke runs must not clobber the recorded TPU numbers; remat
    # sweeps get their own file next to the no-remat baseline
    stem = "stage1_train_remat_results" if args.remat else "stage1_train_results"
    name = f"{stem}.json" if jax.default_backend() == "tpu" else f"{stem}_cpu.json"
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

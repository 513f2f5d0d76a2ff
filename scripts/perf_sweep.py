"""Stage-2 kernel perf sweep on the real TPU (VERDICT round-2 item 1).

Measures, per crop_chunk in {32, 64, 128, 256}:
  * ObjectnessNet forward, both heads consumed (center phase profile)
  * ObjectnessNet forward, only sdf_maps consumed (boundary phase
    profile — checks XLA DCEs the ~100 GFLOP/crop center head)
  * BinaryClassifier forward (existence phase profile)

and reports crops/s, model GFLOPs/crop (from compiled HLO cost
analysis when available, else analytic), achieved TFLOP/s, and MFU
against the chip's bf16 peak.

Timing uses a device->host scalar pull per iteration: on the axon
relay ``block_until_ready`` returns before remote execution completes
(see STATUS.md round-1 environment facts).

Usage: python scripts/perf_sweep.py [--chunks 32,64,128,256] [--iters 5]
Writes JSON to stdout and scripts/perf_sweep_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# bf16 peak TFLOP/s by device_kind substring
PEAK_TFLOPS = {
    "v5 lite": 197.0,  # TPU v5e
    "v5e": 197.0,
    "v4": 275.0,
    "v5p": 459.0,
    "v6 lite": 918.0,  # trillium
    "cpu": 1.0,
}


def flops_of(jitted, *args) -> float | None:
    """Post-optimization (DCE'd) HLO FLOPs, or None if unavailable."""
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception as e:  # noqa: BLE001 - AOT may be blocked on this relay
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}")
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="32,64,128,256")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    chunks = [int(c) for c in args.chunks.split(",")]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from unmore_tpu.models.objectness import ObjectnessNet
    from unmore_tpu.models.resnet import BinaryClassifier

    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in PEAK_TFLOPS.items() if k in kind), None)
    print(f"# device: {jax.devices()[0].device_kind}, bf16 peak {peak} TFLOP/s")

    objectness = ObjectnessNet(
        backbone_type="dpt_large", sdf_activation="tanh", use_bg_sdf=True, dtype=jnp.bfloat16
    )
    classifier = BinaryClassifier(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 128, 128, 3), jnp.float32)
    obj_params = jax.jit(lambda k: objectness.init(k, dummy)["params"])(rng)
    cls_vars = jax.jit(lambda k: classifier.init(k, dummy, train=False))(rng)

    @jax.jit
    def fwd_both(params, crops):
        out = objectness.apply({"params": params}, crops)
        # consume both heads -> nothing DCEs
        return jnp.sum(out["sdf_maps"]) + jnp.sum(out["center_fields"])

    @jax.jit
    def fwd_sdf_only(params, crops):
        out = objectness.apply({"params": params}, crops)
        # boundary-phase consumption: center head should DCE
        return jnp.sum(out["sdf_maps"])

    @jax.jit
    def fwd_cls(variables, crops):
        return jnp.sum(classifier.apply(variables, crops)[:, 0])

    results = {"device": jax.devices()[0].device_kind, "peak_bf16_tflops": peak, "sweep": []}

    cases = [
        ("objectness_both_heads", fwd_both, obj_params),
        ("objectness_sdf_only", fwd_sdf_only, obj_params),
        ("classifier", fwd_cls, cls_vars),
    ]

    rs = np.random.RandomState(0)
    for chunk in chunks:
        crops = jnp.asarray(rs.rand(chunk, 128, 128, 3).astype(np.float32))
        for name, fn, params in cases:
            gflops = None
            f = flops_of(fn, params, crops)
            if f is not None:
                gflops = f / chunk / 1e9
            t_compile0 = time.perf_counter()
            float(fn(params, crops))  # warmup + compile
            compile_s = time.perf_counter() - t_compile0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                float(fn(params, crops))
            dt = (time.perf_counter() - t0) / args.iters
            crops_per_s = chunk / dt
            row = {
                "case": name,
                "chunk": chunk,
                "ms_per_call": round(dt * 1e3, 2),
                "crops_per_s": round(crops_per_s, 1),
                "gflops_per_crop": round(gflops, 2) if gflops else None,
                "achieved_tflops": round(crops_per_s * gflops / 1e3, 2) if gflops else None,
                "mfu": round(crops_per_s * gflops / 1e3 / peak, 4) if gflops and peak else None,
                "compile_or_warmup_s": round(compile_s, 1),
            }
            results["sweep"].append(row)
            print(json.dumps(row))

    with open("scripts/perf_sweep_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("# wrote scripts/perf_sweep_results.json")


if __name__ == "__main__":
    main()

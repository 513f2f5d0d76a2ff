"""Extractor MFU attribution + sequence-packing A/B on the real TPU.

BASELINE.md (round 2) attributes the stage-2 both-heads MFU 0.685 gap
to the ViT-L+DPT extractor running at MFU 0.47 while the conv heads run
at 0.88, and conjectures the drag is the 65-token attention shapes
(64 patches + cls padded to the 128-lane tile). VERDICT round-3 item 3
asks for the packing experiment: two 65-token crops per 130-token
sequence under a block-diagonal mask (``ViTBackbone.__call__(pack=2)``
— numerically identical, parity-tested in tests/test_vit_packing.py).

This sweep measures, at the production chunk sizes:
  * ``extractor``            DPT feature extractor alone (the 0.47 case)
  * ``vit_trunk``            ViT-L encoder alone (is the drag the trunk
                             or the DPT decode convs?)
  * ``vit_trunk_pack2/4``    packed encoder variants
  * ``objectness_pack2``     full both-heads model with a packed encoder
                             (the end-to-end adoption metric)
  * ``objectness_both``      unpacked full model (cross-check vs
                             scripts/perf_sweep_results.json)

Writes scripts/extractor_probe_results.json (TPU) or *_cpu.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.perf_sweep import PEAK_TFLOPS, flops_of  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="128,256")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--compile-only", action="store_true",
                    help="lower+compile every case into the persistent "
                         "cache without touching the chip (safe while "
                         "another job owns it); a later run is then warm")
    args = ap.parse_args()
    chunks = [int(c) for c in args.chunks.split(",")]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from unmore_tpu.models.dpt import DPTFeatureExtractor
    from unmore_tpu.models.objectness import ObjectnessNet
    from unmore_tpu.models.vit import VIT_CONFIGS, ViTBackbone

    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in PEAK_TFLOPS.items() if k in kind), None)
    on_tpu = "cpu" not in kind
    print(f"# device: {jax.devices()[0].device_kind}, bf16 peak {peak} TFLOP/s")

    extractor = DPTFeatureExtractor(backbone="vitl16_384", dtype=jnp.bfloat16)
    vit = ViTBackbone(VIT_CONFIGS["vitl16_384"], hooks=(5, 11, 17, 23), dtype=jnp.bfloat16)
    obj = lambda pack: ObjectnessNet(  # noqa: E731
        backbone_type="dpt_large", sdf_activation="tanh", use_bg_sdf=True,
        dtype=jnp.bfloat16, vit_pack=pack,
    )

    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, 128, 128, 3), jnp.float32)
    ext_params = jax.jit(lambda k: extractor.init(k, dummy))(rng)
    vit_params = jax.jit(lambda k: vit.init(k, dummy))(rng)
    obj_params = jax.jit(lambda k: obj(1).init(k, dummy)["params"])(rng)

    def ext_fwd(params, crops):
        return jnp.sum(extractor.apply(params, crops))

    def vit_fwd_at(pack):
        def f(params, crops):
            return sum(jnp.sum(t) for t in vit.apply(params, crops, pack=pack))
        return f

    def obj_fwd_at(pack):
        model = obj(pack)
        def f(params, crops):
            out = model.apply({"params": params}, crops)
            return jnp.sum(out["sdf_maps"]) + jnp.sum(out["center_fields"])
        return f

    cases = [
        ("extractor", jax.jit(ext_fwd), ext_params),
        ("vit_trunk", jax.jit(vit_fwd_at(1)), vit_params),
        ("vit_trunk_pack2", jax.jit(vit_fwd_at(2)), vit_params),
        ("vit_trunk_pack4", jax.jit(vit_fwd_at(4)), vit_params),
        ("objectness_both", jax.jit(obj_fwd_at(1)), obj_params),
        ("objectness_pack2", jax.jit(obj_fwd_at(2)), obj_params),
    ]

    results = {"device": jax.devices()[0].device_kind, "peak_bf16_tflops": peak, "sweep": []}
    rs = np.random.RandomState(0)
    if args.compile_only:
        for chunk in chunks:
            crops = jnp.zeros((chunk, 128, 128, 3), jnp.float32)
            for name, fn, params in cases:
                t0 = time.perf_counter()
                fn.lower(params, crops).compile()
                print(f"# compiled {name}@{chunk} in {time.perf_counter() - t0:.1f}s", flush=True)
        return
    for chunk in chunks:
        crops = jnp.asarray(rs.rand(chunk, 128, 128, 3).astype(np.float32))
        for name, fn, params in cases:
            gflops = None
            f = flops_of(fn, params, crops)
            if f is not None:
                gflops = f / chunk / 1e9
            t0c = time.perf_counter()
            float(fn(params, crops))  # compile + warmup
            compile_s = time.perf_counter() - t0c
            t0 = time.perf_counter()
            for _ in range(args.iters):
                float(fn(params, crops))
            dt = (time.perf_counter() - t0) / args.iters
            cps = chunk / dt
            row = {
                "case": name,
                "chunk": chunk,
                "ms_per_call": round(dt * 1e3, 2),
                "crops_per_s": round(cps, 1),
                "gflops_per_crop": round(gflops, 2) if gflops else None,
                "achieved_tflops": round(cps * gflops / 1e3, 2) if gflops else None,
                "mfu": round(cps * gflops / 1e3 / peak, 4) if gflops and peak else None,
                "compile_or_warmup_s": round(compile_s, 1),
            }
            results["sweep"].append(row)
            print(json.dumps(row), flush=True)

    out = "scripts/extractor_probe_results.json" if on_tpu else "scripts/extractor_probe_cpu.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()

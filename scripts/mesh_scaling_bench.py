"""Multi-device scaling honesty check on the virtual CPU mesh (VERDICT r4 #6).

The framework's 8x multi-chip claims rest on CPU-mesh result-invariance
tests plus the dryrun compile — neither measures whether anything
*serializes* at 8 devices. This benchmark times the actual production
shard_map programs — ``ObjectDiscoveryEngine.discover_batch`` and
``ObjectScoringEngine.score_batch`` — over the same 8-image workload at
``devices=1`` vs ``devices=8`` on the virtual CPU mesh, and reports the
speedup plus the scoring host tail's share (the paste-back/NMS/RLE host
work is the serialization suspect: it scales with total images no
matter how many devices carry the model).

Models are the analytic fakes from tests/test_reasoning_engine.py
(busy, deterministic workloads with known convergence), so per-crop
device compute is small: fixed host overheads weigh MORE here than on
real chips with DPT-Large — the measured efficiency is a conservative
lower bound for device-bound production loads, and the host-tail share
is an upper bound.

Run (no TPU needed):  python scripts/mesh_scaling_bench.py
Writes scripts/mesh_scaling_results.json (bench.py reports it with its
recorded_on date).
"""

from __future__ import annotations

import datetime
import importlib.util
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _load_world_helpers():
    path = os.path.join(ROOT, "tests", "test_reasoning_engine.py")
    spec = importlib.util.spec_from_file_location("reasoning_world", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import jax

    # virtual 8-device CPU mesh inside this process (env vars alone
    # don't work once the axon plugin is registered)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")

    # N virtual devices share the host's real cores, so the compute-bound
    # ideal speedup is min(N, cores), NOT N — on a 1-core container the
    # ideal is 1.0x and the measurement reduces to pure serialization
    # overhead (t_8dev/t_1dev > 1 means the shard_map program serializes
    # beyond the shared-core limit).
    cores = os.cpu_count() or 1
    ideal = float(min(8, cores))

    from unmore_tpu.reasoning.engine import ObjectDiscoveryEngine, ReasoningConfig
    from unmore_tpu.reasoning.scoring import ObjectScoringEngine, ScoringConfig

    w = _load_world_helpers()
    rng = np.random.RandomState(0)
    worlds = []
    for i in range(8):
        objs = [(30, 60, 100, 140), (110 + (i % 3) * 5, 60, 180, 140)]
        worlds.append(w.make_world(200, objs).astype(np.float32))

    kwargs = dict(
        canvas_size=200, max_proposals=256, max_splits=256, max_active=256,
        crop_chunk=16, n_round=30, analyze_cc=False, image_batch=1,
    )
    report = {
        "meta": {
            "backend": jax.default_backend(),
            "devices": jax.device_count(),
            "host_cores": cores,
            "ideal_speedup": ideal,
            "recorded_utc": datetime.datetime.now(datetime.timezone.utc).strftime(
                "%Y-%m-%d %H:%M"
            ),
            "note": "analytic fake models on a shared-core virtual mesh — "
                    f"ideal speedup is min(8, cores)={ideal:g}; efficiency "
                    "is measured against that ideal and is a lower bound "
                    "for device-bound production loads; see module docstring",
        }
    }

    # ---- discovery ---------------------------------------------------
    disc = {}
    for ndev in (1, 8):
        eng = ObjectDiscoveryEngine(
            w.fake_objectness, w.fake_classifier, ReasoningConfig(**kwargs),
            devices=jax.devices()[:ndev],
        )
        group = eng.image_slots  # images per discover_batch call

        def run():
            outs = []
            for base in range(0, 8, group):
                outs.extend(eng.discover_batch(worlds[base: base + group]))
            return outs

        outs = run()  # warmup/compile
        t0 = time.perf_counter()
        n_iters = 3
        for _ in range(n_iters):
            run()
        disc[f"t_{ndev}dev_s"] = round((time.perf_counter() - t0) / n_iters, 3)
        if ndev == 1:
            boxes_ref = [o["boxes"] for o in outs]
        else:
            for a, b in zip([o["boxes"] for o in outs], boxes_ref):
                np.testing.assert_array_equal(a, b)  # invariance re-check
    disc["speedup_8dev"] = round(disc["t_1dev_s"] / disc["t_8dev_s"], 2)
    disc["efficiency_8dev"] = round(disc["speedup_8dev"] / ideal, 3)
    report["discovery"] = disc
    print("discovery:", json.dumps(disc), flush=True)

    # ---- scoring ------------------------------------------------------
    # ~24 surviving boxes/image (the discovery-output scale), real
    # paste-back + RLE on the host
    sc_boxes = []
    for _ in range(8):
        xy = rng.rand(24, 2) * 120
        wh = rng.rand(24, 2) * 60 + 20
        sc_boxes.append(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    sc = {}
    for ndev in (1, 8):
        eng = ObjectScoringEngine(
            w.fake_objectness, w.fake_classifier,
            ScoringConfig(canvas_size=200, image_batch=1, crop_chunk=16),
            devices=jax.devices()[:ndev],
        )
        group = eng.image_slots
        host_s = device_s = 0.0

        def run():
            nonlocal host_s, device_s
            host_s = device_s = 0.0
            anns = []
            for base in range(0, 8, group):
                anns.extend(eng.score_batch(
                    worlds[base: base + group],
                    sc_boxes[base: base + group],
                    list(range(base, min(base + group, 8))),
                ))
                host_s += eng.last_timings.get("host_s", 0.0)
                device_s += eng.last_timings.get("device_s", 0.0)
            return anns

        run()  # warmup/compile
        t0 = time.perf_counter()
        n_iters = 3
        for _ in range(n_iters):
            run()
        sc[f"t_{ndev}dev_s"] = round((time.perf_counter() - t0) / n_iters, 3)
        sc[f"host_s_{ndev}dev"] = round(host_s, 3)
        sc[f"device_s_{ndev}dev"] = round(device_s, 3)
    sc["speedup_8dev"] = round(sc["t_1dev_s"] / sc["t_8dev_s"], 2)
    sc["efficiency_8dev"] = round(sc["speedup_8dev"] / ideal, 3)
    sc["host_share_8dev"] = round(
        sc["host_s_8dev"] / max(sc["t_8dev_s"], 1e-9), 3
    )
    report["scoring"] = sc
    print("scoring:", json.dumps(sc), flush=True)

    out = os.path.join(ROOT, "scripts", "mesh_scaling_results.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()

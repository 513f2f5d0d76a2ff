"""Root-cause probe for the stage-1 batch>=96 remote-compile OOM.

Round-2/3 observation (``scripts/stage1_train_results.json``): the
stage-1 DPT-Large train step compiles and runs at batch 64 on the v5e
chip but batch 96 kills the remote compile helper (HTTP 500, subprocess
exit 1). Hypothesis: the trunk has **no rematerialization**, so saved
forward activations scale linearly with batch and cross the 16 GB HBM
at batch ~80-96; TPU memory assignment then fails *at compile time* —
an HLO property, not a relay artifact.

Evidence gathered here (CPU backend, so it runs without the chip and
without disturbing a concurrent TPU job): AOT-compile the EXACT train
step at several small batches and read ``memory_analysis()`` for the
temp-bytes-per-image slope, with and without ``remat_vit``.

**Measured outcome: the CPU backend is NOT representative** — its
scheduler keeps ~0.86 GB/image of temps in both modes (it even
predicts batch 64 cannot fit, contradicting the chip, and shows no
remat benefit because XLA:CPU does not apply the same fusion/offload
pipeline). The decisive evidence is the TPU-side probe
(``scripts/compile_oom_tpu_probe.py`` -> ``compile_oom_tpu_results
.json``): batch 96 without remat fails memory assignment, batch 96
WITH remat compiles at 10.6 GB temps + 3.9 GB residents < 16 GB HBM,
batch 128 with remat exceeds HBM again (~14.2 + 3.9 GB). This file is
kept as the honest record of the negative methodology result.

Writes ``scripts/compile_oom_results.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache_cpu")

import jax.numpy as jnp
import numpy as np

from unmore_tpu.config import TrainObjectnessConfig
from unmore_tpu.models.objectness import ObjectnessNet
from unmore_tpu.train.objectness import init_state, make_optimizer, make_train_step

HBM_BYTES = 16 * 1024**3  # v5e


def probe(batch: int, remat: bool) -> dict:
    cfg = TrainObjectnessConfig()  # defaults = CLI defaults (4 losses on)
    model = ObjectnessNet(
        backbone_type="dpt_large",
        sdf_activation="tanh",
        use_bg_sdf=True,
        dtype=jnp.bfloat16,
        remat_vit=remat,
    )
    tx = make_optimizer(cfg.optim)
    state = init_state(model, tx, jax.random.PRNGKey(0), 128)
    step = make_train_step(model, tx, cfg)
    wire = {
        "image": jnp.zeros((batch, 128, 128, 3), jnp.uint8),
        "center_field": jnp.zeros((batch, 128, 128, 2), jnp.float16),
        "sdf": jnp.zeros((batch, 128, 128), jnp.float16),
        "saliency_mask": jnp.zeros((batch, 128, 128), jnp.float16),
    }
    t0 = time.time()
    compiled = step.lower(state, wire).compile()
    dt = time.time() - t0
    mem = compiled.memory_analysis()
    rec = {
        "batch": batch,
        "remat_vit": remat,
        "compile_s": round(dt, 1),
        "temp_bytes": int(mem.temp_size_in_bytes),
        "argument_bytes": int(mem.argument_size_in_bytes),
        "output_bytes": int(mem.output_size_in_bytes),
        "alias_bytes": int(mem.alias_size_in_bytes),
    }
    print(rec, flush=True)
    return rec


def main():
    results = {"backend": "cpu", "hbm_bytes": HBM_BYTES, "runs": []}
    for remat in (False, True):
        for batch in (8, 16, 32):
            results["runs"].append(probe(batch, remat))

    # linear fit temp = a * batch + b per remat mode, extrapolated to the
    # chip's operating points. Arguments (params + Adam state + batch)
    # are donated/aliased; the binding constraint is temps + residents.
    for remat in (False, True):
        rows = [r for r in results["runs"] if r["remat_vit"] == remat]
        xs = np.array([r["batch"] for r in rows], np.float64)
        ys = np.array([r["temp_bytes"] for r in rows], np.float64)
        a, b = np.polyfit(xs, ys, 1)
        resident = rows[0]["argument_bytes"]  # params + opt state + batch (dominated by the former)
        pred = {}
        for target in (64, 96, 128):
            temps = a * target + b
            pred[str(target)] = {
                "pred_temp_gb": round(temps / 1024**3, 2),
                "pred_total_gb": round((temps + resident) / 1024**3, 2),
                "fits_hbm": bool(temps + resident < HBM_BYTES),
            }
        results[f"extrapolation_remat_{remat}"] = {
            "temp_bytes_per_image": int(a),
            "temp_intercept_gb": round(b / 1024**3, 2),
            "resident_gb": round(resident / 1024**3, 2),
            "predictions": pred,
        }
        print(results[f"extrapolation_remat_{remat}"], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "compile_oom_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

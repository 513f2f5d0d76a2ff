"""TPU-side half of the batch>=96 compile-OOM root cause.

Compiles (never runs) the exact stage-1 train step on the real chip's
remote compile helper at the known-good (64) and known-bad (96)
batches, with and without ViT-block remat, capturing the full error
text. Expected outcome under the activation-memory hypothesis
(``scripts/compile_oom_probe.py``): batch 96 without remat fails,
batch 96 WITH remat compiles — lifting the operating ceiling.

Usage: python scripts/compile_oom_tpu_probe.py [batch [batch ...]]
Writes scripts/compile_oom_tpu_results.json (merging across calls).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp

from unmore_tpu.config import TrainObjectnessConfig
from unmore_tpu.models.objectness import ObjectnessNet
from unmore_tpu.train.objectness import init_state, make_optimizer, make_train_step

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "compile_oom_tpu_results.json")


def probe(batch: int, remat: bool) -> dict:
    cfg = TrainObjectnessConfig()
    model = ObjectnessNet(
        backbone_type="dpt_large", sdf_activation="tanh", use_bg_sdf=True,
        dtype=jnp.bfloat16, remat_vit=remat,
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
    rec = {"batch": batch, "remat_vit": remat, "device": str(jax.devices()[0])}
    t0 = time.time()
    try:
        compiled = step.lower(state, wire).compile()
        rec["compile_s"] = round(time.time() - t0, 1)
        rec["ok"] = True
        try:
            mem = compiled.memory_analysis()
            rec["temp_gb"] = round(mem.temp_size_in_bytes / 1024**3, 2)
            rec["argument_gb"] = round(mem.argument_size_in_bytes / 1024**3, 2)
        except Exception as e:  # relay may not expose it
            rec["memory_analysis_error"] = str(e)[:200]
    except Exception as e:
        rec["compile_s"] = round(time.time() - t0, 1)
        rec["ok"] = False
        rec["error"] = str(e)[:4000]
    print(json.dumps(rec)[:600], flush=True)
    return rec


def main():
    batches = [int(a) for a in sys.argv[1:]] or [96]
    results = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for batch in batches:
        for remat in (False, True):
            results.append(probe(batch, remat))
            with open(OUT, "w") as f:
                json.dump(results, f, indent=2)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

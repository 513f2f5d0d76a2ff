"""Stage-2 discovery throughput benchmark (runs on the real TPU chip).

Measures the full discovery compute pipeline at a fixed, representative
per-image load so results are deterministic and comparable across
rounds (random-weight models would otherwise make threshold-dependent
phase sizes arbitrary):

  existence pass over 1636 seed crops   (the 640x640 COCO seed count)
  center pass (fields + decode + CC) over 512 proposals
  50 boundary rounds at 256 active proposals

with the real DPT-Large ObjectnessNet + ResNet-50 classifier in
bfloat16. Reported as images/sec against the BASELINE.json north-star
of 500 img/s (v4-8); this runs on a single chip.

Also reports the quantitative roofline (VERDICT round-2 item 1e): model
FLOPs per image from compiled-HLO cost analysis, achieved TFLOP/s, MFU
vs the chip's bf16 peak, and the speed-of-light img/s for this load on
this chip. See BASELINE.md for the full roofline argument.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import numpy as np

# bf16 peak TFLOP/s by device_kind substring
PEAK_TFLOPS = {"v5 lite": 197.0, "v5e": 197.0, "v4": 275.0, "v5p": 459.0, "v6 lite": 918.0}


def main():
    import jax

    # persistent compile cache: remote compile on this setup takes minutes
    # for the big model graphs; cache hits make re-runs fast
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unmore_tpu.models.objectness import ObjectnessNet
    from unmore_tpu.models.resnet import BinaryClassifier
    from unmore_tpu.reasoning.engine import ObjectDiscoveryEngine, ReasoningConfig

    kind = jax.devices()[0].device_kind.lower()
    peak_tflops = next((v for k, v in PEAK_TFLOPS.items() if k in kind), None)

    cfg = ReasoningConfig(crop_chunk=256, crop_chunk_tail=32)
    rng = jax.random.PRNGKey(0)

    objectness = ObjectnessNet(
        backbone_type="dpt_large", sdf_activation="tanh", use_bg_sdf=True, dtype=jnp.bfloat16
    )
    classifier = BinaryClassifier(dtype=jnp.bfloat16)

    dummy = jnp.zeros((32, 128, 128, 3), jnp.float32)
    obj_params = jax.jit(lambda k: objectness.init(k, dummy)["params"])(rng)
    cls_vars = jax.jit(lambda k: classifier.init(k, dummy, train=False))(rng)

    def objectness_fn(variables, crops, compute_center):
        return objectness.apply({"params": variables["objectness"]}, crops)

    def classifier_fn(variables, crops):
        return classifier.apply(variables["classifier"], crops)[:, 0]

    variables = {"objectness": obj_params, "classifier": cls_vars}
    engine = ObjectDiscoveryEngine(objectness_fn, classifier_fn, cfg, variables=variables)

    # ---- model FLOPs per crop from compiled (post-DCE) HLO ------------
    def flops_per_crop(fn, params, n):
        crops = jnp.zeros((n, 128, 128, 3), jnp.float32)
        try:
            ca = jax.jit(fn).lower(params, crops).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca["flops"]) / n
        except Exception:
            return None

    f_both = flops_per_crop(
        lambda p, x: objectness.apply({"params": p}, x), obj_params, 32
    )
    f_sdf = flops_per_crop(
        lambda p, x: objectness.apply({"params": p}, x)["sdf_maps"], obj_params, 32
    )
    f_cls = flops_per_crop(lambda v, x: classifier.apply(v, x), cls_vars, 32)

    # representative fixed load (identical to round 1 for comparability)
    N_SEED, N_CENTER, N_ACTIVE, N_ROUNDS = 1636, 512, 256, 50
    canvas = np.zeros((1, cfg.canvas_size, cfg.canvas_size, 3), np.float32)
    canvas[0] = np.random.RandomState(0).rand(cfg.canvas_size, cfg.canvas_size, 3)
    canvas = jnp.asarray(canvas)
    hw = jnp.asarray([[480.0, 640.0]])

    def make_lattice(n, slots):
        r = np.random.RandomState(1)
        xy = r.rand(slots, 2) * 400
        wh = r.rand(slots, 2) * 200 + 40
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        valid = np.arange(slots) < n
        return jnp.asarray(boxes), jnp.zeros((slots,), jnp.int32), jnp.asarray(valid)

    seed_boxes, seed_idx, seed_valid = make_lattice(N_SEED, cfg.max_proposals)
    ctr_boxes, ctr_idx, ctr_valid = make_lattice(N_CENTER, cfg.max_proposals)
    act_boxes, act_idx, act_valid = make_lattice(N_ACTIVE, cfg.max_active)

    # boundary at a pinned load: run the chunked stats pass N_ROUNDS times
    # (label-driven early exit would make random-weight runs incomparable)
    import functools

    from unmore_tpu.reasoning.engine import _live_prefix_map

    @jax.jit
    def boundary_fixed(variables, canvas, boxes, idx, n_active):
        def one_round(i, acc):
            out_init = {
                k: jnp.zeros((boxes.shape[0],), jnp.float32)
                for k in ("max_sdf", "d_x1", "d_y1", "d_x2", "d_y2")
            }
            stats = _live_prefix_map(
                functools.partial(engine._boundary_chunk_stats, variables, canvas),
                boxes, idx, n_active, cfg.crop_chunk, cfg.tail, out_init,
            )
            return acc + stats["max_sdf"]
        return jax.lax.fori_loop(0, N_ROUNDS, one_round, jnp.zeros((boxes.shape[0],)))

    def run_once():
        _, _, _, scores = engine._existence_j(variables, canvas, seed_boxes, seed_idx, seed_valid)
        center = engine._center_j(variables, canvas, hw, ctr_boxes, ctr_idx, ctr_valid)
        b = boundary_fixed(variables, canvas, act_boxes, act_idx, jnp.int32(N_ACTIVE))
        # force full device->host sync: on the axon relay block_until_ready
        # returns before remote execution completes
        return (
            float(jnp.sum(scores))
            + float(jnp.sum(center["passed"]))
            + float(jnp.sum(b))
        )

    run_once()  # warmup/compile
    t0 = time.perf_counter()
    n_iters = 3
    for _ in range(n_iters):
        run_once()
    dt = (time.perf_counter() - t0) / n_iters

    value = 1.0 / dt
    extra = {}
    if all(f is not None for f in (f_both, f_sdf, f_cls)):
        tflop_per_image = (
            N_SEED * f_cls + N_CENTER * f_both + N_ROUNDS * N_ACTIVE * f_sdf
        ) / 1e12
        extra = {
            "model_tflop_per_image": round(tflop_per_image, 1),
            "achieved_tflops": round(tflop_per_image * value, 1),
            "gflops_per_crop": {
                "objectness_both_heads": round(f_both / 1e9, 1),
                "objectness_sdf_only": round(f_sdf / 1e9, 1),
                "classifier": round(f_cls / 1e9, 2),
            },
        }
        if peak_tflops:
            extra["mfu"] = round(tflop_per_image * value / peak_tflops, 4)
            extra["sol_images_per_sec_this_chip"] = round(peak_tflops / tflop_per_image, 4)
    print(
        json.dumps(
            {
                "metric": "stage2_discovery_images_per_sec",
                "value": round(value, 4),
                "unit": "images/sec",
                "vs_baseline": round(value / 500.0, 6),
                "device": jax.devices()[0].device_kind,
                "peak_bf16_tflops": peak_tflops,
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()

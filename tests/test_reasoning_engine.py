"""Behavioral tests of the batched discovery engine with analytic models.

The synthetic "world" paints perfect objectness fields into the image
channels: ch0 = object mask, ch1/ch2 = (dy, dx) center field encoded
into [0,1]. The fake ObjectnessNet decodes them from each crop, so the
engine's geometry (crops, splitting, boundary evolution, NMS) is tested
end-to-end with exactly known answers.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unmore_tpu.reasoning.engine import ObjectDiscoveryEngine, ReasoningConfig
from unmore_tpu.reasoning.proposals import max_seed_count, seed_proposals


def make_world(canvas, objects):
    """objects: list of (x1, y1, x2, y2). Returns [H, W, 3] image encoding
    per-object mask ids (ch0: 1.0 for even objects, 0.6 for odd) +
    per-object outward center fields (ch1/ch2)."""
    H = W = canvas
    img = np.zeros((H, W, 3), np.float32)
    img[..., 1:] = 0.5  # zero field
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for k, (x1, y1, x2, y2) in enumerate(objects):
        sel = (yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2)
        cy, cx = (y1 + y2) / 2, (x1 + x2) / 2
        dy = yy - cy
        dx = xx - cx
        n = np.sqrt(dy**2 + dx**2)
        n = np.maximum(n, 1e-6)
        img[..., 0][sel] = 1.0 if k % 2 == 0 else 0.6
        img[..., 1][sel] = 0.5 + 0.5 * (dy / n)[sel]
        img[..., 2][sel] = 0.5 + 0.5 * (dx / n)[sel]
    return img


def _mean_blur(x, k=9, rounds=2):
    """Separable box blur so the fake SDF has smooth, realistic gradients."""
    kern = jnp.ones((k, 1, 1, 1), jnp.float32) / k
    y = x[..., None]
    for _ in range(rounds):
        y = jax.lax.conv_general_dilated(
            y, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            y, kern.transpose(1, 0, 2, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    return y[..., 0]


def fake_objectness(variables, crops, compute_center=True):
    """Crop-conditioned like the trained net: the SDF covers only the
    crop's *dominant* object (the net is trained on single-object crops)
    and is smooth like a learned distance field; the center field keeps
    every object's painted field (on multi-object crops the trained net
    produces converging fields — what the singularity check detects)."""
    m = crops[..., 0]
    a = m > 0.8
    b = (m > 0.3) & ~a
    a_area = jnp.sum(a, axis=(1, 2), keepdims=True)
    b_area = jnp.sum(b, axis=(1, 2), keepdims=True)
    mask = jnp.where(a_area >= b_area, a, b)
    out = {"sdf_maps": _mean_blur(mask.astype(jnp.float32) * 2.0 - 1.0)}
    if compute_center:
        out["center_fields"] = crops[..., 1:3] * 2.0 - 1.0
    return out


def fake_classifier(variables, crops):
    return jnp.max(crops[..., 0], axis=(1, 2))


def iou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua


def test_seed_proposals_deterministic_and_bounded():
    seeds = seed_proposals(480, 640)
    assert seeds.shape[1] == 4
    assert (seeds[:, 0] >= 0).all() and (seeds[:, 2] <= 640).all()
    assert (seeds[:, 1] >= 0).all() and (seeds[:, 3] <= 480).all()
    assert (seeds[-1] == [0, 0, 640, 480]).all()
    assert len(seeds) <= max_seed_count(480, 640)
    assert len(seed_proposals(640, 640)) <= max_seed_count(640, 640)


def _engine(**overrides):
    kwargs = dict(
        canvas_size=200,
        max_proposals=256,
        max_splits=256,
        max_active=256,
        crop_chunk=16,
        n_round=30,
        analyze_cc=False,
    )
    kwargs.update(overrides)
    return ObjectDiscoveryEngine(fake_objectness, fake_classifier, ReasoningConfig(**kwargs))


def test_single_object_discovery():
    gt = (60, 70, 140, 150)
    world = make_world(200, [gt])
    engine = _engine()
    result = engine.discover(world)
    boxes = result["boxes"]
    assert result["stats"]["n_final"] >= 1
    best = max(iou(b, gt) for b in boxes)
    assert best > 0.6, f"best IoU {best}, boxes {boxes[:5]}"


def test_two_adjacent_objects_are_split():
    # two touching rectangles: converging center fields at the seam must
    # trigger a singularity split; final boxes should cover both objects
    a = (30, 60, 100, 140)
    b = (100, 60, 170, 140)
    world = make_world(200, [a, b])
    engine = _engine()
    result = engine.discover(world)
    boxes = result["boxes"]
    assert len(boxes) >= 1, f"stats={result['stats']}"
    assert len(result["converged_boxes"]) >= 2
    # the synthetic +/-1 SDF makes boundary dynamics bang-bang and NMS
    # ties (all scores 1.0) resolve in compaction order, so assert the
    # mechanisms on the pre-NMS converged set: the split fired and both
    # objects are localized by separate converged boxes.
    conv = result["converged_boxes"]
    best_a = max(iou(x, a) for x in conv)
    best_b = max(iou(x, b) for x in conv)
    assert best_a > 0.35, f"A IoU {best_a}"
    assert best_b > 0.35, f"B IoU {best_b}"
    box_a = conv[int(np.argmax([iou(x, a) for x in conv]))]
    box_b = conv[int(np.argmax([iou(x, b) for x in conv]))]
    assert (box_a[0] + box_a[2]) / 2 < 100 < (box_b[0] + box_b[2]) / 2
    assert result["stats"]["n_split"] > 0


def test_empty_image_yields_no_boxes():
    world = make_world(200, [])
    engine = _engine()
    result = engine.discover(world)
    assert len(result["boxes"]) == 0


def test_multi_image_batched_discovery_matches_single():
    # two different worlds in one lattice: per-image results must match
    # what single-image discovery produces for each
    gt_a = (60, 70, 140, 150)
    gt_b = (20, 30, 90, 110)
    world_a = make_world(200, [gt_a])
    world_b = make_world(200, [gt_b])

    single = _engine(image_batch=1)
    ra = single.discover(world_a)
    rb = single.discover(world_b)

    batched = _engine(image_batch=2)
    out = batched.discover_batch([world_a, world_b])
    assert len(out) == 2
    for res, ref, gt in ((out[0], ra, gt_a), (out[1], rb, gt_b)):
        assert res["stats"]["n_final"] >= 1
        best = max(iou(b, gt) for b in res["boxes"])
        best_ref = max(iou(b, gt) for b in ref["boxes"])
        assert best > 0.6, f"batched best IoU {best}"
        # batched run localizes at least as well as the single run
        assert best >= best_ref - 0.05
    # cross-image leakage check: each image's boxes stay inside it
    assert out[0]["stats"]["n_seed"] == ra["stats"]["n_seed"]
    assert out[1]["stats"]["n_exist"] == rb["stats"]["n_exist"]


def test_partial_batch_pads_missing_slots():
    gt = (60, 70, 140, 150)
    world = make_world(200, [gt])
    engine = _engine(image_batch=4)
    out = engine.discover_batch([world])  # 1 of 4 slots used
    assert len(out) == 1
    assert max(iou(b, gt) for b in out[0]["boxes"]) > 0.6


def test_cc_analysis_adds_component_proposals():
    # two small separated blobs inside one big passing proposal: CC path
    # must emit enlarged per-component proposals
    a = (20, 20, 80, 80)
    b = (120, 120, 180, 180)
    world = make_world(200, [a, b])
    engine = _engine(analyze_cc=True, cc_max_components=4)
    result = engine.discover(world)
    assert result["stats"]["n_split"] > 0
    boxes = result["boxes"]
    assert len(boxes) >= 2, f"stats={result['stats']}"
    assert max(iou(x, a) for x in boxes) > 0.4
    assert max(iou(x, b) for x in boxes) > 0.4


def test_reasoning_config_exist_chunk_validation():
    # exist_tile caps to the smallest lattice and must divide every one
    c = ReasoningConfig()
    assert c.exist_tile == 1024 and (c.max_proposals % c.exist_tile) == 0
    small = ReasoningConfig(
        max_proposals=128, max_splits=128, max_active=64,
        crop_chunk=32, crop_chunk_tail=16, exist_chunk=1024,
    )
    assert small.exist_tile == 64  # capped to max_active * image_batch
    with pytest.raises(ValueError):
        # exist_tile caps to max_active (64), which does not divide 96
        ReasoningConfig(
            max_proposals=96, max_splits=96, max_active=64,
            crop_chunk=16, crop_chunk_tail=16, exist_chunk=1024,
        )


def test_multi_device_discovery_matches_single_device():
    # VERDICT r2 #1 acceptance: the sharded production path (shard_map
    # over the local mesh, one image group per device) must produce
    # results identical to single-device discovery
    gt_a = (60, 70, 140, 150)
    gt_b = (20, 30, 90, 110)
    worlds = [
        make_world(200, [gt_a]),
        make_world(200, [gt_b]),
        make_world(200, [gt_a, gt_b]),
        make_world(200, []),
    ]

    single = _engine(image_batch=1)
    ref = [single.discover(w) for w in worlds]

    sharded = ObjectDiscoveryEngine(
        fake_objectness,
        fake_classifier,
        ReasoningConfig(
            canvas_size=200, max_proposals=256, max_splits=256, max_active=256,
            crop_chunk=16, n_round=30, analyze_cc=False, image_batch=1,
        ),
        devices=jax.devices()[:4],
    )
    assert sharded.n_devices == 4 and sharded.image_slots == 4
    out = sharded.discover_batch(worlds)
    assert len(out) == 4
    for res, r in zip(out, ref):
        np.testing.assert_array_equal(res["boxes"], r["boxes"])
        np.testing.assert_array_equal(res["converged_boxes"], r["converged_boxes"])
        assert res["stats"]["n_final"] == r["stats"]["n_final"]
        assert res["stats"]["n_exist"] == r["stats"]["n_exist"]
        assert res["stats"]["n_split"] == r["stats"]["n_split"]


def test_reference_rounds_mode_matches_sticky_fixed_point():
    # VERDICT r2 #3: the sticky-convergence deviation vs the reference's
    # re-predict-every-round semantics (labels reset each round,
    # reference object_reasoning.py:393). For a deterministic model both
    # reach the same fixed point; reference mode just spends more crops.
    gt = (60, 70, 140, 150)
    world = make_world(200, [gt, (20, 30, 50, 110)])
    sticky = _engine()
    refmode = _engine(sticky_convergence=False)
    rs = sticky.discover(world)
    rr = refmode.discover(world)
    assert rr["stats"]["n_final"] >= 1
    # reference mode runs all rounds; sticky exits when drained
    assert rr["stats"]["boundary_rounds"] == 30
    assert rs["stats"]["boundary_rounds"] <= 30
    # the fixed point is the same: identical converged-box sets (the
    # post-NMS selection may differ — scores are tied at 1.0 and the two
    # modes compact in different orders, so NMS picks different
    # representatives among equals)
    conv_s = np.unique(np.round(np.asarray(rs["converged_boxes"]), 3), axis=0)
    conv_r = np.unique(np.round(np.asarray(rr["converged_boxes"]), 3), axis=0)
    np.testing.assert_array_equal(conv_s, conv_r)
    best_r = max(iou(b, gt) for b in rr["converged_boxes"])
    assert best_r > 0.6
    # reference mode re-predicts converged boxes: its per-round active
    # trace dominates the sticky trace
    tr_s = rs["stats"]["boundary_active_trace"]
    tr_r = rr["stats"]["boundary_active_trace"]
    assert sum(tr_r) >= sum(tr_s)


def test_segmented_boundary_matches_fused():
    # cfg.boundary_segment splits the boundary evolution into bounded
    # host-driven device calls (TPU-worker watchdog safety); results
    # must be identical to the fused single-program path, in both
    # convergence modes
    gt = (60, 70, 140, 150)
    world = make_world(200, [gt, (20, 30, 50, 110)])
    for sticky in (True, False):
        fused = _engine(sticky_convergence=sticky)
        seg = _engine(sticky_convergence=sticky, boundary_segment=4)
        rf = fused.discover(world)
        rs = seg.discover(world)
        np.testing.assert_array_equal(rs["boxes"], rf["boxes"])
        np.testing.assert_array_equal(rs["converged_boxes"], rf["converged_boxes"])
        assert rs["stats"] == rf["stats"], (sticky, rs["stats"], rf["stats"])


def test_uint8_wire_canvases_match_float():
    # uint8 canvases (the CLI wire format) decode on device to the same
    # results as float input — the world here is quantization-exact
    gt = (60, 70, 140, 150)
    world = make_world(200, [gt])
    world_q = np.clip(world * 255.0 + 0.5, 0, 255).astype(np.uint8)
    # rebuild the float world from the quantized one so both paths see
    # bit-identical pixel values
    world_f = world_q.astype(np.float32) / 255.0
    eng_f = _engine()
    eng_u = _engine()
    rf = eng_f.discover(world_f)
    ru = eng_u.discover(world_q)
    np.testing.assert_array_equal(ru["boxes"], rf["boxes"])
    assert ru["stats"] == rf["stats"]


def test_sharded_segmented_matches_sharded_fused():
    # the multi-device segmented path (watchdog safety) must match the
    # fused sharded program exactly, per device
    gt_a = (60, 70, 140, 150)
    gt_b = (20, 30, 90, 110)
    worlds = [make_world(200, [gt_a]), make_world(200, [gt_b, gt_a])]
    kwargs = dict(
        canvas_size=200, max_proposals=256, max_splits=256, max_active=256,
        crop_chunk=16, n_round=30, analyze_cc=False, image_batch=1,
    )
    fused = ObjectDiscoveryEngine(
        fake_objectness, fake_classifier, ReasoningConfig(**kwargs),
        devices=jax.devices()[:2],
    )
    seg = ObjectDiscoveryEngine(
        fake_objectness, fake_classifier,
        ReasoningConfig(boundary_segment=4, **kwargs),
        devices=jax.devices()[:2],
    )
    rf = fused.discover_batch(worlds)
    rs = seg.discover_batch(worlds)
    for a, b in zip(rs, rf):
        np.testing.assert_array_equal(a["boxes"], b["boxes"])
        assert a["stats"] == b["stats"]


def test_rank_keep_sheds_lowest_scores():
    from unmore_tpu.reasoning.engine import _rank_keep

    valid = jnp.array([True, True, False, True, True])
    scores = jnp.array([0.9, 0.2, 0.5, 0.2, 0.7])
    keep, overflow = _rank_keep(valid, scores, 2)
    assert int(overflow) == 2
    np.testing.assert_array_equal(np.asarray(keep), [True, False, False, False, True])
    # ties keep lattice order (stable): with all scores equal the first
    # out_slots valid rows survive — identical to plain compaction
    keep2, ov2 = _rank_keep(jnp.ones(4, bool), jnp.full((4,), 0.5), 2)
    np.testing.assert_array_equal(np.asarray(keep2), [True, True, False, False])
    assert int(ov2) == 2
    # no overflow -> keep == valid, overflow 0 (bit-identical path)
    keep3, ov3 = _rank_keep(valid, scores, 4)
    np.testing.assert_array_equal(np.asarray(keep3), np.asarray(valid))
    assert int(ov3) == 0


def test_split_overflow_sheds_weakest_parents():
    # two singularity-failing pair-parents — one strong (ch0=1.0,
    # existence 1.0), one weak (0.6) — spawn 4 splits each; demand 8 >
    # max_splits 4 must shed the weak parent's splits by the PARENT's
    # existence score, not drop whatever sits last in lattice order
    # (the r5 500-scene run measured 7.5k lattice-order split drops on
    # sparse groups; reference keeps unbounded lists,
    # object_reasoning.py:615-666).
    a1, a2 = (10, 10, 60, 60), (60, 10, 110, 60)      # strong pair
    c1, c2 = (10, 110, 60, 160), (60, 110, 110, 160)  # weak pair
    # list order gives strong objects even indices (painted 1.0) and
    # weak objects odd indices (painted 0.6)
    world = make_world(200, [a1, c1, a2, c2])
    cfg = ReasoningConfig(
        canvas_size=200, image_batch=1,
        max_proposals=8, max_splits=4, max_active=16,
        crop_chunk=4, crop_chunk_tail=4, n_round=4, analyze_cc=False,
    )
    engine = ObjectDiscoveryEngine(fake_objectness, fake_classifier, cfg)
    canvases = jnp.asarray(world[None])
    hw = jnp.array([[200.0, 200.0]])
    boxes = np.zeros((8, 4), np.float32)
    boxes[0] = (10, 10, 110, 60)    # strong parent: covers a1+a2
    boxes[1] = (10, 110, 110, 160)  # weak parent: covers c1+c2
    valid = np.zeros(8, bool)
    valid[:2] = True
    idx = np.zeros(8, np.int32)
    act_boxes, act_idx, act_valid, stats = jax.jit(engine._core_pre)(
        engine.variables, canvases, hw,
        jnp.asarray(boxes), jnp.asarray(idx), jnp.asarray(valid),
    )
    assert int(stats["n_split"]) == 8
    assert int(stats["split_overflow"]) == 4
    kept = np.asarray(act_boxes)[np.asarray(act_valid)]
    assert len(kept) > 0
    # every surviving candidate derives from the strong parent's splits;
    # the weak parent's splits were shed, so nothing survives in the
    # weak pair's region (y >= 110)
    assert max(iou(b, a1) for b in kept) > 0.3 or max(iou(b, a2) for b in kept) > 0.3
    assert all((b[1] + b[3]) / 2 < 100 for b in kept), kept


def test_boundary_overflow_sheds_weakest_candidates():
    # 12 single-object proposals, alternating strong (ch0=1.0, existence
    # score 1.0) and weak (0.6) — demand 12 > max_active 8 must shed the
    # 4 weakest by existence score, NOT the last 4 in lattice order
    # (reference keeps unbounded lists, object_reasoning.py:615-666;
    # plain compaction dropped splits-last regardless of merit).
    objs = [(10 + 15 * k, 10, 22 + 15 * k, 22) for k in range(12)]
    world = make_world(200, objs)
    cfg = ReasoningConfig(
        canvas_size=200, image_batch=1,
        max_proposals=16, max_splits=16, max_active=8,
        crop_chunk=8, crop_chunk_tail=8, n_round=4, analyze_cc=False,
    )
    engine = ObjectDiscoveryEngine(fake_objectness, fake_classifier, cfg)
    canvases = jnp.asarray(world[None])
    hw = jnp.array([[200.0, 200.0]])
    boxes = np.zeros((16, 4), np.float32)
    boxes[:12] = np.asarray(objs, np.float32)
    valid = np.zeros(16, bool)
    valid[:12] = True
    idx = np.zeros(16, np.int32)
    act_boxes, act_idx, act_valid, stats = jax.jit(engine._core_pre)(
        engine.variables, canvases, hw,
        jnp.asarray(boxes), jnp.asarray(idx), jnp.asarray(valid),
    )
    assert int(stats["n_boundary_in"]) == 12
    assert int(stats["active_overflow"]) == 4
    kept = np.asarray(act_boxes)[np.asarray(act_valid)]
    kept_set = {tuple(b) for b in kept.tolist()}
    strong = {tuple(map(float, objs[k])) for k in range(0, 12, 2)}
    weak_first = {tuple(map(float, objs[k])) for k in (1, 3)}
    # every strong candidate survives; the remaining 2 slots go to the
    # first weak candidates in lattice order (stable tie-break)
    assert strong <= kept_set, f"missing strong: {strong - kept_set}"
    assert weak_first <= kept_set
    assert len(kept_set) == 8

"""Scoring engine tests with the analytic world from the engine tests."""

import numpy as np

from unmore_tpu.reasoning.scoring import ObjectScoringEngine, ScoringConfig
from unmore_tpu.utils import rle
from tests.test_reasoning_engine import fake_classifier, fake_objectness, make_world


def test_score_image_produces_coco_annotations():
    gt = (60, 70, 140, 150)
    world = make_world(200, [gt])
    engine = ObjectScoringEngine(
        fake_objectness,
        fake_classifier,
        ScoringConfig(canvas_size=200, slot_multiple=8, crop_chunk=8),
    )
    boxes = np.array(
        [
            [55, 65, 145, 155],  # loose box around the object
            [60, 70, 140, 150],  # exact box
            [0, 0, 40, 40],      # background box
        ],
        np.float32,
    )
    anns = engine.score_image(world, boxes, image_id=7)
    assert len(anns) >= 1
    best = max(anns, key=lambda a: a["score"])
    x, y, w, h = best["bbox"]
    # tight box must hug the painted object
    assert abs(x - gt[0]) <= 3 and abs(y - gt[1]) <= 3
    assert abs(x + w - gt[2]) <= 3 and abs(y + h - gt[3]) <= 3
    assert 0.0 <= best["score"] <= 1.0
    assert best["existence_score"] > 0.5
    assert best["center_score"] > 0.5
    assert best["boundary_score"] > 0.5
    # RLE decodes to a mask matching the object region
    mask = rle.decode(best["segmentation"])
    assert mask.shape == (200, 200)
    inside = mask[gt[1] + 5 : gt[3] - 5, gt[0] + 5 : gt[2] - 5].mean()
    outside = mask.sum() - mask[gt[1] : gt[3], gt[0] : gt[2]].sum()
    assert inside > 0.9
    assert outside < 0.1 * mask.sum()
    # background box scores ~0 existence or is NMS'd away
    for a in anns:
        bx, by = a["bbox"][0], a["bbox"][1]
        if bx < 40 and by < 40 and a["bbox"][2] < 45:
            assert a["existence_score"] <= 0.01


def test_score_image_empty_boxes():
    world = make_world(200, [])
    engine = ObjectScoringEngine(
        fake_objectness, fake_classifier, ScoringConfig(canvas_size=200, slot_multiple=8, crop_chunk=8)
    )
    assert engine.score_image(world, np.zeros((0, 4), np.float32), 1) == []


def test_score_batch_matches_score_image_and_shards_over_devices():
    # batched multi-image scoring (shared lattice) and the shard_map
    # multi-device path must both reproduce per-image scoring exactly
    import jax

    gt_a = (60, 70, 140, 150)
    gt_b = (30, 40, 100, 120)
    world_a = make_world(200, [gt_a])
    world_b = make_world(200, [gt_b])
    boxes_a = np.array([[55, 65, 145, 155], [0, 0, 40, 40]], np.float32)
    boxes_b = np.array([[25, 35, 105, 125]], np.float32)

    cfg = ScoringConfig(canvas_size=200, slot_multiple=8, crop_chunk=8, image_batch=2)
    single = ObjectScoringEngine(fake_objectness, fake_classifier, cfg)
    ref = [
        single.score_image(world_a, boxes_a, 7),
        single.score_image(world_b, boxes_b, 8),
    ]

    batched = single.score_batch([world_a, world_b], [boxes_a, boxes_b], [7, 8])
    sharded_eng = ObjectScoringEngine(
        fake_objectness, fake_classifier,
        ScoringConfig(canvas_size=200, slot_multiple=8, crop_chunk=8, image_batch=1),
        devices=jax.devices()[:2],
    )
    assert sharded_eng.image_slots == 2
    sharded = sharded_eng.score_batch([world_a, world_b], [boxes_a, boxes_b], [7, 8])

    for out in (batched, sharded):
        assert len(out) == 2
        for anns, ref_anns in zip(out, ref):
            assert len(anns) == len(ref_anns)
            for a, r in zip(anns, ref_anns):
                assert a["image_id"] == r["image_id"]
                np.testing.assert_allclose(a["bbox"], r["bbox"])
                np.testing.assert_allclose(a["score"], r["score"], rtol=1e-5)
                assert a["segmentation"] == r["segmentation"]


def test_score_batch_empty_and_mixed():
    world = make_world(200, [(60, 70, 140, 150)])
    eng = ObjectScoringEngine(
        fake_objectness, fake_classifier,
        ScoringConfig(canvas_size=200, slot_multiple=8, crop_chunk=8, image_batch=2),
    )
    out = eng.score_batch(
        [world, world],
        [np.zeros((0, 4), np.float32), np.array([[55, 65, 145, 155]], np.float32)],
        [1, 2],
    )
    assert out[0] == []
    assert len(out[1]) >= 1 and out[1][0]["image_id"] == 2

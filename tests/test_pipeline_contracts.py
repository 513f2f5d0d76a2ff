"""End-to-end JSON-contract test: discovery -> scoring -> post_process ->
merge -> COCO evaluation on a synthetic 3-image COCO fixture.

Exercises the inter-stage contracts the reference pipeline relies on
(SURVEY.md §1 L4): discovery_results.json {image_id: [N,4] xyxy},
object_discovery_with_scores.json (COCO ann list with sub-scores),
selected_training_annotations.json, COCO_merged_IN_training_format.json,
and ap_score metrics.
"""

import json
import os
import sys

import numpy as np

from unmore_tpu.cli.common import NpEncoder
from unmore_tpu.evaluation.coco_eval import evaluate_ap
from unmore_tpu.reasoning.engine import ObjectDiscoveryEngine, ReasoningConfig
from unmore_tpu.reasoning.scoring import ObjectScoringEngine, ScoringConfig
from tests.test_reasoning_engine import fake_classifier, fake_objectness, make_world

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import post_process  # noqa: E402
from merge_coco_and_imagenet import merge  # noqa: E402

SCENES = {
    101: [(60, 70, 140, 150)],
    102: [(20, 20, 80, 80), (110, 110, 180, 180)],
    103: [(50, 40, 150, 160)],
}


def _gt_json():
    images = [{"id": i, "height": 200, "width": 200, "file_name": f"{i}.jpg"} for i in SCENES]
    anns = []
    for img_id, objs in SCENES.items():
        for (x1, y1, x2, y2) in objs:
            anns.append(
                {
                    "id": len(anns),
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "iscrowd": 0,
                }
            )
    return {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "fg"}]}


def test_full_stage2_pipeline(tmp_path):
    cfg = ReasoningConfig(
        canvas_size=200, max_proposals=256, max_splits=256, max_active=256,
        crop_chunk=16, n_round=30, analyze_cc=True, cc_max_components=4,
    )
    discovery = ObjectDiscoveryEngine(fake_objectness, fake_classifier, cfg)
    scoring = ObjectScoringEngine(
        fake_objectness, fake_classifier,
        ScoringConfig(canvas_size=200, slot_multiple=16, crop_chunk=16),
    )

    # stage 2a: discovery
    results = {}
    worlds = {}
    for img_id, objs in SCENES.items():
        world = make_world(200, objs)
        worlds[img_id] = world
        out = discovery.discover(world)
        if len(out["boxes"]):
            results[img_id] = out["boxes"]
    assert len(results) == 3
    disc_path = tmp_path / "discovery_results.json"
    with open(disc_path, "w") as f:
        json.dump(results, f, cls=NpEncoder)

    # stage 2b: scoring (reads the discovery contract back)
    with open(disc_path) as f:
        raw = json.load(f)
    all_anns = []
    for img_id_str, boxes in raw.items():
        img_id = int(img_id_str)
        anns = scoring.score_image(worlds[img_id], np.asarray(boxes, np.float32), img_id)
        all_anns.extend(anns)
    assert all_anns
    for ann in all_anns:
        assert set(ann) >= {
            "image_id", "category_id", "score", "bbox", "segmentation",
            "existence_score", "center_score", "boundary_score", "area_score",
        }
    scores_path = tmp_path / "object_discovery_with_scores.json"
    with open(scores_path, "w") as f:
        json.dump(all_anns, f, cls=NpEncoder)

    # post-process: threshold filter -> training JSON
    gt_path = tmp_path / "gt.json"
    with open(gt_path, "w") as f:
        json.dump(_gt_json(), f)
    post_process.main(
        [
            "--pred_annotations_path", str(scores_path),
            "--gt_annotation_path", str(gt_path),
            "--existence_score_thres", "0.5",
            "--center_score_thres", "0.5",
            "--boundary_score_thres", "0.5",
        ]
    )
    selected_path = tmp_path / "selected_training_annotations.json"
    with open(selected_path) as f:
        training = json.load(f)
    assert training["images"] and training["annotations"]
    assert all(a["score"] == a["area_score"] for a in training["annotations"])

    # merge with a fake ImageNet training JSON
    imagenet = {
        "images": [{"id": 900, "height": 50, "width": 50, "file_name": "in.jpg"}],
        "annotations": [
            {"id": 0, "image_id": 900, "category_id": 1, "bbox": [0, 0, 10, 10], "weight": 0.9},
            {"id": 1, "image_id": 900, "category_id": 1, "bbox": [0, 0, 10, 10], "weight": 0.2},
        ],
    }
    merged = merge(training, imagenet)
    assert any(str(i["id"]).startswith("imagenet_") for i in merged["images"])
    assert any(str(i["id"]).startswith("coco_") for i in merged["images"])
    # low-weight imagenet ann dropped; ids reindexed densely
    in_anns = [a for a in merged["annotations"] if str(a["image_id"]).startswith("imagenet_")]
    assert len(in_anns) == 1 and in_anns[0]["score"] == 0.9
    assert [a["id"] for a in merged["annotations"]] == list(range(len(merged["annotations"])))

    # evaluation: discovered objects must score well against the fixture GT
    metrics = evaluate_ap(_gt_json(), all_anns, iou_types=("bbox",))["bbox"]
    assert metrics["AR100"] > 0.5, metrics
    assert metrics["AP50"] > 0.3, metrics


def test_discovery_partial_results_roundtrip(tmp_path):
    """Group-durability contract of the discovery CLI: every processed
    image gets a JSONL record (zero-box images included), torn tail
    lines from a mid-append kill are skipped, and the loader separates
    "processed" (done_ids) from "kept" (results)."""
    import object_reasoning

    part = tmp_path / "partial_results_p0.jsonl"
    lines = [
        json.dumps({"image_id": 7, "boxes": [[0, 0, 10.5, 12.0]]}),
        json.dumps({"image_id": 8, "boxes": []}),  # processed, nothing kept
        '{"image_id": 9, "boxes": [[1, 1, ',  # torn tail from a kill
    ]
    part.write_text("\n".join(lines) + "\n")
    done_ids, results = object_reasoning.load_partial_results(str(part))
    assert done_ids == {7, 8}  # 9's record was torn -> it will be redone
    assert results == {7: [[0, 0, 10.5, 12.0]]}

    # missing file: a fresh run
    done_ids, results = object_reasoning.load_partial_results(str(tmp_path / "absent.jsonl"))
    assert done_ids == set() and results == {}

    # the scoring CLI shares the loader with an "anns" field
    from unmore_tpu.cli.common import load_partial_jsonl

    spart = tmp_path / "scoring_partial_p0.jsonl"
    spart.write_text(
        json.dumps({"image_id": 3, "anns": [{"bbox": [0, 0, 5, 5], "score": 0.7}]})
        + "\n"
        + json.dumps({"image_id": 4, "anns": []})
        + "\n"
    )
    done_ids, kept = load_partial_jsonl(str(spart), "anns")
    assert done_ids == {3, 4}
    assert kept == {3: [{"bbox": [0, 0, 5, 5], "score": 0.7}]}

    # fingerprint guard: a legacy (unstamped) file is accepted and
    # stamped in place; the same fingerprint then keeps the records,
    # while a DIFFERENT one (changed ckpt/inputs) rotates the file to
    # .stale and starts fresh instead of silently reusing stale results
    done_ids, kept = load_partial_jsonl(str(spart), "anns", fingerprint="fp-a")
    assert done_ids == {3, 4}
    assert "fp-a" in spart.read_text()
    done_ids, kept = load_partial_jsonl(str(spart), "anns", fingerprint="fp-a")
    assert done_ids == {3, 4} and 3 in kept
    done_ids, kept = load_partial_jsonl(str(spart), "anns", fingerprint="fp-B")
    assert done_ids == set() and kept == {}
    assert (tmp_path / "scoring_partial_p0.jsonl.stale").exists()
    # the fresh file carries only the new stamp
    assert "fp-B" in spart.read_text() and "image_id" not in spart.read_text()


def test_partial_fingerprint_sensitivity(tmp_path):
    """Supervision/launch flags can't change per-image results and are
    excluded; model inputs and result-shaping args are included."""
    import argparse

    from unmore_tpu.cli.common import partial_fingerprint

    ckpt = tmp_path / "model.ckpt"
    ckpt.write_bytes(b"x" * 100)
    ns = argparse.Namespace(
        canvas_size=512, max_active=1536, max_restarts=0,
        hang_timeout_min=30.0, busy_hang_timeout_min=15.0, devices=-1,
        gpu_index=0,
    )
    fp0 = partial_fingerprint(ns, [str(ckpt)])
    ns.max_restarts, ns.devices = 3, 2
    assert partial_fingerprint(ns, [str(ckpt)]) == fp0  # launch flags ignored
    ns.max_active = 1024
    fp1 = partial_fingerprint(ns, [str(ckpt)])
    assert fp1 != fp0  # result-shaping arg included
    ns.max_active = 1536
    ckpt.write_bytes(b"x" * 101)  # changed checkpoint bytes
    assert partial_fingerprint(ns, [str(ckpt)]) != fp0

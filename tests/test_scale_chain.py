"""Tiny-world smoke of the unattended scale chain (VERDICT r4 missing #4).

Drives the IDENTICAL committed scripts (scale_chain_r5.sh ->
scale_run_r5.sh) end to end on a CPU-sized world: world generation,
both stage-1 trainers (supervised), segmented discovery, scoring,
post-process + COCO eval, merge, and a 2-iter CAD run — asserting the
chain completes with zero failed steps and every stage's contract
artifact exists. The A/B legs are excluded: their reference-rounds
cost does not tiny-world-bound (they re-predict every box all 50
rounds), and both A/B scripts run in the production chain itself.
"""

import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CAD_YAML = """
MODEL:
  MASK_ON: true
  RESNETS:
    STAGE_BLOCKS: [1, 1, 1, 1]
  ROI_HEADS:
    NUM_CLASSES: 1
    BATCH_SIZE_PER_IMAGE: 16
  RPN:
    PRE_NMS_TOPK_TRAIN: 64
    PRE_NMS_TOPK_TEST: 32
    POST_NMS_TOPK_TRAIN: 64
    POST_NMS_TOPK_TEST: 32
INPUT:
  MAX_GT: 8
  GT_MASK_RES: 16
  MIN_SIZE_TRAIN: [64]
SOLVER:
  IMS_PER_BATCH: 2
  BASE_LR: 0.002
  CHECKPOINT_PERIOD: 2
TEST:
  DETECTIONS_PER_IMAGE: 8
  PRECISE_BN:
    ENABLED: false
"""


@pytest.mark.slow
def test_scale_chain_smoke(tmp_path):
    work = tmp_path / "work"
    cad_cfg = tmp_path / "tiny_cad.yaml"
    cad_cfg.write_text(TINY_CAD_YAML)
    env = os.environ.copy()
    # The container's sitecustomize registers the axon TPU backend
    # whenever PALLAS_AXON_POOL_IPS is set, and registration overrides
    # JAX_PLATFORMS=cpu — without the pop, every chain subprocess runs
    # on the real chip (slow, and it contends with live scale runs).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1").strip(),
        REPO=REPO,
        WORK=str(work),
        SYNTH=str(tmp_path / "world"),
        # world: 2 scenes (1 dense), 6 stage-1 images, 128px
        SCENES="2", STAGE1_N="6", DENSE_FRAC="0.5", DENSE_OBJECTS="4",
        SIZE="128",
        # trainers: 2 iters each, tiny batches, checkpoint at the end
        S1_ITERS="2", SAVE_EVERY="2", S1_BATCH="2", BACKBONE="dpt_base",
        EXIST_ITERS="2", EXIST_SAVE="2", EXIST_BATCH="2",
        # discovery: small lattices, 4 boundary rounds, 1 scene/process
        CANVAS="128", IMAGE_BATCH="1", SEG="1",
        MAX_ACTIVE="256", MAX_PROPOSALS="512", MAX_SPLITS="512", N_ROUND="4",
        # CAD: 2 iters on a 64px canvas with the tiny config
        CAD_ITERS="2", CAD_STEP="1", CAD_BATCH="2",
        CAD_CONFIG=str(cad_cfg), CAD_CANVAS="64", CAD_EVAL_PERIOD="0",
        STEPS=(
            "step_world step_stage1 step_existence step_discovery "
            "step_scoring step_post_eval step_merge step_cad"
        ),
    )
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "scale_chain_r5.sh")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    failed = work / "failed_steps.txt"
    if failed.exists():
        steps = failed.read_text().split()
        logs = "\n".join(
            f"--- {s}:\n" + (work / f"{s}.log").read_text()[-3000:] for s in steps
        )
        raise AssertionError(f"failed steps {steps}\n{logs}\nchain:\n{proc.stdout[-2000:]}")
    assert "chain complete" in proc.stdout

    # stage contracts
    world = tmp_path / "world"
    assert (world / "coco" / "instances.json").is_file()
    assert (world / "imagenet_training.json").is_file()
    disc = work / "results_reasoning" / "disc_r5" / "discovery_results.json"
    assert disc.is_file()
    with open(disc) as f:
        # only images with >=1 final box get an entry, and a 2-iter
        # model legitimately converges zero boxes — the contract here
        # is the merged mapping itself plus the per-image stats below
        assert isinstance(json.load(f), dict)
    # both scenes were processed through every reasoning phase: the
    # per-segment stats aggregate (written by parse_discovery_stats.py
    # from the segment logs) proves seeding/existence ran per image
    with open(work / "discovery_stats_r5.json") as f:
        stats = json.load(f)
    assert stats["all"]["images"] == 2
    assert stats["all"]["seed_boxes_total"] > 0
    assert (work / "results_reasoning" / "disc_r5" / "object_discovery_with_scores.json").is_file()
    assert (work / "ap_score_pseudo.json").is_file()
    assert (
        work / "results_reasoning" / "disc_r5" / "merged_with_imagenet"
        / "COCO_merged_IN_training_format.json"
    ).is_file()
    assert (work / "cad_r5" / "model_0000002.ckpt").is_file()
    # every stage stamped exact wall-clocks
    timings = (work / "scale_timings.txt").read_text()
    for stage in ("world", "stage1", "existence", "scoring", "cad"):
        assert f"{stage} start" in timings and f"{stage} done" in timings

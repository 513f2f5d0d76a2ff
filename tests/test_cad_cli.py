"""End-to-end cad/train_net.py CLI test on a tiny synthetic dataset:
training with checkpoints, --resume restart (reference resume_or_load,
defaults.py:458-481), in-train eval at TEST.EVAL_PERIOD with PreciseBN
(defaults.py:498-523), and eval-only — all through the real CLI
surface on the 8-device CPU mesh.
"""

import importlib.util
import json
import os

import cv2
import numpy as np
import pytest

from unmore_tpu.utils import rle as rle_codec


def _load_cli():
    path = os.path.join(os.path.dirname(__file__), "..", "cad", "train_net.py")
    spec = importlib.util.spec_from_file_location("cad_train_net", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_dataset(root, n_images=4, size=96):
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(1, n_images + 1):
        img = rng.rand(size, size, 3).astype(np.float32) * 0.3
        for _ in range(2):
            x1, y1 = rng.randint(4, size // 2, 2)
            w, h = rng.randint(16, size // 3, 2)
            mask = np.zeros((size, size), np.uint8)
            mask[y1 : y1 + h, x1 : x1 + w] = 1
            img[mask > 0] = rng.rand(3) * 0.6 + 0.4
            annotations.append(
                {
                    "id": ann_id, "image_id": i, "category_id": 1,
                    "bbox": [int(x1), int(y1), int(w), int(h)],
                    "area": int(mask.sum()), "iscrowd": 0,
                    "segmentation": rle_codec.encode(mask),
                    "score": 0.9,
                }
            )
            ann_id += 1
        fname = f"{i:06d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fname), (img[..., ::-1] * 255).astype(np.uint8))
        images.append({"id": i, "file_name": fname, "height": size, "width": size})
    gt = {"images": images, "annotations": annotations, "categories": [{"id": 1, "name": "fg"}]}
    json_path = os.path.join(root, "instances.json")
    with open(json_path, "w") as f:
        json.dump(gt, f)
    return img_dir, json_path


TINY_YAML = """
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
  IMS_PER_BATCH: 8
  BASE_LR: 0.002
  MAX_ITER: {max_iter}
  CHECKPOINT_PERIOD: 2
TEST:
  EVAL_PERIOD: {eval_period}
  DETECTIONS_PER_IMAGE: 8
  PRECISE_BN:
    ENABLED: true
    NUM_ITER: 2
OUTPUT_DIR: "{out_dir}"
"""


@pytest.mark.slow
def test_cad_cli_train_eval_resume(tmp_path):
    cli = _load_cli()
    img_dir, json_path = _tiny_dataset(str(tmp_path))
    out_dir = str(tmp_path / "out")
    cfg_path = str(tmp_path / "tiny.yaml")

    def run(max_iter, eval_period, resume=False):
        with open(cfg_path, "w") as f:
            f.write(TINY_YAML.format(max_iter=max_iter, eval_period=eval_period, out_dir=out_dir))
        argv = [
            "--config-file", cfg_path,
            "--canvas-size", "64",
            "--eval-bs", "8",  # auto would pick 4/device x 8 devices = 32
            "--train-json", json_path,
            "--image-root", f"={img_dir}",
            "--test-json", json_path,
            "--test-image-dir", img_dir,
        ]
        if resume:
            argv.append("--resume")
        cli.main(argv)

    # phase 1: 2 iters -> one checkpoint, no eval
    run(max_iter=2, eval_period=0)
    assert os.path.isfile(os.path.join(out_dir, "model_0000002.ckpt"))

    # phase 2: --resume continues from iter 2 and runs the in-train eval
    # (with PreciseBN) at iter 4
    run(max_iter=4, eval_period=4, resume=True)
    assert os.path.isfile(os.path.join(out_dir, "model_0000004.ckpt"))
    eval_metrics = os.path.join(out_dir, "metrics_iter_0000004.json")
    assert os.path.isfile(eval_metrics), os.listdir(out_dir)
    with open(eval_metrics) as f:
        m = json.load(f)
    assert "bbox" in m and "AP" in m["bbox"]
    # resume continued (did not restart): the phase-1 checkpoint at iter 2
    # still exists alongside the new one at iter 4
    assert os.path.isfile(os.path.join(out_dir, "model_0000002.ckpt"))

    # eval-only path reuses the same weights; TEST.EXPECTED_RESULTS gates
    # the run on AP (reference verify_results, cad/train_net.py:150-151;
    # the raising path is unit-tested in test_verify_results_semantics)
    cli.main([
        "--config-file", cfg_path, "--canvas-size", "64", "--eval-bs", "8",
        "--eval-only",
        "--test-json", json_path, "--test-image-dir", img_dir,
        "MODEL.WEIGHTS", os.path.join(out_dir, "model_0000004.ckpt"),
        "TEST.EXPECTED_RESULTS", "[['bbox', 'AP', 50.0, 50.0]]",
    ])
    assert os.path.isfile(os.path.join(out_dir, "metrics_eval_only.json"))


def test_find_last_checkpoint(tmp_path):
    cli = _load_cli()
    assert cli.find_last_checkpoint(str(tmp_path)) is None
    for n in (2, 10):
        open(tmp_path / f"model_{n:07d}.ckpt", "w").close()
    open(tmp_path / "model_bad.ckpt", "w").close()
    assert cli.find_last_checkpoint(str(tmp_path)).endswith("model_0000010.ckpt")


def test_verify_results_semantics():
    # TEST.EXPECTED_RESULTS entries are [task, metric, expected(0-100),
    # tolerance] (reference defaults.py:550-555); metrics here are 0-1
    cli = _load_cli()
    metrics = {"bbox": {"AP": 0.385, "AP50": 0.60}}
    cfg = {"TEST": {"EXPECTED_RESULTS": [["bbox", "AP", 38.5, 0.2]]}}
    assert cli.verify_results(cfg, metrics)
    cfg_bad = {"TEST": {"EXPECTED_RESULTS": [["bbox", "AP50", 90.0, 1.0]]}}
    with pytest.raises(AssertionError):
        cli.verify_results(cfg_bad, metrics)
    # missing metric -> NaN -> fail, never a silent pass
    cfg_missing = {"TEST": {"EXPECTED_RESULTS": [["segm", "AP", 10.0, 5.0]]}}
    with pytest.raises(AssertionError):
        cli.verify_results(cfg_missing, metrics)
    assert cli.verify_results({}, metrics)  # no expectations -> no-op

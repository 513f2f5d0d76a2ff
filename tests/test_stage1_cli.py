"""Stage-1 trainer CLI: --eval_mode unit coverage (VERDICT r3 item 7 —
previously only validated by hand-driven CLI runs on the chip) and the
resume-path fallback for checkpoints outside the run-dir layout.

Uses the existence-classifier path (ResNet-50 at 64² is cheap on the
CPU mesh); the objectness eval_mode shares the same _run_dir_of_ckpt /
evaluate-and-exit plumbing.
"""

import importlib.util
import json
import os
import shutil

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_cli():
    path = os.path.join(REPO, "train_objectness_net.py")
    spec = importlib.util.spec_from_file_location("stage1_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_stage1_world(root, n=6, size=64):
    """ImageNet+VoteCut directory convention: imagenet/<cls>/img.JPEG +
    masks/<cls>/img.png (reference datasets.py:85-93)."""
    img_dir = os.path.join(root, "imagenet", "n01")
    mask_dir = os.path.join(root, "masks", "n01")
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    rng = np.random.RandomState(0)
    for i in range(n):
        img = (rng.rand(size, size, 3) * 0.3 * 255).astype(np.uint8)
        mask = np.zeros((size, size), np.uint8)
        x, y = rng.randint(8, size // 2, 2)
        w, h = rng.randint(12, size // 3, 2)
        mask[y : y + h, x : x + w] = 255
        img[mask > 0] = (rng.rand(3) * 0.5 * 255 + 100).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"img_{i:03d}.JPEG"), img[..., ::-1])
        cv2.imwrite(os.path.join(mask_dir, f"img_{i:03d}.png"), mask)
    return os.path.join(root, "imagenet"), os.path.join(root, "masks")


@pytest.mark.slow
def test_existence_eval_mode_and_loose_ckpt(tmp_path, monkeypatch):
    cli = _load_cli()
    imagenet_dir, mask_dir = _tiny_stage1_world(str(tmp_path))
    monkeypatch.chdir(tmp_path)

    common = [
        "--train_existence",
        "--imagenet_dir", imagenet_dir,
        "--votecut_mask_dir", mask_dir,
        "--image_size", "64",
        "--batch_size", "8",
        "--test_batch_size", "8",
        "--num_workers", "1",
        "--dtype", "float32",
    ]
    # short training run producing one checkpoint
    cli.main(common + [
        "--run_name", "evalmode", "--train_iter", "3",
        "--save_ckpt_every", "4", "--log_every", "2", "--evaluate_every", "100",
    ])
    run_dir = os.path.join("results_objectness", "existence", "evalmode")
    ckpt = os.path.join(run_dir, "ckpt", "iter_4_model.ckpt")
    assert os.path.isfile(ckpt), os.listdir(os.path.join(run_dir, "ckpt"))

    # --eval_mode: evaluate-and-exit into <run>/evaluation (reference
    # train_objectness_net.py:632-636): eval_log.json + gt/pred-named dumps
    cli.main(common + ["--eval_mode", "--resume", ckpt])
    eval_dir = os.path.join(run_dir, "evaluation")
    with open(os.path.join(eval_dir, "eval_log.json")) as f:
        log = json.load(f)
    assert "4" in log and 0.0 <= log["4"] <= 1.0
    img_dir = os.path.join(eval_dir, "imgs", "iter_4")
    dumps = os.listdir(img_dir)
    assert dumps and all("_gt_" in d and "_pred_" in d for d in dumps)

    # a checkpoint outside the run-dir layout (no /ckpt/ component) must
    # fall back to its containing directory (ADVICE r3: this raised
    # NotADirectoryError via os.makedirs on a path under the ckpt FILE)
    loose_dir = tmp_path / "loose"
    loose_dir.mkdir()
    loose = str(loose_dir / "model.ckpt")
    shutil.copyfile(ckpt, loose)
    cli.main(common + ["--eval_mode", "--resume", loose])
    assert os.path.isfile(os.path.join(str(loose_dir), "evaluation", "eval_log.json"))

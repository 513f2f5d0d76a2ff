"""Detector train-step + data-pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp

from unmore_tpu.data.detection import Instance, copy_and_paste, to_lattice
from unmore_tpu.detector.cascade_rcnn import CascadeMaskRCNN
from unmore_tpu.parallel.mesh import data_parallel_mesh, replicate, shard_batch
from unmore_tpu.train.detector import (
    init_detector_state,
    make_detector_optimizer,
    make_detector_train_step,
)
from tests.test_detector import _tiny_batch, _tiny_cfg


def _sample(size=64, boxes=((5, 5, 30, 30),), single=0.0):
    rng = np.random.RandomState(0)
    img = rng.rand(size, size, 3).astype(np.float32)
    insts = []
    for (x1, y1, x2, y2) in boxes:
        m = np.zeros((size, size), bool)
        m[y1:y2, x1:x2] = True
        insts.append(Instance([x1, y1, x2, y2], m, 0.9))
    return {"image": img, "hw": (size, size), "instances": insts, "is_single_object": single}


def test_copy_and_paste_composites_and_prunes():
    rng = np.random.default_rng(0)
    donor = _sample(boxes=[(5, 5, 30, 30), (35, 35, 60, 60)])
    recipient = _sample(boxes=[(10, 10, 50, 50)])
    out = copy_and_paste(donor, recipient, rng, rate=1.0, min_ratio=0.5, max_ratio=1.0)
    assert len(out["instances"]) >= 1
    # boxes must be tight around masks
    for inst in out["instances"]:
        ys, xs = np.nonzero(inst.mask)
        assert inst.box[0] == xs.min() and inst.box[2] == xs.max() + 1
        assert inst.box[1] == ys.min() and inst.box[3] == ys.max() + 1
    # rate 0 -> untouched
    out0 = copy_and_paste(donor, recipient, rng, rate=0.0)
    assert out0 is recipient


def test_to_lattice_shapes_and_masks():
    s = _sample(boxes=[(8, 8, 40, 40)])
    lat = to_lattice(s, max_gt=4, mask_res=16)
    assert lat["gt_boxes"].shape == (4, 4)
    assert lat["gt_masks"].shape == (4, 16, 16)
    assert lat["gt_valid"].tolist() == [True, False, False, False]
    # uint8 wire format (device converts back to [0,1] float)
    assert lat["image"].dtype == np.uint8 and lat["gt_masks"].dtype == np.uint8
    assert lat["gt_masks"][0].mean() > 0.9 * 255  # box-frame mask of a full box
    assert lat["gt_scores"][0] == np.float32(0.9)
    # device-side conversion reproduces the float sample
    import jax.numpy as jnp
    from unmore_tpu.detector.cascade_rcnn import _mask_targets_float, _normalize

    img_f = np.asarray(_normalize(jnp.asarray(lat["image"])))
    ref_f = np.asarray(_normalize(jnp.asarray(s["image"], np.float32)))
    assert np.abs(img_f - ref_f).max() < 0.5 / 255 * 6  # quantization only
    m = np.asarray(_mask_targets_float(jnp.asarray(lat["gt_masks"])))
    assert m.dtype == np.float32 and m.max() <= 1.0


import pytest


@pytest.mark.slow  # ~2-6 min: GSPMD compile of the full cascade train graph
def test_detector_train_step_decreases_loss_on_mesh():
    cfg = _tiny_cfg()
    model = CascadeMaskRCNN(cfg)
    tx = make_detector_optimizer(base_lr=0.002, warmup_iters=0)
    mesh = data_parallel_mesh()
    state = init_detector_state(model, tx, jax.random.PRNGKey(0), cfg)
    state = replicate(mesh, state)
    step = make_detector_train_step(model, tx, cfg, mesh)
    batch = _tiny_batch(cfg, B=8)
    batch = shard_batch(mesh, {k: np.asarray(v) for k, v in batch.items()})
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-2:]) < losses[0], losses
    assert int(state.step) == 3

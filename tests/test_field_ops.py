"""Tests for the stage-2 decode primitives (erosion, anti-center, CC, NMS)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F
from scipy import ndimage

from unmore_tpu.ops.fields import (
    anti_center_map,
    batch_erode,
    center_singularity_scores,
    union_binary_mask,
)
from unmore_tpu.ops.connected_components import connected_component_boxes
from unmore_tpu.ops.nms import nms_mask, pairwise_iou


def _torch_batch_erode(binary_masks, kernel_size=9, num_round=3):
    """Reference semantics (utils/misc.py:10-20) re-stated in torch."""
    m = binary_masks.unsqueeze(1).double()
    kernel = torch.ones(1, 1, kernel_size, kernel_size).double()
    for _ in range(num_round):
        conved = F.conv2d(m, kernel, padding=(kernel_size - 1) // 2)
        m = (conved >= kernel_size * kernel_size).double()
    return m[:, 0]


def test_batch_erode_matches_reference_semantics():
    rng = np.random.RandomState(0)
    masks = (rng.rand(2, 40, 40) > 0.25).astype(np.float32)
    got = np.asarray(batch_erode(jnp.asarray(masks), 9, 3))
    want = _torch_batch_erode(torch.from_numpy(masks)).numpy()
    np.testing.assert_array_equal(got, want)


def _torch_anti_center(vote_maps, kernel_size=5):
    """Reference semantics (object_reasoning.py:360-377) re-stated in torch."""
    xv, yv = torch.meshgrid([torch.arange(kernel_size), torch.arange(kernel_size)], indexing="ij")
    grid = torch.stack((xv, yv), 2).view((1, kernel_size, kernel_size, 2)).float()
    conv_filter = -grid.permute(0, 3, 1, 2) + torch.tensor(
        [kernel_size // 2, kernel_size // 2]
    ).unsqueeze(0).unsqueeze(-1).unsqueeze(-1)
    conv_filter = torch.nn.functional.normalize(conv_filter, dim=1).double()
    out = F.conv2d(vote_maps.double(), conv_filter, padding=(kernel_size - 1) // 2)[:, 0]
    return out / (kernel_size**2 - 1)


def test_anti_center_map_matches_reference_semantics():
    rng = np.random.RandomState(1)
    fields = rng.randn(2, 20, 20, 2).astype(np.float32)
    got = np.asarray(anti_center_map(jnp.asarray(fields), 5))
    want = _torch_anti_center(torch.from_numpy(fields).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_anti_center_detects_sink_and_center():
    # synthetic field diverging from (16,16): score ~ -1 at the center;
    # a converging (sink) field scores ~ +1.
    h = w = 32
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    vec = np.stack([yy - 16.0, xx - 16.0], -1)
    norm = np.linalg.norm(vec, axis=-1, keepdims=True)
    diverge = (vec / np.maximum(norm, 1e-9)).astype(np.float32)[None]
    s_div = np.asarray(anti_center_map(jnp.asarray(diverge)))
    s_sink = np.asarray(anti_center_map(jnp.asarray(-diverge)))
    assert s_div[0, 16, 16] < -0.95
    assert s_sink[0, 16, 16] > 0.95


def test_union_and_singularity_pipeline_shapes():
    rng = np.random.RandomState(2)
    sdf = rng.randn(3, 64, 64).astype(np.float32)
    fields = rng.randn(3, 64, 64, 2).astype(np.float32)
    union = union_binary_mask(jnp.asarray(sdf), jnp.asarray(fields))
    assert union.shape == (3, 64, 64)
    scores, argmax_yx, u2 = center_singularity_scores(jnp.asarray(sdf), jnp.asarray(fields))
    assert scores.shape == (3,)
    assert argmax_yx.shape == (3, 2)
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(union))
    # argmax within the interior (border=10 zeroed)
    am = np.asarray(argmax_yx)
    pos = np.asarray(scores) > 0
    assert np.all(am[pos] >= 10) and np.all(am[pos] < 54)


def test_connected_components_match_scipy():
    rng = np.random.RandomState(3)
    for seed in range(5):
        mask = (np.random.RandomState(seed).rand(48, 48) > 0.6).astype(np.int32)
        boxes, valid, count = connected_component_boxes(jnp.asarray(mask), max_components=64)
        labeled, n = ndimage.label(mask, structure=np.ones((3, 3), int))
        assert int(count) == n
        got = sorted(np.asarray(boxes)[np.asarray(valid)].tolist())
        want = []
        for sl in ndimage.find_objects(labeled):
            ys, xs = sl
            want.append([float(xs.start), float(ys.start), float(xs.stop), float(ys.stop)])
        assert got == sorted(want)


def _numpy_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        iou = np.asarray(pairwise_iou(jnp.asarray(boxes[i : i + 1]), jnp.asarray(boxes)))[0]
        suppressed |= iou > thresh
        suppressed[i] = True
    return sorted(keep)


def test_nms_matches_greedy_reference():
    rng = np.random.RandomState(4)
    n = 60
    xy = rng.rand(n, 2) * 80
    wh = rng.rand(n, 2) * 40 + 4
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5))
    assert sorted(np.nonzero(keep)[0].tolist()) == _numpy_nms(boxes, scores, 0.5)


def test_nms_frontier_rounds_match_greedy_with_ties_and_padding():
    # the frontier-confirmation algorithm must reach the exact greedy
    # fixpoint regardless of suppression-chain shape, score ties
    # (index-order tie-break) and invalid padding slots
    rng = np.random.RandomState(11)
    for trial in range(12):
        n = int(rng.choice([16, 64, 257]))
        xy = rng.rand(n, 2) * 80
        wh = rng.rand(n, 2) * 40 + 2
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        if trial % 3 == 0:
            scores = np.round(scores, 1)  # force ties
        valid = rng.rand(n) > 0.2
        thr = float(rng.choice([0.3, 0.5, 0.65]))
        want = set(_numpy_nms(boxes, np.where(valid, scores, -1e9), thr))
        want = {i for i in want if valid[i]}
        got = np.asarray(
            nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thr)
        )
        assert set(np.nonzero(got)[0].tolist()) == want, trial


def test_nms_respects_validity_and_padding():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 0, 0]], np.float32)
    scores = np.array([0.9, 0.8, 0.7, 10.0], np.float32)
    valid = np.array([True, True, True, False])
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5))
    assert keep.tolist() == [True, False, True, False]

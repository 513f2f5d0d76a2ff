"""C++ native ops vs the pure-Python/scipy references."""

import numpy as np
import pytest
from scipy import ndimage

from unmore_tpu import native
from unmore_tpu.utils import rle as pyrle


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.build(), "native library must compile with the in-image g++"
    assert native.available()


@pytest.mark.parametrize("seed", range(6))
def test_rle_codec_matches_python(seed):
    rng = np.random.RandomState(seed)
    h, w = rng.randint(1, 120, 2)
    mask = (rng.rand(h, w) > rng.rand()).astype(np.uint8)
    enc_c = native.encode(mask)
    enc_py = pyrle.encode(mask)
    assert enc_c == enc_py  # byte-identical counts strings
    np.testing.assert_array_equal(native.decode(enc_c), mask)
    np.testing.assert_array_equal(pyrle.decode(enc_c), mask)


def test_mask_iou_matches_python():
    rng = np.random.RandomState(1)
    rles_a = [pyrle.encode((rng.rand(40, 40) > 0.5).astype(np.uint8)) for _ in range(3)]
    rles_b = [pyrle.encode((rng.rand(40, 40) > 0.5).astype(np.uint8)) for _ in range(2)]
    got = native.mask_iou(rles_a, rles_b, iscrowd=[0, 1])
    want = pyrle.iou(rles_a, rles_b, iscrowd=[0, 1])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_edt_matches_scipy_exact():
    rng = np.random.RandomState(2)
    mask = (rng.rand(50, 70) > 0.3).astype(np.uint8)
    got = native.edt_l2(mask)
    want = ndimage.distance_transform_edt(mask)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_connected_components_match_scipy():
    for seed in range(4):
        mask = (np.random.RandomState(seed).rand(60, 60) > 0.55).astype(np.uint8)
        labels, n = native.connected_components(mask)
        want_labels, want_n = ndimage.label(mask, structure=np.ones((3, 3), int))
        assert n == want_n
        # same partition (label ids may differ; scan order makes them equal here)
        np.testing.assert_array_equal(labels > 0, want_labels > 0)
        np.testing.assert_array_equal(labels, want_labels)


def test_paste_stats_and_rle_match_numpy_paste():
    """The C++ paste-support kernels must be bit-identical to pasting
    with ops.image.paste_mask_into_canvas and reducing (tight box /
    area / RLE of the >0 support) — the object-scoring paste-back."""
    from unmore_tpu import native
    from unmore_tpu.ops.image import paste_mask_into_canvas
    from unmore_tpu.utils import rle as pyrle

    assert native.available()
    rng = np.random.RandomState(3)
    h, w = 97, 123
    cases = []
    for _ in range(12):
        s = int(rng.choice([16, 32, 128]))
        mask = (rng.rand(s, s) > 0.6).astype(np.uint8)
        # fractional boxes, including partially/entirely out of canvas,
        # upscaling and downscaling pastes, and degenerate boxes
        box = np.array(
            [
                rng.uniform(-20, w - 5),
                rng.uniform(-20, h - 5),
                rng.uniform(5, w + 30),
                rng.uniform(5, h + 30),
            ],
            np.float32,
        )
        box[2] = max(box[2], box[0] + rng.uniform(0, 40))
        box[3] = max(box[3], box[1] + rng.uniform(0, 40))
        cases.append((mask, box))
    cases.append((np.zeros((16, 16), np.uint8), np.array([10, 10, 60, 60], np.float32)))
    cases.append((np.ones((16, 16), np.uint8), np.array([-5, -5, 200, 200], np.float32)))
    cases.append((np.ones((16, 16), np.uint8), np.array([30, 30, 30, 30], np.float32)))  # empty

    masks = [m for m, _ in cases]
    # batched stats call (mixed sizes -> group by size like the engine does)
    for s in {m.shape[0] for m in masks}:
        sel = [i for i, m in enumerate(masks) if m.shape[0] == s]
        batch_masks = np.stack([masks[i] for i in sel])
        batch_boxes = np.stack([cases[i][1] for i in sel])
        tight, areas = native.paste_stats(batch_masks, batch_boxes, h, w)
        for k, i in enumerate(sel):
            mask, box = cases[i]
            sup = paste_mask_into_canvas(mask.astype(np.float32), box, (h, w)) > 0
            ys, xs = np.nonzero(sup)
            assert areas[k] == len(ys), (i, box)
            if len(ys):
                np.testing.assert_array_equal(
                    tight[k], [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
                )
            else:
                np.testing.assert_array_equal(tight[k], [0, 0, 0, 0])
            enc = native.paste_rle(mask, box, h, w)
            assert enc == pyrle.encode(sup.astype(np.uint8)), (i, box)


def test_paste_union_support_lemma():
    """paste(a | b) > 0 must equal (paste(a) + paste(b)) > 0: this is
    what lets scoring union the two field masks on device at crop
    resolution (reference unions AFTER pasting, object_scoring.py:
    195-228) and paste once."""
    from unmore_tpu.ops.image import paste_mask_into_canvas

    rng = np.random.RandomState(5)
    for _ in range(6):
        a = (rng.rand(32, 32) > 0.5).astype(np.uint8)
        b = (rng.rand(32, 32) > 0.5).astype(np.uint8)
        box = np.array([3.7, 1.2, 61.9, 47.4], np.float32)
        pa = paste_mask_into_canvas(a.astype(np.float32), box, (50, 70))
        pb = paste_mask_into_canvas(b.astype(np.float32), box, (50, 70))
        pu = paste_mask_into_canvas((a | b).astype(np.float32), box, (50, 70))
        np.testing.assert_array_equal((pa + pb) > 0, pu > 0)

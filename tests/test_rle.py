"""RLE codec tests: known vectors + roundtrip + geometry."""

import numpy as np
import pytest

from unmore_tpu.utils import rle


def test_known_vectors():
    # hand-derived from the COCO counts spec (maskApi.c rleToString):
    # 2x2 mask [[0,1],[1,1]] -> F-order [0,1,1,1] -> runs [1,3] -> "13"
    m = np.array([[0, 1], [1, 1]], np.uint8)
    enc = rle.encode(m)
    assert enc == {"size": [2, 2], "counts": "13"}
    # 3x3 with single pixel at (0,0): runs [0,1,8] -> "018"
    m = np.zeros((3, 3), np.uint8)
    m[0, 0] = 1
    assert rle.encode(m)["counts"] == "018"
    # all-background 2x2: runs [4] -> "4"
    assert rle.encode(np.zeros((2, 2), np.uint8))["counts"] == "4"
    # all-foreground 2x2: runs [0,4] -> "04"
    assert rle.encode(np.ones((2, 2), np.uint8))["counts"] == "04"


def test_second_order_delta_and_sign_extension():
    # runs beyond the 3rd are delta-coded against runs[i-2]; negative
    # deltas exercise the sign-extension path
    runs = np.array([5, 100, 3, 2, 300, 1], np.int64)
    s = rle.encode_counts(runs)
    np.testing.assert_array_equal(rle.decode_counts(s), runs)


@pytest.mark.parametrize("seed", range(8))
def test_roundtrip_random_masks(seed):
    rng = np.random.RandomState(seed)
    h, w = rng.randint(1, 90, 2)
    mask = (rng.rand(h, w) > rng.rand()).astype(np.uint8)
    enc = rle.encode(mask)
    dec = rle.decode(enc)
    np.testing.assert_array_equal(dec, mask)
    assert rle.area(enc) == mask.sum()


def test_bbox_and_uncompressed():
    mask = np.zeros((20, 30), np.uint8)
    mask[3:10, 5:17] = 1
    enc = rle.encode(mask)
    assert rle.to_bbox(enc) == [5.0, 3.0, 12.0, 7.0]
    # uncompressed list counts decode
    unc = {"size": [20, 30], "counts": rle.mask_to_runs(mask).tolist()}
    np.testing.assert_array_equal(rle.decode(unc), mask)


def test_iou_including_crowd():
    a = np.zeros((10, 10), np.uint8)
    a[0:5, 0:10] = 1  # 50 px
    b = np.zeros((10, 10), np.uint8)
    b[0:10, 0:5] = 1  # 50 px, intersection 25
    ra, rb = rle.encode(a), rle.encode(b)
    m = rle.iou([ra], [rb])
    assert abs(m[0, 0] - 25 / 75) < 1e-9
    m = rle.iou([ra], [rb], iscrowd=[1])
    assert abs(m[0, 0] - 25 / 50) < 1e-9

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

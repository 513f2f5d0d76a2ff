"""Parity tests for resampling ops against torch (the reference's substrate)."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from unmore_tpu.ops.image import (
    crop_and_resize,
    image_gradients,
    paste_mask_into_canvas,
    resize_bilinear,
    resize_nearest,
)


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


@pytest.mark.parametrize("in_hw,out_hw", [((17, 23), (128, 128)), ((64, 64), (32, 48)), ((5, 5), (10, 10)), ((400, 300), (128, 128))])
def test_resize_bilinear_matches_torch_interpolate(in_hw, out_hw):
    x = _rand(2, *in_hw, 3)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=False))
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="bilinear", align_corners=False)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (16, 16)), ((7, 9), (14, 18)), ((4, 4), (8, 8))])
def test_resize_bilinear_align_corners_matches_torch(in_hw, out_hw):
    x = _rand(1, *in_hw, 4, seed=1)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=True))
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_nearest_matches_torch():
    x = _rand(1, 13, 7, 1, seed=2)
    got = np.asarray(resize_nearest(jnp.asarray(x), (128, 128)))
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(128, 128), mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want)


def test_image_gradients_matches_forward_difference():
    # torchmetrics.image_gradients: dy = x[i+1]-x[i] (last row 0), dx likewise
    x = _rand(2, 6, 7, seed=3)
    dy, dx = image_gradients(jnp.asarray(x))
    want_dy = np.zeros_like(x)
    want_dy[:, :-1] = x[:, 1:] - x[:, :-1]
    want_dx = np.zeros_like(x)
    want_dx[:, :, :-1] = x[:, :, 1:] - x[:, :, :-1]
    np.testing.assert_allclose(np.asarray(dy), want_dy, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx), want_dx, atol=1e-6)


def test_crop_and_resize_matches_torch_crop_then_interpolate():
    # the reference floors/ceils the box then Resize((128,128), BILINEAR)
    img = _rand(57, 83, 3, seed=4)
    boxes = np.array(
        [
            [3.2, 5.9, 40.1, 30.0],
            [0.0, 0.0, 83.0, 57.0],
            [10.0, 10.0, 11.0, 11.0],  # tiny box
            [70.5, 40.2, 83.0, 57.0],
        ],
        dtype=np.float32,
    )
    got = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), out_size=32, chunk=3))
    t = torch.from_numpy(img).permute(2, 0, 1)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        x1, y1 = int(np.floor(x1)), int(np.floor(y1))
        x2, y2 = int(np.ceil(x2)), int(np.ceil(y2))
        crop = t[:, y1:y2, x1:x2]
        want = (
            F.interpolate(crop[None], size=(32, 32), mode="bilinear", align_corners=False)[0]
            .permute(1, 2, 0)
            .numpy()
        )
        np.testing.assert_allclose(got[i], want, atol=1e-5, err_msg=f"box {i}")


def test_paste_mask_into_canvas_matches_torch():
    mask = (_rand(16, 16, seed=5) > 0.5).astype(np.float32)
    box = np.array([3.4, 2.1, 20.0, 25.7])
    got = paste_mask_into_canvas(mask, box, (40, 30))
    x1, y1 = int(np.floor(box[0])), int(np.floor(box[1]))
    x2, y2 = int(np.ceil(box[2])), int(np.ceil(box[3]))
    want = np.zeros((40, 30), np.float32)
    want[y1:y2, x1:x2] = (
        F.interpolate(torch.from_numpy(mask)[None, None], size=(y2 - y1, x2 - x1), mode="bilinear", align_corners=False)[0, 0]
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)

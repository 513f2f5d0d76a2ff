"""TPU-native image resampling primitives.

Design notes
------------
Bilinear resize is expressed as two dense matmuls (``Wy @ x @ Wx^T``)
instead of a gather: on TPU the MXU executes dense matmuls at full
throughput while scattered gathers are lowered to slow dynamic-slice
loops. For the sizes this framework runs at (crops of 128x128, feature
maps <= 640) the interpolation-weight matrices are tiny and XLA keeps
them in VMEM.

Semantics match the PyTorch stack the reference pipeline was built on
(so converted checkpoints produce identical fields):

* ``align_corners=False`` reproduces ``torch.nn.functional.interpolate``
  / ``torchvision.transforms.Resize`` (half-pixel convention), used for
  all image/crop resizes (reference ``object_reasoning.py:319,407,505``,
  ``datasets.py:99-104``).
* ``align_corners=True`` reproduces the DPT fusion-block upsampling
  (reference ``models/dpt/blocks.py:377-379``, ``models.py:71``).
* ``image_gradients`` reproduces ``torchmetrics.functional.image_gradients``
  (forward differences, zero last row/col), used by the SDF gradient
  loss (``train_objectness_net.py:235-248``) and boundary-step
  computation (``object_reasoning.py:146-150``).
* ``crop_and_resize`` reproduces the reference crop protocol: integer
  floor/ceil box bounds, then a bilinear half-pixel resize of the crop
  to a square output (``object_reasoning.py:314-321``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_weight_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out_size, in_size] interpolation matrix (two taps per row)."""
    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = out_idx * (in_size - 1) / (out_size - 1)
    else:
        src = (out_idx + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    w = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    w[rows, lo] += (1.0 - frac).astype(np.float32)
    w[rows, hi] += frac.astype(np.float32)
    return w


def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    # torch 'nearest' convention: floor(dst * in/out)
    idx = np.floor(np.arange(out_size, dtype=np.float64) * (in_size / out_size))
    return np.clip(idx, 0, in_size - 1).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("out_hw", "align_corners"))
def resize_bilinear(x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False) -> jax.Array:
    """Bilinear resize over the trailing (H, W, C) dims of ``x``.

    x: [..., H, W, C]. Returns [..., out_h, out_w, C] in x.dtype's
    promotion with float32 weights.
    """
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    wy = jnp.asarray(_bilinear_weight_matrix(h, out_h, align_corners))
    wx = jnp.asarray(_bilinear_weight_matrix(w, out_w, align_corners))
    # [..., H, W, C] -> [..., out_h, W, C]. Full f32 precision: the
    # default matmul precision on this JAX build is bf16-like, which
    # visibly distorts resampled images.
    y = jnp.einsum(
        "oh,...hwc->...owc", wy, x,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    y = jnp.einsum(
        "pw,...owc->...opc", wx, y,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return y.astype(jnp.promote_types(x.dtype, jnp.float32))


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize over trailing (H, W, C) dims (torch 'nearest')."""
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    iy = jnp.asarray(_nearest_index(h, out_h))
    ix = jnp.asarray(_nearest_index(w, out_w))
    y = jnp.take(x, iy, axis=-3)
    y = jnp.take(y, ix, axis=-2)
    return y


def image_gradients(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Forward-difference gradients matching torchmetrics.image_gradients.

    x: [..., H, W]. Returns (dy, dx), each [..., H, W], with the last
    row of dy and last column of dx set to zero.
    """
    dy = jnp.concatenate(
        [x[..., 1:, :] - x[..., :-1, :], jnp.zeros_like(x[..., :1, :])], axis=-2
    )
    dx = jnp.concatenate(
        [x[..., :, 1:] - x[..., :, :-1], jnp.zeros_like(x[..., :, :1])], axis=-1
    )
    return dy, dx


def _crop_sample_coords(lo: jax.Array, hi: jax.Array, out_size: int, limit: int):
    """Half-pixel sample positions for resizing crop [lo, hi) to out_size.

    lo/hi: [...] float arrays holding the *integer* crop bounds (already
    floored/ceiled). Returns (i0, i1, frac): two taps + lerp weight, all
    shaped [..., out_size], clamped inside the crop and the image.
    """
    size = jnp.maximum(hi - lo, 1.0)  # [...]
    j = jnp.arange(out_size, dtype=jnp.float32)  # [S]
    src = (j + 0.5) * (size[..., None] / out_size) - 0.5  # [..., S]
    src = jnp.clip(src, 0.0, size[..., None] - 1.0)
    i0f = jnp.floor(src)
    frac = src - i0f
    i0 = i0f.astype(jnp.int32) + lo[..., None].astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, (hi[..., None] - 1.0).astype(jnp.int32))
    i0 = jnp.clip(i0, 0, limit - 1)
    i1 = jnp.clip(i1, 0, limit - 1)
    return i0, i1, frac


@functools.partial(jax.jit, static_argnames=("out_size", "chunk"))
def crop_and_resize(
    image: jax.Array,
    boxes: jax.Array,
    out_size: int = 128,
    chunk: int = 64,
    image_idx: jax.Array | None = None,
) -> jax.Array:
    """Crop ``boxes`` from ``image`` and bilinearly resize each to a square.

    Reproduces the reference protocol (``object_reasoning.py:314-321``):
    ``x1,y1 = floor``, ``x2,y2 = ceil``, then ``Resize((S,S), BILINEAR)``
    of the crop (half-pixel convention, no antialias).

    image: [H, W, C] float, or [B, H, W, C] with ``image_idx`` [P] int32
        selecting each box's source image (multi-image discovery).
    boxes: [P, 4] float xyxy in image coordinates.
    Returns [P, S, S, C] float32.

    The gather is separable (rows then columns) and processed in chunks
    of ``chunk`` boxes to bound the [chunk, S, W, C] intermediate.
    """
    batched = image.ndim == 4
    H, W, C = image.shape[-3:]
    P = boxes.shape[0]
    S = out_size

    x1 = jnp.floor(boxes[:, 0])
    y1 = jnp.floor(boxes[:, 1])
    x2 = jnp.ceil(boxes[:, 2])
    y2 = jnp.ceil(boxes[:, 3])

    iy0, iy1, fy = _crop_sample_coords(y1, y2, S, H)  # [P, S]
    ix0, ix1, fx = _crop_sample_coords(x1, x2, S, W)  # [P, S]
    if batched:
        if image_idx is None:
            raise ValueError("image_idx required for batched images")
        idx = jnp.clip(image_idx.astype(jnp.int32), 0, image.shape[0] - 1)
    else:
        idx = jnp.zeros((P,), jnp.int32)
        image = image[None]

    pad = (-P) % chunk
    if pad:
        def _pad(a):
            return jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        iy0, iy1, fy, ix0, ix1, fx, idx = map(_pad, (iy0, iy1, fy, ix0, ix1, fx, idx))
    n_chunks = (P + pad) // chunk

    def _one_chunk(_, args):
        cy0, cy1, cfy, cx0, cx1, cfx, cidx = args
        # rows: [chunk, S, W, C] gathered from each box's source image
        r0 = image[cidx[:, None], cy0]  # advanced indexing == gather
        r1 = image[cidx[:, None], cy1]
        rows = r0 + (r1 - r0) * cfy[..., None, None]
        # cols: [chunk, S, S, C]
        c0 = jnp.take_along_axis(rows, cx0[:, None, :, None], axis=2)
        c1 = jnp.take_along_axis(rows, cx1[:, None, :, None], axis=2)
        out = c0 + (c1 - c0) * cfx[:, None, :, None]
        return _, out.astype(jnp.float32)

    def _reshape(a):
        return a.reshape(n_chunks, chunk, *a.shape[1:])

    _, out = jax.lax.scan(
        _one_chunk,
        None,
        tuple(_reshape(a) for a in (iy0, iy1, fy, ix0, ix1, fx, idx)),
    )
    out = out.reshape(n_chunks * chunk, S, S, C)
    return out[:P]


def paste_mask_into_canvas(
    mask: np.ndarray, box: np.ndarray, canvas_hw: tuple[int, int]
) -> np.ndarray:
    """Host-side paste-back of a crop-space mask into a full-image canvas.

    Reproduces ``object_scoring.py:195-228``: the [s, s] float mask is
    bilinearly resized to the integer box extent and written at
    (y1:y2, x1:x2); everything outside stays zero.
    """
    Hc, Wc = canvas_hw
    x1, y1 = int(np.floor(box[0])), int(np.floor(box[1]))
    x2, y2 = int(np.ceil(box[2])), int(np.ceil(box[3]))
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(x2, Wc), min(y2, Hc)
    canvas = np.zeros((Hc, Wc), dtype=np.float32)
    bh, bw = y2 - y1, x2 - x1
    if bh <= 0 or bw <= 0:
        return canvas
    wy = _bilinear_weight_matrix(mask.shape[0], bh, align_corners=False)
    wx = _bilinear_weight_matrix(mask.shape[1], bw, align_corners=False)
    canvas[y1:y2, x1:x2] = wy @ mask.astype(np.float32) @ wx.T
    return canvas

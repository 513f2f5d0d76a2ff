"""Field-decoding ops for center-boundary reasoning.

These are the per-crop decode primitives of stage 2, expressed as
batched XLA ops (convolutions and elementwise math on [B, H, W] maps)
so the whole decode chain fuses on TPU. Reference semantics:

* ``batch_erode``: 9x9 ones-kernel erosion, 3 rounds
  (reference ``utils/misc.py:10-20``).
* ``anti_center_map``: 5x5 inward-unit-vector correlation of the
  predicted center field, divided by (k^2-1)
  (reference ``object_reasoning.py:360-377``). The reference computes
  this in float64; we use float32, which changes scores by <1e-6 —
  far below the 0.009 decision threshold.
* ``union_binary_mask`` and ``center_singularity_scores``: the decode
  chain of ``center_reasoning`` (reference ``object_reasoning.py:525-539``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _conv2d_same(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """x: [B, H, W, Cin], kernel: [kh, kw, Cin, Cout] -> [B, H, W, Cout].

    precision is pinned to float32: this JAX build's default matmul/conv
    precision is bf16-like even on CPU, and these convolutions feed hard
    decision thresholds (0.009 singularity, >=k*k erosion counts).
    """
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def batch_erode(masks: jax.Array, kernel_size: int = 9, num_rounds: int = 3) -> jax.Array:
    """Binary erosion: a pixel survives iff its full kxk window is set.

    masks: [B, H, W] (0/1). Returns [B, H, W] int32.
    """
    k = kernel_size
    kernel = jnp.ones((k, k, 1, 1), jnp.float32)
    out = masks.astype(jnp.float32)[..., None]
    for _ in range(num_rounds):
        summed = _conv2d_same(out, kernel)
        out = (summed >= k * k).astype(jnp.float32)
    return out[..., 0].astype(jnp.int32)


def _anti_center_kernel(kernel_size: int) -> np.ndarray:
    """[k, k, 2, 1] kernel of unit vectors pointing toward the kernel center.

    Tap (i, j) holds normalize([c - i, c - j]) with channel 0 = row (dy)
    and channel 1 = col (dx), matching the center-field channel order
    produced by GT synthesis (reference ``datasets.py:200-213``).
    """
    k = kernel_size
    c = k // 2
    ii, jj = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
    vec = np.stack([c - ii, c - jj], axis=-1).astype(np.float64)  # [k, k, 2]
    norm = np.linalg.norm(vec, axis=-1, keepdims=True)
    vec = vec / np.maximum(norm, 1e-12)
    return vec[..., None].astype(np.float32)  # [k, k, 2, 1]


def anti_center_map(center_fields: jax.Array, kernel_size: int = 5) -> jax.Array:
    """Score map of center-field sinks (evidence of multiple objects).

    center_fields: [B, H, W, 2] with channels (dy, dx). Returns
    [B, H, W] float32 in [-1, 1]: +1 where the field converges from all
    sides (the seam between two objects), -1 at true object centers.
    """
    kernel = jnp.asarray(_anti_center_kernel(kernel_size))
    scores = _conv2d_same(center_fields.astype(jnp.float32), kernel)[..., 0]
    return scores / float(kernel_size**2 - 1)


def union_binary_mask(sdf_maps: jax.Array, center_fields: jax.Array) -> jax.Array:
    """Foreground union: (sigmoid(sdf) > .5) | (||center field|| > .5).

    sdf_maps: [B, H, W]; center_fields: [B, H, W, 2]. Returns int32 [B, H, W].
    """
    sdf_fg = jax.nn.sigmoid(sdf_maps) > 0.5
    center_norm = jnp.linalg.norm(center_fields, axis=-1)
    return jnp.logical_or(sdf_fg, center_norm > 0.5).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("border", "erode_kernel", "erode_rounds", "anti_kernel"))
def center_singularity_scores(
    sdf_maps: jax.Array,
    center_fields: jax.Array,
    border: int = 10,
    erode_kernel: int = 9,
    erode_rounds: int = 3,
    anti_kernel: int = 5,
):
    """Full center-reasoning decode chain.

    Returns (max_scores [B], argmax_yx [B, 2], union_masks [B, H, W]):
    the per-crop max anti-center score inside the eroded foreground
    (10-px border zeroed), its location, and the raw union mask (the CC
    analysis consumes it). Mirrors reference ``object_reasoning.py:525-550``.
    """
    B, H, W = sdf_maps.shape
    union = union_binary_mask(sdf_maps, center_fields)
    eroded = batch_erode(union, erode_kernel, erode_rounds)
    scores = anti_center_map(center_fields, anti_kernel) * eroded.astype(jnp.float32)
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    interior = (
        (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    )
    scores = jnp.where(interior, scores, 0.0)
    flat = scores.reshape(B, -1)
    max_scores = jnp.max(flat, axis=1)
    argmax = jnp.argmax(flat, axis=1)
    argmax_yx = jnp.stack([argmax // W, argmax % W], axis=-1)
    return max_scores, argmax_yx, union

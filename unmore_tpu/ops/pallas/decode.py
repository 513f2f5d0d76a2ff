"""Fused Pallas kernel for the center-reasoning decode chain.

The XLA path (:func:`unmore_tpu.ops.fields.center_singularity_scores`)
runs the chain as separate HBM-bound ops: sigmoid/threshold/union ->
9x9 erosion x3 (conv) -> 5x5 anti-center correlation -> border zero ->
max/argmax, materializing several [B, 128, 128] intermediates. This
kernel keeps one crop's fields resident in VMEM (a 128^2 f32 map is
64 KiB) and does everything in a single pass:

* erosion as separable min-pools (an all-ones-window erosion IS a min
  filter): 2 x 9 shifted minima per round instead of an 81-tap conv;
* anti-center as 48 shifted multiply-accumulates on the VPU (the
  kernel's two zero taps are skipped);
* first-occurrence argmax matching ``jnp.argmax`` semantics.

Grid = one program per crop. Outputs: singularity score, flat argmax
index, and the union mask (consumed by the CC analysis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unmore_tpu.ops.fields import _anti_center_kernel


def _decode_kernel(sdf_ref, center_ref, stats_ref, union_ref,
                   *, size: int, border: int, erode_k: int, erode_rounds: int,
                   anti_k: int, anti_weights: np.ndarray):
    S = size
    sdf = sdf_ref[0]  # [S, S]
    cy = center_ref[0, :, :, 0]
    cx = center_ref[0, :, :, 1]

    # union mask: sigmoid(sdf) > .5  <=>  sdf > 0 ; ||center|| > .5
    union = jnp.logical_or(sdf > 0.0, cy * cy + cx * cx > 0.25).astype(jnp.float32)
    union_ref[0] = union.astype(jnp.int32)

    # erosion: separable min filter with zero padding, repeated.
    # All shifts are static concatenate+slice (Mosaic has no
    # dynamic_update_slice and needs no dynamism here).
    half = erode_k // 2

    def _pad_cols(a, k):
        z = jnp.zeros((S, k), jnp.float32)
        return jnp.concatenate([z, a, z], axis=1)

    def _pad_rows(a, k):
        z = jnp.zeros((k, S), jnp.float32)
        return jnp.concatenate([z, a, z], axis=0)

    eroded = union
    for _ in range(erode_rounds):
        padded = _pad_cols(eroded, half)
        m = padded[:, 0:S]
        for d in range(1, erode_k):
            m = jnp.minimum(m, padded[:, d : d + S])
        padded = _pad_rows(m, half)
        m = padded[0:S, :]
        for d in range(1, erode_k):
            m = jnp.minimum(m, padded[d : d + S, :])
        eroded = m

    # anti-center correlation: shifted MACs with zero padding
    ah = anti_k // 2

    def _pad_both(a):
        row = jnp.zeros((ah, S + 2 * ah), jnp.float32)
        col = jnp.zeros((S, ah), jnp.float32)
        mid = jnp.concatenate([col, a, col], axis=1)
        return jnp.concatenate([row, mid, row], axis=0)

    pad_cy = _pad_both(cy)
    pad_cx = _pad_both(cx)
    acc = jnp.zeros((S, S), jnp.float32)
    for i in range(anti_k):
        for j in range(anti_k):
            wy, wx = anti_weights[i, j]
            if wy == 0.0 and wx == 0.0:
                continue
            ty = pad_cy[i : i + S, j : j + S]
            tx = pad_cx[i : i + S, j : j + S]
            acc = acc + wy * ty + wx * tx
    scores = acc / float(anti_k * anti_k - 1) * eroded

    rows = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    interior = (
        (rows >= border) & (rows < S - border) & (cols >= border) & (cols < S - border)
    )
    scores = jnp.where(interior, scores, 0.0)

    gmax = jnp.max(scores)
    flat = jnp.where(scores == gmax, rows * S + cols, S * S)
    # stats packed into one (8, 128) tile (Mosaic block-shape minimum):
    # [0, 0] = max score, [0, 1] = first-occurrence flat argmax as f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
    tile = jnp.where(row0 & (lane == 0), gmax, 0.0)
    tile = jnp.where(row0 & (lane == 1), jnp.min(flat).astype(jnp.float32), tile)
    stats_ref[0] = tile


@functools.partial(
    jax.jit, static_argnames=("border", "erode_k", "erode_rounds", "anti_k", "interpret")
)
def fused_center_decode(
    sdf_maps: jax.Array,
    center_fields: jax.Array,
    border: int = 10,
    erode_k: int = 9,
    erode_rounds: int = 3,
    anti_k: int = 5,
    interpret: bool = False,
):
    """Pallas-fused equivalent of ``center_singularity_scores``.

    sdf_maps [B, S, S]; center_fields [B, S, S, 2] (dy, dx).
    Returns (max_scores [B], argmax_yx [B, 2], union [B, S, S] int32).
    """
    B, S, _ = sdf_maps.shape
    # anti_weights[i, j] = (wy, wx) tap weights of the inward-unit kernel
    anti_weights = _anti_center_kernel(anti_k)[..., 0]  # [k, k, 2]

    kernel = functools.partial(
        _decode_kernel,
        size=S, border=border, erode_k=erode_k, erode_rounds=erode_rounds,
        anti_k=anti_k, anti_weights=anti_weights,
    )
    stats, union = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, S, 2), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, S, S), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(sdf_maps.astype(jnp.float32), center_fields.astype(jnp.float32))
    sing = stats[:, 0, 0]
    argmax_flat = stats[:, 0, 1].astype(jnp.int32)
    argmax_yx = jnp.stack([argmax_flat // S, argmax_flat % S], axis=-1)
    return sing, argmax_yx, union

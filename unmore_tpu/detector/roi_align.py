"""ROIAlign over FPN levels as pure XLA gathers.

Replaces the torchvision/detectron2 C++/CUDA ``roi_align`` used by the
reference ROI pooler (``cad/modeling/roi_heads/roi_heads.py:426-431``).
Semantics follow detectron2 ROIAlignV2 (aligned=True): half-pixel
continuous coordinates, mean over bin sample points. Sampling ratio is
fixed at 2x2 per bin (detectron2's default "0" adapts the count per
box, which is shape-dynamic; 2 is its value for typical box sizes and
keeps the op jit-able — deviation documented).

Level routing follows the canonical FPN rule
level = floor(4 + log2(sqrt(area)/224)) clamped to [2, 5]; the aligned
output is computed against every level and selected per box, trading a
4x gather (cheap, bandwidth-bound on small crops) for static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

FPN_STRIDES = {"P2": 4, "P3": 8, "P4": 16, "P5": 32}


def _bilinear_sample(feat: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """feat [H, W, C]; ys/xs [N, S] continuous coords. -> [N, S, C].

    Out-of-bounds samples contribute zero (torchvision roi_align
    zero-pads outside the feature map).
    """
    H, W, C = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    out = 0.0
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            yi = y0.astype(jnp.int32) + dy
            xi = x0.astype(jnp.int32) + dx
            inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            vals = feat[yc, xc]  # [N, S, C]
            # accumulate in the feature dtype: f32 promotion here doubles
            # the dominant HBM temporary of the detector train step
            # ([B*P*samples, C] — 3 GB at batch 8) for no accuracy gain
            # the downstream bf16 convs could use
            out = out + vals * (wy * wx * inb)[..., None].astype(feat.dtype)
    return out


def _sample_grid(boxes: jax.Array, stride, out_size: int, sy: int, sx: int):
    """aligned=True sample coordinates over each box, in feature coords.

    boxes [N, 4] xyxy (image coords); stride: scalar or per-box [N]
    array. Returns (ys_g, xs_g), each [N, Sy*Sx] with the half-pixel
    offset applied.
    """
    N = boxes.shape[0]
    Sy, Sx = out_size * sy, out_size * sx
    x1 = boxes[:, 0] / stride - 0.5
    y1 = boxes[:, 1] / stride - 0.5
    bw = jnp.maximum(boxes[:, 2] / stride - 0.5 - x1, 1e-6)
    bh = jnp.maximum(boxes[:, 3] / stride - 0.5 - y1, 1e-6)
    grid_y = (jnp.arange(Sy, dtype=jnp.float32) + 0.5) / Sy
    grid_x = (jnp.arange(Sx, dtype=jnp.float32) + 0.5) / Sx
    ys = y1[:, None] + grid_y[None, :] * bh[:, None]  # [N, Sy]
    xs = x1[:, None] + grid_x[None, :] * bw[:, None]  # [N, Sx]
    ys_g = jnp.broadcast_to(ys[:, :, None], (N, Sy, Sx)).reshape(N, Sy * Sx)
    xs_g = jnp.broadcast_to(xs[:, None, :], (N, Sy, Sx)).reshape(N, Sy * Sx)
    return ys_g, xs_g


def _bin_average(vals: jax.Array, out_size: int, sy: int, sx: int) -> jax.Array:
    """Per-bin mean of [N, Sy*Sx, C] samples -> [N, out, out, C].

    Expressed as a tiny averaging matmul: a 6-D
    [N, out, sy, out, sx, C] reshape forces a pathological TPU tiling
    (73x pad expansion at sy=sx=2) and keeps huge temporaries live.
    """
    Sy, Sx = out_size * sy, out_size * sx
    avg = np.zeros((out_size * out_size, Sy * Sx), np.float32)
    for oy in range(out_size):
        for ox in range(out_size):
            for a in range(sy):
                for b_ in range(sx):
                    avg[oy * out_size + ox, (oy * sy + a) * Sx + ox * sx + b_] = 1.0 / (sy * sx)
    pooled = jnp.einsum(
        "os,nsc->noc", jnp.asarray(avg), vals, preferred_element_type=jnp.float32
    )
    N, C = vals.shape[0], vals.shape[-1]
    return pooled.reshape(N, out_size, out_size, C)


def roi_align_level(feat: jax.Array, boxes: jax.Array, stride: int, out_size: int,
                    sampling: int = 2, sampling_x: int | None = None) -> jax.Array:
    """feat [H, W, C] (one level, one image); boxes [N, 4] xyxy in image
    coords -> [N, out_size, out_size, C]. ``sampling``/``sampling_x``
    are the per-bin sample counts along y/x."""
    sy = sampling
    sx = sampling if sampling_x is None else sampling_x
    ys_g, xs_g = _sample_grid(boxes, stride, out_size, sy, sx)
    vals = _bilinear_sample(feat, ys_g, xs_g)  # [N, Sy*Sx, C]
    return _bin_average(vals, out_size, sy, sx)


def roi_align_level_adaptive(feat: jax.Array, boxes: jax.Array, stride: int,
                             out_size: int, max_ratio: int = 4) -> jax.Array:
    """Exact detectron2 ``sampling_ratio=0`` semantics, jit-able.

    d2 adapts the per-bin sample count per ROI and per axis:
    ``grid_h = ceil(roi_h / out_size)``, ``grid_w = ceil(roi_w / out_size)``
    (ROIAlign_forward kernel). That count is shape-dynamic, so we compute
    the pooled output for every (ry, rx) in [1, max_ratio]^2 and select
    per box — static shapes, exact for every ROI whose true ratio is
    <= max_ratio (larger ones clamp; at FPN-banded ROI sizes the true
    ratio is in {1, 2} for all but full-image boxes)."""
    y_ratio = jnp.ceil(jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6) / stride / out_size)
    x_ratio = jnp.ceil(jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6) / stride / out_size)
    y_ratio = jnp.clip(y_ratio, 1, max_ratio).astype(jnp.int32)
    x_ratio = jnp.clip(x_ratio, 1, max_ratio).astype(jnp.int32)
    out = None
    for ry in range(1, max_ratio + 1):
        for rx in range(1, max_ratio + 1):
            pooled = roi_align_level(feat, boxes, stride, out_size, ry, rx)
            sel = ((y_ratio == ry) & (x_ratio == rx))[:, None, None, None]
            out = pooled * sel if out is None else out + pooled * sel
    return out


def assign_levels(boxes: jax.Array, k_min: int = 2, k_max: int = 5) -> jax.Array:
    """Canonical FPN level per box (ints in [k_min, k_max])."""
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(jnp.maximum(area, 1e-6)) / 224 + 1e-8))
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32)


def _roi_align_flat(feats_tuple, boxes, shapes, out_size: int, sy: int, sx: int):
    """Pool each box from its assigned level only, through one flattened
    [sum(H_l*W_l), C] buffer: one 4-corner gather instead of
    pool-all-levels-and-select (4x less gather fwd + scatter bwd work).

    feats_tuple: (P2, P3, P4, P5) feature maps [H_l, W_l, C];
    shapes: static ((H,W), ...) matching feats_tuple.
    """
    C = feats_tuple[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, C) for f in feats_tuple], axis=0)
    sizes = np.array([h * w for h, w in shapes], np.int64)
    offsets = jnp.asarray(np.concatenate([[0], np.cumsum(sizes)[:-1]]), jnp.int32)
    Hs = jnp.asarray([h for h, _ in shapes], jnp.int32)
    Ws = jnp.asarray([w for _, w in shapes], jnp.int32)

    lvl = assign_levels(boxes) - 2  # [N] in [0, 3]
    stride = (4.0 * 2.0 ** lvl.astype(jnp.float32))  # [N]
    H_b, W_b = Hs[lvl], Ws[lvl]  # [N]
    off_b = offsets[lvl]  # [N]

    ys_g, xs_g = _sample_grid(boxes, stride, out_size, sy, sx)

    y0 = jnp.floor(ys_g)
    x0 = jnp.floor(xs_g)
    wy1 = ys_g - y0
    wx1 = xs_g - x0
    out = 0.0
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            yi = y0.astype(jnp.int32) + dy
            xi = x0.astype(jnp.int32) + dx
            inb = (
                (yi >= 0) & (yi < H_b[:, None]) & (xi >= 0) & (xi < W_b[:, None])
            )
            yc = jnp.clip(yi, 0, H_b[:, None] - 1)
            xc = jnp.clip(xi, 0, W_b[:, None] - 1)
            rows = flat[off_b[:, None] + yc * W_b[:, None] + xc]  # [N, S, C]
            # accumulate in the feature dtype (see _bilinear_sample note)
            out = out + rows * ((wy * wx) * inb)[..., None].astype(flat.dtype)

    return _bin_average(out, out_size, sy, sx)


def roi_align_fpn(features: dict, boxes: jax.Array, out_size: int,
                  sampling: int | str = 2) -> jax.Array:
    """features: {P2..P5: [H_l, W_l, C]} (single image); boxes [N, 4].

    -> [N, out_size, out_size, C], each box pooled from its FPN level.
    sampling: fixed per-bin count (pooled through one flattened
    multi-level gather), or "adaptive" for exact d2 sampling_ratio=0
    semantics (16 pooled variants per level — quantification/eval use;
    see scripts/roi_align_ab.py).
    """
    if sampling == "adaptive":
        levels = assign_levels(boxes)
        # checkpoint the per-level gathers: all pooled variants would
        # otherwise stay live as backward residuals of the level select
        level_fn = jax.checkpoint(roi_align_level_adaptive, static_argnums=(2, 3, 4))
        out = None
        for name, stride in FPN_STRIDES.items():
            lvl = int(name[1])
            pooled = level_fn(features[name], boxes, stride, out_size, 4)
            sel = (levels == lvl)[:, None, None, None]
            out = pooled * sel if out is None else out + pooled * sel
        return out

    names = ("P2", "P3", "P4", "P5")
    shapes = tuple(features[n].shape[:2] for n in names)
    # checkpoint: recompute the gather in the backward pass instead of
    # keeping the [N, S, C] sample tensor live as a residual
    flat_fn = jax.checkpoint(_roi_align_flat, static_argnums=(2, 3, 4, 5))
    return flat_fn(
        tuple(features[n] for n in names), boxes, shapes, out_size, sampling, sampling
    )

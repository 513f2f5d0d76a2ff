"""Diagnostic visualizations for stage-1 training.

Lightweight cv2 replacement for the reference's matplotlib/seaborn dump
(``train_objectness_net.py:320-507``, ~20 images per sample every
``visualize_every`` iters): center fields as HSV direction wheels, SDF
maps as signed colormaps, masks and anti-center heatmaps as grayscale.
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def center_field_to_rgb(field: np.ndarray) -> np.ndarray:
    """[H, W, 2] (dy, dx) -> HSV direction wheel (hue=angle, sat=norm)."""
    dy, dx = field[..., 0], field[..., 1]
    angle = (np.arctan2(dy, dx) + np.pi) / (2 * np.pi)  # [0, 1]
    norm = np.clip(np.linalg.norm(field, axis=-1), 0, 1)
    hsv = np.stack([angle * 179, norm * 255, np.full_like(norm, 255)], axis=-1).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def sdf_to_rgb(sdf: np.ndarray) -> np.ndarray:
    """[H, W] signed map -> blue-negative / red-positive colormap."""
    v = np.clip(sdf, -1, 1)
    img = np.zeros((*v.shape, 3), np.uint8)
    img[..., 2] = np.clip(v, 0, 1) * 255  # red = positive (inside)
    img[..., 0] = np.clip(-v, 0, 1) * 255  # blue = negative (outside)
    return img


def get_mask_plot_colors(nr_colors: int) -> np.ndarray:
    """nr_colors uniformly spaced hues (reference utils/vis.py:11-16 /
    vis_votecut.py:10-15), as float RGB in [0, 1]."""
    import colorsys

    return np.array(
        [colorsys.hsv_to_rgb(h, 1.0, 1.0) for h in np.linspace(0, 1, max(nr_colors, 1), endpoint=False)],
        np.float32,
    )


def vis_label_map(labels: np.ndarray) -> np.ndarray:
    """Integer instance-label map -> hue-colorized uint8 RGB (label 0 =
    black) — the reference's ``vis_GT_gray``/``vis_gray``
    (utils/vis.py:20-35, vis_votecut.py:17-30)."""
    labels = np.asarray(labels)
    ids = np.unique(labels)
    ids = ids[ids != 0]
    cmap = get_mask_plot_colors(len(ids))
    out = np.zeros((*labels.shape, 3), np.float32)
    for i, lab in enumerate(ids):
        out[labels == lab] = cmap[i]
    return (out * 255).astype(np.uint8)


def gray(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float32)
    lo, hi = m.min(), m.max()
    if hi > lo:
        m = (m - lo) / (hi - lo)
    return (m * 255).astype(np.uint8)


def dump_objectness_diagnostics(
    out_dir: str,
    tag: str,
    image: np.ndarray,
    pred_center: np.ndarray,
    pred_sdf: np.ndarray,
    gt_center: np.ndarray | None = None,
    gt_sdf: np.ndarray | None = None,
    gt_mask: np.ndarray | None = None,
):
    """Write the per-sample diagnostic panel. All inputs HWC/HW numpy."""
    os.makedirs(out_dir, exist_ok=True)

    def save(name, img):
        cv2.imwrite(os.path.join(out_dir, f"{tag}_{name}.png"), img)

    save("input", cv2.cvtColor((image * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
    save("pred_center_field", center_field_to_rgb(pred_center))
    save("pred_sdf", sdf_to_rgb(pred_sdf))
    save("pred_sdf_mask", gray(1.0 / (1.0 + np.exp(-pred_sdf)) > 0.5))
    save("pred_center_norm", gray(np.linalg.norm(pred_center, axis=-1)))
    # anti-center heatmap: the singularity-detection instrument — this
    # is the map stage-2 thresholds at center_score_max_thres=0.009, so
    # practitioners tune that threshold by eyeballing exactly this panel
    # (reference anti_center visualization, train_objectness_net.py:
    # 360-377 + the ~20-panel dump at :320-507)
    save("pred_anti_center", gray(_anti_center_np(pred_center)))
    # SDF spatial gradients (forward differences, zero last row/col —
    # the quantity the sdf_gradient_loss trains on and the boundary
    # step sizes divide by; reference :235-248 dumps both)
    dy, dx = _image_gradients_np(pred_sdf)
    save("pred_sdf_grad_dy", gray(dy))
    save("pred_sdf_grad_dx", gray(dx))
    if gt_center is not None:
        save("gt_center_field", center_field_to_rgb(gt_center))
        save("gt_anti_center", gray(_anti_center_np(gt_center)))
    if gt_sdf is not None:
        save("gt_sdf", sdf_to_rgb(gt_sdf))
        gdy, gdx = _image_gradients_np(gt_sdf)
        save("gt_sdf_grad_dy", gray(gdy))
        save("gt_sdf_grad_dx", gray(gdx))
    if gt_mask is not None:
        save("gt_mask", gray(gt_mask))
    return out_dir


def _anti_center_np(center_field: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    """Host-side anti-center map of one [H, W, 2] field — same math as
    :func:`unmore_tpu.ops.fields.anti_center_map` without pulling JAX
    into the visualization path."""
    from unmore_tpu.ops.fields import _anti_center_kernel

    k = _anti_center_kernel(kernel_size)[..., 0]  # [k, k, 2]
    pad = kernel_size // 2
    f = np.pad(
        center_field.astype(np.float32), ((pad, pad), (pad, pad), (0, 0))
    )
    h, w = center_field.shape[:2]
    out = np.zeros((h, w), np.float32)
    for iy in range(kernel_size):
        for ix in range(kernel_size):
            patch = f[iy : iy + h, ix : ix + w]
            out += patch[..., 0] * k[iy, ix, 0] + patch[..., 1] * k[iy, ix, 1]
    return out / float(kernel_size**2 - 1)


def _image_gradients_np(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Forward-difference gradients, zero last row/col (the
    torchmetrics.image_gradients convention the losses use)."""
    dy = np.zeros_like(x, dtype=np.float32)
    dx = np.zeros_like(x, dtype=np.float32)
    dy[:-1] = x[1:] - x[:-1]
    dx[:, :-1] = x[:, 1:] - x[:, :-1]
    return dy, dx

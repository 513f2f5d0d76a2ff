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
    if gt_center is not None:
        save("gt_center_field", center_field_to_rgb(gt_center))
    if gt_sdf is not None:
        save("gt_sdf", sdf_to_rgb(gt_sdf))
    if gt_mask is not None:
        save("gt_mask", gray(gt_mask))
    return out_dir

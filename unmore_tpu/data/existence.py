"""Existence-classifier training samples.

Reference ``datasets.py:259-353``: 50% "positive" samples are
RandomResizedCrops of the image (label 1 iff the cropped top-1 mask has
sum > 1); 50% "background" samples are the largest inscribed square of
the image's background region (1 - union of all VoteCut masks), found
via the EDT argmax/radius (``datasets.py:293-323``), always label 0.
"""

from __future__ import annotations

import cv2
import numpy as np

from unmore_tpu.data.votecut import random_resized_crop_params


def background_square_crop(image: np.ndarray, full_mask: np.ndarray) -> np.ndarray | None:
    """Largest inscribed background square (reference datasets.py:293-323)."""
    bg = (1 - (full_mask > 0)).astype(np.uint8)
    padded = cv2.copyMakeBorder(bg, 10, 10, 10, 10, cv2.BORDER_CONSTANT, value=0)
    d = cv2.distanceTransform(padded, cv2.DIST_L2, 3)
    d = d[10:-10, 10:-10]
    yc, xc = np.unravel_index(int(d.argmax()), d.shape)
    r = d[yc, xc]
    x1, y1, x2, y2 = int(xc - r), int(yc - r), int(xc + r), int(yc + r)
    if x2 <= max(x1, 0) or y2 <= max(y1, 0):
        return None
    crop = image[max(y1, 0) : y2, max(x1, 0) : x2]
    if crop.size == 0:
        return None
    return crop


def classifier_sample(
    image: np.ndarray,
    top1_mask: np.ndarray,
    full_mask: np.ndarray,
    image_size: int,
    rng: np.random.Generator,
) -> tuple[np.ndarray, float]:
    """Returns (crop [s,s,3], label). Coin-flips positive vs background."""
    s = image_size
    if rng.random() < 0.5:
        crop = background_square_crop(image, full_mask)
        if crop is not None:
            crop = cv2.resize(crop, (s, s), interpolation=cv2.INTER_LINEAR)
            return crop.astype(np.float32), 0.0
    h, w = image.shape[:2]
    top, left, ch, cw = random_resized_crop_params(rng, h, w)
    img_crop = cv2.resize(image[top : top + ch, left : left + cw], (s, s), interpolation=cv2.INTER_LINEAR)
    # the reference crops the *float* mask jointly and resizes bilinearly,
    # then labels on sum > 1 (datasets.py:338-346)
    mask_crop = cv2.resize(
        top1_mask[top : top + ch, left : left + cw].astype(np.float32), (s, s),
        interpolation=cv2.INTER_LINEAR,
    )
    label = 1.0 if mask_crop.sum() > 1 else 0.0
    return img_crop.astype(np.float32), label

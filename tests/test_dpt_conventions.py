"""Golden-value tests for the DPT conventions most likely to silently
diverge from the reference (docs/dpt_large_audit.md):

* ``_resize_pos_embed`` bilinear interpolation — half-pixel
  (align_corners=False) semantics of ``F.interpolate(mode="bilinear")``
  (reference ``models/dpt/vit.py:148-162``), checked against torch
  itself AND a hand-computed literal;
* the fusion-block / output x2 upsample — align_corners=True
  (``models/dpt/blocks.py:377-379``, ``models.py:70-72``);
* ``ProjectReadout`` — concat order (patch tokens first, expanded cls
  readout second) and exact-erf GELU (``vit.py:79-90``).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from unmore_tpu.models.dpt import ProjectReadout
from unmore_tpu.ops.image import resize_bilinear


def test_resize_bilinear_half_pixel_hand_computed():
    # 2x2 -> 3x3, align_corners=False: out center o maps to
    # in coord (o + .5) * (2/3) - .5, clamped. Hand-derived expectation.
    x = jnp.asarray(np.array([[0.0, 1.0], [2.0, 3.0]], np.float32))[..., None]
    out = np.asarray(resize_bilinear(x, (3, 3), align_corners=False))[..., 0]
    expected = np.array(
        [[0.0, 0.5, 1.0], [1.0, 1.5, 2.0], [2.0, 2.5, 3.0]], np.float32
    )
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_pos_embed_resize_matches_torch_interpolate():
    # the exact op _resize_pos_embed performs on the grid part
    # (reference vit.py:156-158): F.interpolate bilinear, default
    # align_corners (False). Up- and down-scaling, non-square targets.
    rng = np.random.RandomState(0)
    grid = rng.randn(1, 6, 6, 5).astype(np.float32)
    for target in [(8, 8), (4, 4), (9, 3), (6, 6)]:
        ours = np.asarray(resize_bilinear(jnp.asarray(grid), target, align_corners=False))
        theirs = (
            F.interpolate(
                torch.from_numpy(grid).permute(0, 3, 1, 2), size=target, mode="bilinear"
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=2e-6, err_msg=f"target {target}")


def test_fusion_upsample_matches_torch_align_corners_true():
    # refinenet x2 upsample + final output upsample use
    # align_corners=True (blocks.py:377-379, models.py:70-72)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (10, 14), align_corners=True))
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(10, 14),
            mode="bilinear", align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_project_readout_concat_order_and_erf_gelu():
    # reference vit.py:87-90: features = cat((patches, cls_expanded), -1)
    # then Linear(2C->C) + nn.GELU() (exact erf). A kernel that reads
    # only the first C channels must see the PATCH tokens; one that
    # reads the last C channels must see the cls token.
    C = 3
    tokens = np.zeros((1, 4, C), np.float32)
    tokens[0, 0] = [10.0, 20.0, 30.0]  # cls
    tokens[0, 1] = [1.0, 2.0, 3.0]
    tokens[0, 2] = [4.0, 5.0, 6.0]
    tokens[0, 3] = [7.0, 8.0, 9.0]

    module = ProjectReadout(dim=C)

    def run(kernel):
        params = {"project": {"kernel": jnp.asarray(kernel), "bias": jnp.zeros((C,))}}
        return np.asarray(module.apply({"params": params}, jnp.asarray(tokens)))

    import math

    def erf_gelu(v):
        return v * 0.5 * (1.0 + np.vectorize(math.erf)(v / np.sqrt(2.0)))

    first_half = np.concatenate([np.eye(C), np.zeros((C, C))], 0).astype(np.float32)
    second_half = np.concatenate([np.zeros((C, C)), np.eye(C)], 0).astype(np.float32)

    np.testing.assert_allclose(run(first_half), erf_gelu(tokens[:, 1:]), atol=1e-5)
    np.testing.assert_allclose(
        run(second_half), erf_gelu(np.broadcast_to(tokens[:, :1], (1, 3, C))), atol=1e-4
    )

    # and the erf-vs-tanh distinction is actually exercised: torch's
    # exact gelu agrees, the tanh approximation visibly does not
    v = tokens[:, 1:]
    torch_gelu = F.gelu(torch.from_numpy(v)).numpy()
    np.testing.assert_allclose(run(first_half), torch_gelu, atol=1e-5)

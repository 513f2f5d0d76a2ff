"""Pallas fused decode kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from unmore_tpu.ops.fields import center_singularity_scores
from unmore_tpu.ops.pallas.decode import fused_center_decode


def test_fused_decode_matches_xla_reference():
    rng = np.random.RandomState(0)
    B, S = 3, 64
    sdf = (rng.randn(B, S, S) * 2).astype(np.float32)
    center = rng.randn(B, S, S, 2).astype(np.float32)
    # make crop 0 contain a real eroded blob so scores are non-trivial
    sdf[0] = -1.0
    sdf[0, 8:56, 8:56] = 2.0

    want_s, want_yx, want_u = center_singularity_scores(jnp.asarray(sdf), jnp.asarray(center))
    got_s, got_yx, got_u = fused_center_decode(jnp.asarray(sdf), jnp.asarray(center), interpret=True)

    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=2e-5)
    # argmax must agree wherever the max is meaningfully positive
    pos = np.asarray(want_s) > 1e-4
    np.testing.assert_array_equal(np.asarray(got_yx)[pos], np.asarray(want_yx)[pos])

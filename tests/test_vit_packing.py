"""ViT encoder variants must be numerically transparent.

* sequence packing (``pack=2``: two crops share one sequence under a
  block-diagonal attention mask) — an MFU experiment for the 65-token
  lane padding (BASELINE.md); per-crop outputs must match the unpacked
  forward because softmax rows never mix crops and every other op is
  per-token;
* ``remat=True`` (checkpointed blocks, the batch>=96 HBM lever) — must
  change neither outputs nor gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unmore_tpu.models.vit import ViTBackbone, ViTConfig

HIGH = jax.lax.Precision.HIGHEST

CFG = ViTConfig(depth=3, dim=32, heads=2, mlp_dim=64, patch=16, pretrain_grid=4)


def _model(**kw):
    return ViTBackbone(CFG, hooks=(0, 2), precision=HIGH, **kw)


def _data(batch=4, hw=32):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, hw, hw, 3).astype(np.float32))
    params = _model().init(jax.random.PRNGKey(1), x)
    return params, x


def test_packed_forward_matches_unpacked():
    params, x = _data()
    model = _model()
    base = model.apply(params, x)
    packed = model.apply(params, x, pack=2)
    assert len(base) == len(packed)
    for a, b in zip(base, packed):
        assert a.shape == b.shape  # [B, 1+h*w, C] per-crop either way
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pack_must_divide_batch():
    params, x = _data(batch=3)
    try:
        _model().apply(params, x, pack=2)
    except AssertionError:
        return
    raise AssertionError("pack=2 over batch 3 should be rejected")


def test_cli_plumbing_threads_vit_pack():
    """--vit_pack reaches the model through build_objectness (stage-2
    CLIs) so packing adoption is a flag flip, not a code change."""
    from argparse import Namespace

    from unmore_tpu.cli.common import build_objectness

    model = build_objectness(Namespace(use_bg_sdf=True, vit_pack=2))
    assert model.vit_pack == 2
    assert build_objectness(Namespace()).vit_pack == 1


def test_remat_preserves_outputs_and_grads():
    params, x = _data()

    def loss(p, model):
        return sum(jnp.sum(t**2) for t in model.apply(p, x))

    v0, g0 = jax.value_and_grad(loss)(params, _model())
    v1, g1 = jax.value_and_grad(loss)(params, _model(remat=True))
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        # recompute reassociates float reductions: tiny noise is expected
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=5e-4)


def test_packed_objectness_matches_unpacked():
    """Integration: a real (miniature) ObjectnessNet with vit_pack=2 must
    reproduce the unpacked fields exactly — this is the shape the
    stage-2 engines call through build_objectness(--vit_pack)."""
    from unmore_tpu.models.objectness import ObjectnessNet
    from unmore_tpu.models.vit import ViTConfig

    def mini(pack):
        return ObjectnessNet(
            backbone_type="dpt_base",
            sdf_activation="tanh",
            use_bg_sdf=True,
            features=16,
            vit_config=ViTConfig(depth=2, dim=32, heads=2, mlp_dim=64, pretrain_grid=4),
            hooks=(0, 1, 1, 1),
            widths=(8, 16, 24, 24),
            precision=HIGH,
            vit_pack=pack,
        )

    rng = np.random.RandomState(3)
    crops = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    params = mini(1).init(jax.random.PRNGKey(0), crops)["params"]
    base = mini(1).apply({"params": params}, crops)
    packed = mini(2).apply({"params": params}, crops)
    np.testing.assert_allclose(
        np.asarray(base["sdf_maps"]), np.asarray(packed["sdf_maps"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(base["center_fields"]), np.asarray(packed["center_fields"]), atol=2e-5
    )

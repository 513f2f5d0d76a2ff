"""End-to-end parity: torch reference-shaped models -> converter -> flax.

Validates both the flax architectures and the checkpoint converter in
one shot: a randomly-initialized torch model with reference state_dict
naming must produce the same outputs as the converted flax model.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from unmore_tpu.models.objectness import ObjectnessNet
from unmore_tpu.models.resnet import BinaryClassifier
from unmore_tpu.models.vit import ViTConfig
from unmore_tpu.models.convert import (
    convert_classifier_state_dict,
    convert_objectness_state_dict,
)
from tests.torch_ref import TorchDPTObjectness, TorchResNet50Classifier

HIGH = jax.lax.Precision.HIGHEST


def _tiny_flax_objectness(sdf_activation="tanh"):
    return ObjectnessNet(
        backbone_type="dpt_base",
        sdf_activation=sdf_activation,
        use_bg_sdf=True,
        features=16,
        vit_config=ViTConfig(depth=4, dim=32, heads=2, mlp_dim=64, pretrain_grid=4),
        hooks=(0, 1, 2, 3),
        widths=(8, 16, 24, 24),
        precision=HIGH,
    )


@pytest.mark.parametrize("hw", [64, 32])
def test_objectness_net_matches_torch_reference(hw):
    torch.manual_seed(0)
    tmodel = TorchDPTObjectness().eval()
    x = np.random.RandomState(1).rand(2, hw, hw, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    params = convert_objectness_state_dict(tmodel.state_dict())
    fmodel = _tiny_flax_objectness()
    got = fmodel.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got["center_fields"]),
        want["center_fields"].permute(0, 2, 3, 1).numpy(),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["sdf_maps"]),
        want["sdf_maps"][:, 0].numpy(),
        atol=2e-4,
    )


def test_objectness_net_sine_sdf_head_matches_torch_reference():
    # sdf_activation='sine' (reference objectness_net.py:120-127) is
    # CLI-reachable via --sdf_activation sine + --use_bg_sdf
    torch.manual_seed(3)
    tmodel = TorchDPTObjectness(sdf_activation="sine").eval()
    x = np.random.RandomState(4).rand(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    params = convert_objectness_state_dict(tmodel.state_dict())
    got = _tiny_flax_objectness(sdf_activation="sine").apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got["sdf_maps"]), want["sdf_maps"][:, 0].numpy(), atol=2e-4
    )


def test_converter_covers_flax_param_tree():
    """Every param the flax model expects must be produced by the converter."""
    torch.manual_seed(0)
    tmodel = TorchDPTObjectness()
    params = convert_objectness_state_dict(tmodel.state_dict())
    fmodel = _tiny_flax_objectness()
    init = jax.jit(
        lambda k: fmodel.init(k, jnp.zeros((1, 64, 64, 3)))["params"]
    )(jax.random.PRNGKey(0))
    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_conv = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    missing, bad_shape = [], []
    for path, leaf in flat_init:
        if path not in flat_conv:
            missing.append(jax.tree_util.keystr(path))
        elif flat_conv[path].shape != leaf.shape:
            bad_shape.append((jax.tree_util.keystr(path), flat_conv[path].shape, leaf.shape))
    assert not missing, f"converter missing params: {missing}"
    assert not bad_shape, f"shape mismatches: {bad_shape}"


def test_binary_classifier_matches_torch_reference():
    torch.manual_seed(0)
    tmodel = TorchResNet50Classifier(stage_blocks=(2, 2, 2, 2)).eval()
    # make BN stats non-trivial
    sd = tmodel.state_dict()
    rng = np.random.RandomState(2)
    for k in sd:
        if "running_mean" in k:
            sd[k] = torch.from_numpy(rng.randn(*sd[k].shape).astype(np.float32) * 0.1)
        if "running_var" in k:
            sd[k] = torch.from_numpy(rng.rand(*sd[k].shape).astype(np.float32) + 0.5)
    tmodel.load_state_dict(sd)

    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    variables = convert_classifier_state_dict(tmodel.state_dict())
    fmodel = BinaryClassifier(stage_blocks=(2, 2, 2, 2), precision=HIGH)
    got = np.asarray(fmodel.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)

"""Self-test of the real-weights parity harness (scripts/parity/):
produce a reference-format activation dump + torch-style checkpoint
from the reference-shaped torch fixture, then run check_parity on them
— the exact flow a user runs with the published checkpoints.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow  # two subprocess JAX inits + capture compile

from tests.torch_ref import TorchDPTObjectness, TorchResNet50Classifier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHECK = os.path.join(REPO, "scripts", "parity", "check_parity.py")


def test_parity_harness_passes_on_matching_weights(tmp_path):
    torch.manual_seed(0)
    model = TorchDPTObjectness().eval()
    cls = TorchResNet50Classifier(stage_blocks=(1, 1)).eval()

    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    xt = torch.from_numpy(x)

    taps = {}

    def hook(name):
        def fn(_m, _i, out):
            taps[name] = out.detach().numpy()

        return fn

    sc = model.backbone.scratch
    for i in range(1, 5):
        getattr(sc, f"layer{i}_rn").register_forward_hook(hook(f"layer{i}_rn"))
    with torch.no_grad():
        out = model(xt)
        existence = cls(xt).numpy()

    npz = str(tmp_path / "ref.npz")
    np.savez_compressed(
        npz,
        input=x,
        center_fields=out["center_fields"].numpy(),
        sdf_maps=out["sdf_maps"].numpy(),
        existence=existence,
        **taps,
    )
    obj_ckpt = str(tmp_path / "objectness.ckpt")
    cls_ckpt = str(tmp_path / "classifier.ckpt")
    torch.save({"model_state_dict": model.state_dict()}, obj_ckpt)
    torch.save({"model_state_dict": cls.state_dict()}, cls_ckpt)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, CHECK, "--npz", npz, "--objectness_ckpt", obj_ckpt, "--tiny", "--tol", "5e-4", "--cpu"],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PARITY OK" in proc.stdout
    for name in ("center_fields", "sdf_maps", "layer4_rn"):
        assert name in proc.stdout

    # the harness must FAIL on perturbed weights (proves it isn't vacuous)
    sd = model.state_dict()
    key = next(k for k in sd if k.endswith("weight") and "scratch" in k)
    sd[key] = sd[key] + 0.05
    torch.save({"model_state_dict": sd}, obj_ckpt)
    proc = subprocess.run(
        [sys.executable, CHECK, "--npz", npz, "--objectness_ckpt", obj_ckpt, "--tiny", "--tol", "5e-4", "--cpu"],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "PARITY FAIL" in proc.stdout

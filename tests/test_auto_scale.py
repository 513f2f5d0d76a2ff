"""auto_scale_workers linear-scaling-rule test (reference
defaults.py:697-766 example values)."""

import importlib.util
import os


def _cli():
    path = os.path.join(os.path.dirname(__file__), "..", "cad", "train_net.py")
    spec = importlib.util.spec_from_file_location("cad_train_net_scale", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_auto_scale_matches_reference_example():
    cli = _cli()
    solver = {
        "ims_per_batch": 16, "base_lr": 0.1, "max_iter": 5000,
        "steps": (4000,), "checkpoint_period": 1000, "eval_period": 0,
        "warmup_iters": 1000, "reference_world_size": 8,
    }
    s = cli.auto_scale_workers(solver, 16)
    assert s["ims_per_batch"] == 32
    assert abs(s["base_lr"] - 0.2) < 1e-9
    assert s["max_iter"] == 2500
    assert s["steps"] == (2000,)
    assert s["checkpoint_period"] == 500
    assert s["warmup_iters"] == 500
    assert s["reference_world_size"] == 16
    # no-op cases
    assert cli.auto_scale_workers(solver, 8) is solver
    solver0 = dict(solver, reference_world_size=0)
    assert cli.auto_scale_workers(solver0, 16) is solver0

"""Aux subsystem tests: stage timing, PreciseBN, config round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from unmore_tpu.config import ModelConfig, TrainObjectnessConfig, load_config, save_config
from unmore_tpu.models.resnet import BinaryClassifier
from unmore_tpu.train.classifier import init_classifier_state
from unmore_tpu.train.precise_bn import precise_bn_stats
from unmore_tpu.utils.profiling import StageTimer


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0


def test_precise_bn_recovers_true_statistics():
    model = BinaryClassifier(stage_blocks=(1,))
    state = init_classifier_state(model, optax.sgd(0.1), jax.random.PRNGKey(0), image_size=32)

    def apply_fn(variables, batch):
        _, mutated = model.apply(variables, batch, train=True, mutable=["batch_stats"])
        return mutated["batch_stats"]

    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.rand(8, 32, 32, 3) * 2.0, jnp.float32) for _ in range(8)]
    new_stats = precise_bn_stats(apply_fn, state.params, state.batch_stats, batches)
    # first BN sees conv1 outputs; its recovered mean must differ from the
    # init zeros and match a direct average of per-batch raw stats
    leaf_old = jax.tree_util.tree_leaves(state.batch_stats)[0]
    leaf_new = jax.tree_util.tree_leaves(new_stats)[0]
    assert not np.allclose(np.asarray(leaf_old), np.asarray(leaf_new))
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(new_stats)[1])).all()


def test_async_checkpointer_roundtrip(tmp_path):
    import jax.numpy as jnp

    from unmore_tpu.train.checkpoints import AsyncCheckpointer, load_checkpoint

    w = AsyncCheckpointer()
    tree = {"a": jnp.arange(8.0), "step": jnp.int32(3)}
    path = str(tmp_path / "ckpt" / "x.ckpt")
    w.save(path, tree)
    # the donated-buffer hazard: mutate/discard the original right away
    tree = None
    w.wait()
    restored = load_checkpoint(path)
    np.testing.assert_array_equal(restored["a"], np.arange(8.0))
    assert int(restored["step"]) == 3
    # sequential saves preserve order (second overwrites first)
    w.save(path, {"a": jnp.zeros(2), "step": jnp.int32(1)})
    w.save(path, {"a": jnp.ones(2), "step": jnp.int32(2)})
    w.wait()
    assert int(load_checkpoint(path)["step"]) == 2


def test_async_checkpointer_pump_path(tmp_path):
    # The cooperative pull path (the TPU default: a background-thread
    # device_get racing main-thread step dispatches wedged a run on the
    # relay — round-4 scale run). Force it on CPU: the save must stay
    # in flight across pump() calls, survive donation of the original
    # tree, stream leaves into <path>.tmp as they are pulled, and only
    # rename atomically once the last leaf is durable; wait() drains.
    import os

    import jax.numpy as jnp

    from unmore_tpu.train.checkpoints import AsyncCheckpointer, load_checkpoint

    w = AsyncCheckpointer(leaves_per_pump=1, use_pump=True)
    tree = {"a": jnp.arange(8.0), "b": jnp.ones((3, 3)), "step": jnp.int32(7)}
    path = str(tmp_path / "ckpt" / "x.ckpt")
    w.save(path, tree)
    tree = None  # donated-buffer hazard: snapshot must be independent
    assert w.in_flight
    assert w.pump()  # 3 leaves at 1/pump: still in flight after the 1st
    assert not os.path.exists(path)  # nothing durable mid-pull
    assert os.path.getsize(path + ".tmp") > 0  # ...but the stream flows
    while w.pump():
        pass
    assert not w.in_flight
    assert not os.path.exists(path + ".tmp")  # atomic rename happened
    restored = load_checkpoint(path)
    np.testing.assert_array_equal(restored["a"], np.arange(8.0))
    assert int(restored["step"]) == 7
    # a new save while idle + wait() drains without explicit pumps
    w.save(path, {"a": jnp.zeros(8), "b": jnp.zeros((3, 3)), "step": jnp.int32(9)})
    w.wait()
    assert int(load_checkpoint(path)["step"]) == 9


def test_prefetch_iterator_overlaps_and_counts_starvation():
    import time

    from unmore_tpu.data.prefetch import PrefetchIterator

    def make_batch():
        time.sleep(0.01)
        return {"x": np.ones(4)}

    it = PrefetchIterator(make_batch, num_workers=2, depth=4)
    for _ in range(10):
        b = next(it)
        assert b["x"].shape == (4,)
        time.sleep(0.005)  # consumer slower than 2 workers -> low starvation
    assert 0.0 <= it.starved_fraction <= 1.0
    it.close()

    # worker exceptions surface to the consumer
    def boom():
        raise RuntimeError("worker died")

    it2 = PrefetchIterator(boom, num_workers=1)
    import pytest

    with pytest.raises(RuntimeError, match="worker died"):
        next(it2)


def test_config_roundtrip(tmp_path):
    cfg = TrainObjectnessConfig(model=ModelConfig(backbone_type="dpt_hybrid"), batch_size=7)
    path = str(tmp_path / "cfg.json")
    save_config(cfg, path)
    loaded = load_config(TrainObjectnessConfig, path)
    assert loaded.model.backbone_type == "dpt_hybrid"
    assert loaded.batch_size == 7
    assert loaded.optim.learning_rate == cfg.optim.learning_rate


def test_visualization_dump(tmp_path):
    from unmore_tpu.utils.vis import dump_objectness_diagnostics
    import os

    rng = np.random.RandomState(0)
    out = dump_objectness_diagnostics(
        str(tmp_path), "iter100_s0",
        image=rng.rand(32, 32, 3).astype(np.float32),
        pred_center=rng.randn(32, 32, 2).astype(np.float32),
        pred_sdf=rng.randn(32, 32).astype(np.float32),
        gt_center=rng.randn(32, 32, 2).astype(np.float32),
        gt_sdf=rng.randn(32, 32).astype(np.float32),
        gt_mask=(rng.rand(32, 32) > 0.5).astype(np.float32),
    )
    files = os.listdir(out)
    # 14 panels: input, pred center/sdf/sdf-mask/center-norm,
    # pred anti-center + sdf-grad dy/dx (the stage-2 singularity-
    # threshold tuning instruments, VERDICT r3 item 7), gt center/
    # anti-center/sdf/sdf-grads/mask
    assert len(files) == 14
    assert all(f.startswith("iter100_s0_") and f.endswith(".png") for f in files)
    for panel in ("pred_anti_center", "pred_sdf_grad_dy", "pred_sdf_grad_dx",
                  "gt_anti_center", "gt_sdf_grad_dy", "gt_sdf_grad_dx"):
        assert f"iter100_s0_{panel}.png" in files


def test_vis_anti_center_matches_device_op():
    from unmore_tpu.ops.fields import anti_center_map
    from unmore_tpu.ops.image import image_gradients
    from unmore_tpu.utils.vis import _anti_center_np, _image_gradients_np

    rng = np.random.RandomState(1)
    field = rng.randn(24, 24, 2).astype(np.float32)
    host = _anti_center_np(field)
    dev = np.asarray(anti_center_map(field[None]))[0]
    np.testing.assert_allclose(host, dev, atol=1e-5)
    sdf = rng.randn(24, 24).astype(np.float32)
    hdy, hdx = _image_gradients_np(sdf)
    ddy, ddx = image_gradients(sdf)
    np.testing.assert_allclose(hdy, np.asarray(ddy), atol=1e-6)
    np.testing.assert_allclose(hdx, np.asarray(ddx), atol=1e-6)


def test_corruption_detector_semantics():
    from unmore_tpu.train.resilience import FATAL_EXIT_CODE, CorruptionDetector

    assert FATAL_EXIT_CODE == 3
    d = CorruptionDetector()
    assert not d.update(True)   # one bad window: not fatal yet
    assert not d.update(False)  # healthy window resets
    assert not d.update(True)
    assert d.update(True)       # two consecutive -> fatal
    assert d.loss_window_corrupt(float("nan"))
    assert d.loss_window_corrupt(float("inf"))
    assert d.loss_window_corrupt(5300.0)
    assert not d.loss_window_corrupt(108.0)  # warmup-scale losses pass

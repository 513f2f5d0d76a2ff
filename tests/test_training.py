"""Stage-1 training tests: GT synthesis semantics, DP-mesh train steps,
checkpoint roundtrip. Runs on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from unmore_tpu.config import ModelConfig, OptimConfig, TrainObjectnessConfig
from unmore_tpu.data.votecut import batch_iterator, synthesize_labels
from unmore_tpu.data.existence import background_square_crop, classifier_sample
from unmore_tpu.models.objectness import ObjectnessNet
from unmore_tpu.models.resnet import BinaryClassifier
from unmore_tpu.models.vit import ViTConfig
from unmore_tpu.parallel.mesh import data_parallel_mesh, replicate, shard_batch
from unmore_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from unmore_tpu.train.classifier import (
    init_classifier_state,
    make_classifier_train_step,
    make_eval_step,
)
from unmore_tpu.train.objectness import (
    init_state,
    make_optimizer,
    make_train_step,
    objectness_losses,
)


def _square_world(size=100, box=(30, 40, 70, 80)):
    image = np.random.RandomState(0).rand(size, size, 3).astype(np.float32)
    mask = np.zeros((size, size), np.uint8)
    x1, y1, x2, y2 = box
    mask[y1:y2, x1:x2] = 1
    return image, mask


def test_synthesize_labels_geometry():
    image, mask = _square_world()
    s = synthesize_labels(image, mask, image_size=64, use_bg_sdf=True, random_crop=False)
    assert s is not None
    assert s.image.shape == (64, 64, 3)
    assert s.sdf.shape == (64, 64)
    # saliency matches the (resized) square
    assert s.saliency_mask[32, 32] == 1 and s.saliency_mask[2, 2] == 0
    # signed SDF: positive inside, negative outside (bg sdf), ~[-1, 1]
    assert s.sdf[32, 32] > 0 and s.sdf[2, 2] < 0
    assert abs(s.sdf).max() <= 1.0 + 1e-6
    # center field: unit vectors in FG pointing away from the center; 0 in BG
    norms = np.linalg.norm(s.center_field, axis=-1)
    fg = s.saliency_mask > 0
    assert np.allclose(norms[fg], 1.0, atol=1e-5)
    assert np.all(norms[~fg] == 0)
    cx, cy = s.object_center
    # a pixel right of the center should point in +x (channel 1)
    px_y, px_x = int(cy), int(cx) + 8
    if s.saliency_mask[px_y, px_x]:
        assert s.center_field[px_y, px_x, 1] > 0.9
    # empty mask -> None
    assert synthesize_labels(image, np.zeros_like(mask), 64) is None


def test_batch_iterator_fixed_shapes():
    image, mask = _square_world()
    rng = np.random.default_rng(0)

    def sample_fn(_):
        return synthesize_labels(image, mask, 32, rng=rng)

    it = batch_iterator(sample_fn, 10, batch_size=4, rng=rng)
    batch = next(it)
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["center_field"].shape == (4, 32, 32, 2)
    assert batch["sdf"].shape == (4, 32, 32)
    assert batch["saliency_mask"].shape == (4, 32, 32)


def _tiny_objectness():
    return ObjectnessNet(
        backbone_type="dpt_base",
        features=16,
        vit_config=ViTConfig(depth=2, dim=32, heads=2, mlp_dim=64, pretrain_grid=4),
        hooks=(0, 1, 1, 1),
        widths=(8, 16, 24, 24),
    )


def test_objectness_train_step_on_mesh_decreases_loss():
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    cfg = TrainObjectnessConfig(
        model=ModelConfig(image_size=32),
        optim=OptimConfig(learning_rate=3e-4, lr_scheduler_milestones=(1000,)),
    )
    model = _tiny_objectness()
    tx = make_optimizer(cfg.optim)
    mesh = data_parallel_mesh()
    state = init_state(model, tx, jax.random.PRNGKey(0), image_size=32)
    state = replicate(mesh, state)
    step = make_train_step(model, tx, cfg, mesh)

    image, mask = _square_world()
    s = synthesize_labels(image, mask, 32, random_crop=False)
    batch = {
        "image": np.stack([s.image] * 8),
        "center_field": np.stack([s.center_field] * 8),
        "sdf": np.stack([s.sdf] * 8),
        "saliency_mask": np.stack([s.saliency_mask] * 8),
    }
    batch = shard_batch(mesh, batch)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0] * 0.97, losses
    for key in ("center_field", "sdf", "sdf_gradient", "sdf_binary_mask"):
        assert key in metrics
    assert int(state.step) == 5


def test_classifier_train_step_and_eval():
    model = BinaryClassifier(stage_blocks=(1, 1))
    import optax

    tx = optax.adam(1e-3)
    state = init_classifier_state(model, tx, jax.random.PRNGKey(0), image_size=32)
    step = make_classifier_train_step(model, tx)
    rng = np.random.RandomState(0)
    # separable toy task: bright vs dark images
    images = np.concatenate(
        [rng.rand(4, 32, 32, 3) * 0.3, rng.rand(4, 32, 32, 3) * 0.3 + 0.7]
    ).astype(np.float32)
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.float32)
    batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}
    stats_before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    losses = []
    for _ in range(15):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    stats_after = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.allclose(stats_before, stats_after), "batch_stats must update"
    hits, total, _pred = make_eval_step(model)(state.params, state.batch_stats, batch)
    assert float(total) == 8.0 and float(hits) >= 6.0


def test_checkpoint_roundtrip(tmp_path):
    cfg = TrainObjectnessConfig(model=ModelConfig(image_size=64))
    model = _tiny_objectness()
    tx = make_optimizer(cfg.optim)
    state = init_state(model, tx, jax.random.PRNGKey(0), image_size=64)
    path = str(tmp_path / "ckpt" / "iter_1_model.ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, target=state)
    a, b = jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_existence_sampling():
    image, mask = _square_world()
    crop = background_square_crop(image, mask)
    assert crop is not None and crop.ndim == 3
    rng = np.random.default_rng(0)
    pos_seen, neg_seen = False, False
    for _ in range(20):
        c, label = classifier_sample(image, mask, mask, 32, rng)
        assert c.shape == (32, 32, 3)
        pos_seen |= label == 1.0
        neg_seen |= label == 0.0
    assert pos_seen and neg_seen


def test_spike_guard_skips_exploding_batches():
    # a batch whose loss exceeds skip_loss_above must leave params and
    # optimizer state untouched (one such step destroyed a run; STATUS)
    import jax
    import jax.numpy as jnp

    from unmore_tpu.config import ModelConfig, OptimConfig, TrainObjectnessConfig
    from unmore_tpu.models.objectness import ObjectnessNet
    from unmore_tpu.models.vit import ViTConfig
    from unmore_tpu.train.objectness import init_state, make_optimizer, make_train_step

    cfg = TrainObjectnessConfig(
        model=ModelConfig(image_size=32), optim=OptimConfig(), skip_loss_above=100.0,
        spike_guard_warmup=0,  # arm the ceiling from step 0 for this test
    )
    model = ObjectnessNet(
        backbone_type="dpt_base", features=8,
        vit_config=ViTConfig(depth=1, dim=16, heads=2, mlp_dim=32, pretrain_grid=2),
        hooks=(0, 0, 0, 0), widths=(8, 8, 8, 8),
    )
    tx = make_optimizer(cfg.optim)
    state = init_state(model, tx, jax.random.PRNGKey(0), image_size=32)
    step = make_train_step(model, tx, cfg)
    good = {
        "image": jnp.zeros((2, 32, 32, 3)),
        "center_field": jnp.zeros((2, 32, 32, 2)),
        "sdf": jnp.zeros((2, 32, 32)),
        "saliency_mask": jnp.ones((2, 32, 32)) * 0.5,
    }
    # absurd targets -> loss way beyond the ceiling
    bad = dict(good, sdf=jnp.full((2, 32, 32), 1e4))
    p0 = jax.device_get(state.params)
    state_bad, m_bad = step(state, bad)
    assert float(m_bad["skipped"]) == 1.0
    p_bad = jax.device_get(state_bad.params)
    flat0 = jax.tree_util.tree_leaves(p0)
    flatb = jax.tree_util.tree_leaves(p_bad)
    for a, b in zip(flat0, flatb):
        np.testing.assert_array_equal(a, b)
    assert int(state_bad.step) == 1  # the step counter still advances
    state_good, m_good = step(state_bad, good)
    assert float(m_good["skipped"]) == 0.0
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(flatb, jax.tree_util.tree_leaves(jax.device_get(state_good.params)))
    )


def test_spike_guard_warmup_grace():
    # The Adam early-training transient can legitimately exceed any
    # fixed ceiling (measured ~1100 with bg-SDF targets, which
    # deadlocked a from-scratch run: every update skipped, then the
    # fully-skipped-window fail-fast fired — round-4 scale run). During
    # spike_guard_warmup steps a finite above-ceiling loss must still
    # apply the update; a non-finite loss must skip even in warmup; the
    # ceiling arms once state.step reaches the warmup bound.
    import jax
    import jax.numpy as jnp

    from unmore_tpu.config import ModelConfig, OptimConfig, TrainObjectnessConfig
    from unmore_tpu.models.objectness import ObjectnessNet
    from unmore_tpu.models.vit import ViTConfig
    from unmore_tpu.train.objectness import init_state, make_optimizer, make_train_step

    cfg = TrainObjectnessConfig(
        model=ModelConfig(image_size=32), optim=OptimConfig(), skip_loss_above=100.0,
        spike_guard_warmup=2,
    )
    model = ObjectnessNet(
        backbone_type="dpt_base", features=8,
        vit_config=ViTConfig(depth=1, dim=16, heads=2, mlp_dim=32, pretrain_grid=2),
        hooks=(0, 0, 0, 0), widths=(8, 8, 8, 8),
    )
    tx = make_optimizer(cfg.optim)
    state = init_state(model, tx, jax.random.PRNGKey(0), image_size=32)
    step = make_train_step(model, tx, cfg)
    big = {
        "image": jnp.zeros((2, 32, 32, 3)),
        "center_field": jnp.zeros((2, 32, 32, 2)),
        "sdf": jnp.full((2, 32, 32), 1e4),  # loss far beyond the ceiling
        "saliency_mask": jnp.ones((2, 32, 32)) * 0.5,
    }
    nan = dict(big, sdf=jnp.full((2, 32, 32), jnp.nan))

    p0 = jax.tree_util.tree_leaves(jax.device_get(state.params))
    state, m = step(state, big)  # step 0: warmup, ceiling unarmed
    assert float(m["skipped"]) == 0.0
    p1 = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert any(not np.array_equal(a, b) for a, b in zip(p0, p1))

    state, m = step(state, nan)  # step 1: non-finite skips even in warmup
    assert float(m["skipped"]) == 1.0
    p2 = jax.tree_util.tree_leaves(jax.device_get(state.params))
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)

    state, m = step(state, big)  # step 2 == warmup bound: ceiling armed
    assert float(m["skipped"]) == 1.0
    p3 = jax.tree_util.tree_leaves(jax.device_get(state.params))
    for a, b in zip(p2, p3):
        np.testing.assert_array_equal(a, b)

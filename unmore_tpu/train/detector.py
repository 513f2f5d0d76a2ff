"""CAD detector training step: SGD + warmup, grad clip, NaN skip, DP mesh.

Reference solver (``cad/solver/build.py`` + the CAD yaml): SGD momentum
0.9, base LR 0.01, weight decay 5e-5, linear warmup (1000 iters, factor
1e-3), gradient clip by global norm 1.0, AMP -> bf16 compute here.
NaN-loss batches skip the update (reference
``cad/engine/train_loop.py:280-284``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from unmore_tpu.detector.cascade_rcnn import (
    CascadeMaskRCNN,
    DetectorConfig,
    detector_forward_train,
)
from unmore_tpu.parallel.mesh import batch_sharding, replicated_sharding


class DetectorTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def make_detector_optimizer(
    base_lr: float = 0.01,
    momentum: float = 0.9,
    weight_decay: float = 5e-5,
    warmup_iters: int = 1000,
    warmup_factor: float = 1e-3,
    steps: tuple = (),
    gamma: float = 0.02,
    clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    def schedule(count):
        lr = base_lr
        warm = jnp.where(
            count < warmup_iters,
            warmup_factor + (1 - warmup_factor) * count / max(warmup_iters, 1),
            1.0,
        )
        for s in steps:
            lr = jnp.where(count >= s, lr * gamma, lr)
        return lr * warm

    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(schedule, momentum=momentum),
    )


def init_detector_state(model: CascadeMaskRCNN, tx, rng, cfg: DetectorConfig,
                        init_image_size: int | None = None) -> DetectorTrainState:
    size = init_image_size or cfg.image_size
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, size, size, 3)), method=CascadeMaskRCNN.init_all)
    )(jax.random.PRNGKey(0))
    return DetectorTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=rng,
    )


def make_detector_train_step(model: CascadeMaskRCNN, tx, cfg: DetectorConfig,
                             mesh: Mesh | None = None):
    def loss_fn(params, batch_stats, batch, rng):
        losses, new_stats = detector_forward_train(
            model, {"params": params, "batch_stats": batch_stats}, cfg, batch, rng
        )
        total = sum(losses.values())
        return total, (losses, new_stats)

    def step(state: DetectorTrainState, batch):
        rng, step_rng = jax.random.split(state.rng)
        (total, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, step_rng
        )
        # NaN/Inf loss -> skip the update entirely
        ok = jnp.isfinite(total)
        grads = jax.tree_util.tree_map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = jax.tree_util.tree_map(lambda new, old: jnp.where(ok, new, old), params, state.params)
        new_stats = jax.tree_util.tree_map(lambda new, old: jnp.where(ok, new, old), new_stats, state.batch_stats)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state, rng=rng,
        )
        losses["total"] = total
        return new_state, losses

    if mesh is None:
        return jax.jit(step, donate_argnums=0)
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, bsh), out_shardings=(rep, rep), donate_argnums=0)

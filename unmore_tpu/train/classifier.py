"""Stage-1 existence-classifier training (BCE), DP-mesh jitted step.

Re-design of reference ``BinaryClassifierTrainer``
(``train_objectness_net.py:540-743``): BCE on the sigmoid output, Adam
+ MultiStepLR, accuracy evaluation at 0.5. BatchNorm statistics are
updated in-graph (``batch_stats`` collection) and cross-replica synced
via the mesh axis when training data-parallel — the TPU equivalent of
SyncBN.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from unmore_tpu.parallel.mesh import batch_sharding, replicated_sharding


class ClassifierTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def bce_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    pred = jnp.clip(pred, eps, 1 - eps)
    return -jnp.mean(target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred))


def _wire_images(images):
    """uint8 wire-format crops -> [0,1] float (device-side)."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


def make_classifier_train_step(model, tx, mesh: Mesh | None = None):
    def loss_fn(params, batch_stats, batch):
        pred, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            _wire_images(batch["image"]),
            train=True,
            mutable=["batch_stats"],
        )
        return bce_loss(pred[:, 0], batch["label"]), mutated["batch_stats"]

    def step(state: ClassifierTrainState, batch):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats, opt_state=opt_state
        )
        return new_state, {"loss": loss}

    if mesh is None:
        return jax.jit(step, donate_argnums=0)
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, bsh), out_shardings=(rep, rep), donate_argnums=0)


def make_eval_step(model):
    @jax.jit
    def eval_step(params, batch_stats, batch):
        pred = model.apply(
            {"params": params, "batch_stats": batch_stats}, _wire_images(batch["image"])
        )
        hits = ((pred[:, 0] > 0.5).astype(jnp.float32) == batch["label"]).astype(jnp.float32)
        return jnp.sum(hits), jnp.asarray(batch["label"].shape[0], jnp.float32), pred[:, 0]

    return eval_step


def init_classifier_state(model, tx, rng, image_size: int) -> ClassifierTrainState:
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, image_size, image_size, 3)), train=False)
    )(rng)
    return ClassifierTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )

"""PreciseBN: recompute BatchNorm statistics from fresh data.

TPU analog of the reference's PreciseBN hook (detectron2, enabled in
the CAD yaml with NUM_ITER 200; ``cad/engine/defaults.py:498-507``):
after (or during) training, run N forward passes in training mode and
replace the running statistics with the *plain average* of the
per-batch statistics (detectron2 resets momentum so every batch
contributes equally).

Implementation: run the model with ``mutable=['batch_stats']`` and
average the returned batch_stats trees across batches. Because flax
BatchNorm updates running stats as ``m*old + (1-m)*new``, we invert the
momentum update to recover each batch's raw statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def precise_bn_stats(apply_fn, params, batch_stats, batches, momentum: float = 0.9):
    """apply_fn(variables, batch) must run the model with train=True and
    mutable=['batch_stats'], returning the mutated batch_stats.

    Returns the averaged batch_stats tree over ``batches``.
    """
    n = 0
    acc = None
    for batch in batches:
        mutated = apply_fn({"params": params, "batch_stats": batch_stats}, batch)
        # recover this batch's raw stats from the momentum update
        raw = jax.tree_util.tree_map(
            lambda new, old: (new - momentum * old) / (1.0 - momentum), mutated, batch_stats
        )
        acc = raw if acc is None else jax.tree_util.tree_map(jnp.add, acc, raw)
        n += 1
    if n == 0:
        return batch_stats
    return jax.tree_util.tree_map(lambda x: x / n, acc)

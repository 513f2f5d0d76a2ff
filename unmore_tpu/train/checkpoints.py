"""Checkpoint save/restore (msgpack pytrees).

Same cadence semantics as the reference (periodic full-state dicts of
{model, optimizer, iteration, schedule}, ``train_objectness_net.py:267-275``),
stored as flax-serialized msgpack. Restore is strict for params and
best-effort for optimizer state, mirroring ``train_objectness_net.py:115-125``.
"""

from __future__ import annotations

import os

import jax
from flax import serialization


def save_checkpoint(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.device_get(serialization.to_state_dict(tree))
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(host_tree))


def load_checkpoint(path: str, target=None):
    with open(path, "rb") as f:
        data = serialization.msgpack_restore(f.read())
    if target is not None:
        return serialization.from_state_dict(target, data)
    return data

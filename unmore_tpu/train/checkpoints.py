"""Checkpoint save/restore (msgpack pytrees).

Same cadence semantics as the reference (periodic full-state dicts of
{model, optimizer, iteration, schedule}, ``train_objectness_net.py:267-275``),
stored as flax-serialized msgpack. Restore is strict for params and
best-effort for optimizer state, mirroring ``train_objectness_net.py:115-125``.
"""

from __future__ import annotations

import os
import threading

import jax
import jax.numpy as jnp
from flax import serialization


def save_checkpoint(path: str, tree) -> None:
    """Atomic write: temp file + rename, so a crash / fail-fast exit
    mid-write (the async writer pulls for minutes through the relay)
    can never leave a truncated file under the final name — a truncated
    newest checkpoint would otherwise break every --resume attempt.

    Corollary (verified by fault injection on the real chip): a
    corruption fail-fast exit(3) that lands while an async write is in
    flight kills the daemon writer and leaves only ``<path>.tmp``. That
    is the INTENDED outcome — bytes pulled through a possibly-corrupt
    channel must not become the newest durable checkpoint; --resume
    falls back to the previous durable one (or a fresh start)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.device_get(serialization.to_state_dict(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(host_tree))
    os.replace(tmp, path)


class AsyncCheckpointer:
    """Non-blocking checkpoint writes.

    A synchronous save blocks training on a full device->host pull of
    params + optimizer state (minutes for ViT-L through the axon
    relay). Here the save takes an on-device *copy* of the state (a
    fast HBM copy that is NOT tied to the training step's donated
    buffers) and a background thread does the slow device_get +
    msgpack write while training continues. One write is in flight at
    a time; a new save waits for the previous write to land
    (checkpoint order is preserved). Call ``wait()`` before exiting.
    """

    def __init__(self):
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None

    def save(self, path: str, tree) -> None:
        self.wait()
        if jax.default_backend() == "cpu":
            # the XLA:CPU client aborts on background-thread device_get
            # racing main-thread execution (observed under the 8-virtual-
            # device test backend); CPU pulls are cheap anyway
            save_checkpoint(path, tree)
            return
        # device-side snapshot: safe from later donation of `tree`
        snapshot = jax.tree_util.tree_map(
            lambda x: jnp.array(x) if isinstance(x, jax.Array) else x, tree
        )

        def write():
            try:
                save_checkpoint(path, snapshot)
            except BaseException as e:  # surfaced on the next save/wait
                self._error = e

        self._thread = threading.Thread(target=write, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            e, self._error = self._error, None
            raise e


def load_checkpoint(path: str, target=None):
    with open(path, "rb") as f:
        data = serialization.msgpack_restore(f.read())
    if target is not None:
        return serialization.from_state_dict(target, data)
    return data

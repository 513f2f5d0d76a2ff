"""Checkpoint save/restore (msgpack pytrees).

Same cadence semantics as the reference (periodic full-state dicts of
{model, optimizer, iteration, schedule}, ``train_objectness_net.py:267-275``),
stored as flax-serialized msgpack. Restore is strict for params and
best-effort for optimizer state, mirroring ``train_objectness_net.py:115-125``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import msgpack
import numpy as np
from flax import serialization

try:  # stable COCO-style wire format, but the hook is private API
    from flax.serialization import MAX_CHUNK_SIZE as _MAX_CHUNK
    from flax.serialization import _chunk
    from flax.serialization import _msgpack_ext_pack as _ext_pack
except ImportError:  # pragma: no cover - re-pin the ext codes locally
    _MAX_CHUNK = 2**30

    def _chunk(arr):
        raise NotImplementedError("leaf > 1 GiB needs flax._chunk")

    def _ext_pack(x):
        if isinstance(x, (np.ndarray, jax.Array)):
            tpl = (x.shape, x.dtype.name, np.ascontiguousarray(x).tobytes())
            return msgpack.ExtType(1, msgpack.packb(tpl, use_bin_type=True))
        raise TypeError(f"unserializable leaf {type(x)}")


def _stream_plan(obj):
    """Depth-first msgpack token stream for a state dict: scaffolding
    (map/array headers, keys) as ready bytes, leaves as deferred tokens
    so the device->host pull AND the encode+write of each leaf can be
    amortized one pump at a time. The byte stream restores identically
    to ``msgpack_serialize`` of the same tree (same ext codes, same
    chunking of >1 GiB leaves)."""
    packer = msgpack.Packer(use_bin_type=True)
    if isinstance(obj, dict):
        yield ("bytes", packer.pack_map_header(len(obj)))
        for k, v in obj.items():
            yield ("bytes", packer.pack(k))
            yield from _stream_plan(v)
    elif isinstance(obj, (list, tuple)):
        yield ("bytes", packer.pack_array_header(len(obj)))
        for v in obj:
            yield from _stream_plan(v)
    else:
        yield ("leaf", obj)


def _pack_leaf(x) -> bytes:
    if isinstance(x, np.ndarray) and x.nbytes > _MAX_CHUNK:
        x = _chunk(x)  # msgpack caps one object at 2**31-1 bytes
    return msgpack.packb(x, default=_ext_pack, strict_types=True)


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
    """Non-blocking checkpoint writes, pumped cooperatively.

    A synchronous save blocks training on a full device->host pull of
    params + optimizer state (minutes for ViT-L through the axon
    relay). The first design ran the pull on a background thread; a
    mid-run save then **wedged the run for 35+ minutes** (round-4 scale
    run): the thread's monolithic ``device_get`` and the main thread's
    step dispatches race on the single relay channel and neither makes
    progress. So no threads: ``save`` takes an on-device *copy* of the
    state (fast HBM copies, NOT tied to the training step's donated
    buffers) and the train loop calls :meth:`pump` once per iteration,
    pulling a few leaves at a time from the SAME thread that dispatches
    steps. The pull interleaves with compute (one bounded pause per
    iteration instead of one multi-minute stall), device calls stay
    serialized, and a wedge is impossible.

    Each pulled leaf is msgpack-encoded and appended to ``<path>.tmp``
    immediately (scale-run measurement: a monolithic end-of-drain
    serialize+write of a 4.2 GB ViT-L+Adam tree blocked one iteration
    for ~10 min on an 8 MB/s-disk host — streaming amortizes encode and
    disk I/O into the same per-iteration pumps as the pull, and host
    memory holds one leaf at a time instead of two full copies). The
    atomic rename happens only after the last leaf is durable; a crash
    mid-save leaves only ``.tmp``. One save is in flight at a time; a
    new ``save`` drains the previous one. Call ``wait()`` before
    exiting.
    """

    def __init__(self, leaves_per_pump: int = 4, use_pump: bool | None = None):
        self.leaves_per_pump = leaves_per_pump
        self.use_pump = use_pump  # None = auto: pump off CPU (cheap pulls)
        self._path: str | None = None
        self._file = None
        self._plan: list = []
        self._next = 0

    @property
    def in_flight(self) -> bool:
        return self._path is not None

    def save(self, path: str, tree) -> None:
        self.wait()
        pump = self.use_pump
        if pump is None:
            pump = jax.default_backend() != "cpu"
        if not pump:
            # CPU pulls are cheap; keep the simple blocking path
            save_checkpoint(path, tree)
            return
        # device-side snapshot: safe from later donation of `tree`
        snapshot = jax.tree_util.tree_map(
            lambda x: jnp.array(x) if isinstance(x, jax.Array) else x,
            serialization.to_state_dict(tree),
        )
        self._plan = list(_stream_plan(snapshot))
        self._next = 0
        self._path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._file = open(path + ".tmp", "wb")

    def pump(self) -> bool:
        """Advance the in-flight save by up to ``leaves_per_pump``
        leaf pull+encode+writes; returns True while a save remains in
        flight. Cheap no-op when idle — call every training iteration."""
        if self._path is None:
            return False
        leaves = 0
        while self._next < len(self._plan):
            kind, val = self._plan[self._next]
            if kind == "bytes":
                self._file.write(val)
            else:
                if leaves >= self.leaves_per_pump:
                    self._file.flush()
                    return True
                if isinstance(val, jax.Array):
                    val = jax.device_get(val)
                self._file.write(_pack_leaf(val))
                leaves += 1
            self._plan[self._next] = None  # release HBM copy / buffer
            self._next += 1
        self._file.close()
        path, self._path = self._path, None
        self._file, self._plan = None, []
        os.replace(path + ".tmp", path)
        return False

    def wait(self, progress_every: float | None = 60.0) -> None:
        """Drain the in-flight save to durability.

        The end-of-run drain pulls gigabytes through the relay with no
        training steps left to interleave output — many minutes of
        legitimate silence that a supervisor hang watchdog cannot tell
        from a wedge. ``progress_every`` (seconds) prints a drain
        heartbeat so supervised runs keep their liveness signal
        (unmore_tpu/train/supervisor.py watches child stdout)."""
        import time

        if self._path is not None and progress_every is not None:
            # announce the drain BEFORE the first pull: a wedged first
            # device_get never returns from pump(), so the in-loop
            # heartbeat below would never fire and a supervisor sees
            # pure silence (r5 scale chain post-mortem)
            print(
                f"checkpoint drain: starting, {len(self._plan)} tokens",
                flush=True,
            )
        last = time.monotonic()
        while self.pump():
            if progress_every is not None:
                now = time.monotonic()
                if now - last >= progress_every:
                    last = now
                    written = self._file.tell() if self._file else 0
                    print(
                        f"checkpoint drain: {self._next}/{len(self._plan)} tokens, "
                        f"{written / 1e6:.0f} MB written",
                        flush=True,
                    )


def load_checkpoint(path: str, target=None):
    with open(path, "rb") as f:
        data = serialization.msgpack_restore(f.read())
    if target is not None:
        return serialization.from_state_dict(target, data)
    return data

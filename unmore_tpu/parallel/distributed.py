"""Multi-host (multi-process) distribution.

TPU-native replacement for the reference's multiprocess NCCL stack:
``launch()`` process spawn (``cad/train_net.py:168-181``), DDP wrap
(``cad/engine/defaults.py:67-86``) and manual ``--start_idx/--end_idx``
data-range job splitting (``datasets.py:432-435``, README.md:170-188).

Design (SURVEY §5 "Distributed communication backend"):
* one ``jax.distributed.initialize()`` per host process; a single
  global ``Mesh(('data',))`` over every chip on every host — gradient
  reduction is implicit in jit under GSPMD (psum over ICI within a
  slice, DCN across slices);
* each host feeds only its own shard of the batch;
  :func:`global_batch` assembles per-host local arrays into one
  globally-sharded array (``jax.make_array_from_process_local_data``);
* dataset work splits deterministically by
  :func:`host_shard_range`/:func:`host_shard_indices`;
* checkpoints/logs are written by process 0 only (:func:`is_main`);
* eval gather via :func:`all_gather_objects`
  (``multihost_utils.process_allgather`` analog for host objects).

Single-process runs hit the exact same code paths (process_count()==1
degenerates everything), so the CLIs need no branching.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Join the multi-process JAX cluster. No-op when single-process.

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), so
    launchers can configure purely through the environment — the
    replacement for the reference's TCP-rendezvous ``dist_url``
    (``cad/engine/defaults.py:139-145``).
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None or not num_processes or num_processes <= 1:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main() -> bool:
    """True on the process that owns checkpoint/log writes."""
    return jax.process_index() == 0


def host_shard_range(n_items: int) -> tuple[int, int]:
    """Deterministic contiguous [start, end) of n_items for this host.

    Replaces the reference's manual --start_idx/--end_idx job splitting
    (datasets.py:432-435): earlier hosts get the remainder.
    """
    p, n = jax.process_index(), jax.process_count()
    base, rem = divmod(n_items, n)
    start = p * base + min(p, rem)
    return start, start + base + (1 if p < rem else 0)


def host_shard_indices(n_items: int) -> np.ndarray:
    """Strided index shard (balanced across hosts for heterogeneous
    per-item cost, e.g. variable image sizes)."""
    return np.arange(jax.process_index(), n_items, jax.process_count())


def local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n


def global_mesh(devices=None) -> Mesh:
    """Data-parallel mesh over every device of every host."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def global_batch(mesh: Mesh, local_tree):
    """Assemble per-host local batch shards into global arrays sharded
    along ``data``. Each host passes only its own slice; axis 0 of the
    global array is (process_count * local_batch)."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), local_tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_tree,
    )


def all_gather_objects(obj):
    """Gather an arbitrary picklable host object from every process;
    returns a list indexed by process id (eval-result collection — the
    reference's ``comm.gather``, COCO_evaluator/coco_evaluation.py:
    195-198). Uses a fixed-size byte tensor allgather over the mesh."""
    n = jax.process_count()
    if n == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj)
    # first agree on the max payload size, then gather padded bytes
    sizes = multihost_utils.process_allgather(np.asarray([len(payload)], np.int64))
    max_len = int(np.max(sizes))
    buf = np.zeros((max_len,), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)  # [n, max_len]
    out = []
    for p in range(n):
        size = int(sizes.reshape(n, -1)[p, 0])
        out.append(pickle.loads(gathered[p, :size].tobytes()))
    return out


def barrier(name: str = "barrier") -> None:
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)

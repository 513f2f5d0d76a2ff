"""Device-mesh and sharding helpers.

The TPU replacement for the reference's NCCL/DDP stack
(``cad/engine/defaults.py:67-86``, ``cad/train_net.py:174-181``): a
single ``Mesh`` over all chips with the batch sharded along ``data``;
gradients are reduced implicitly by jit under sharding constraints (XLA
inserts the psum over ICI), parameters are replicated. Per-host data
sharding replaces the reference's manual ``--start_idx/--end_idx`` job
splitting (``datasets.py:432-435``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree sharded along axis 0 over the mesh."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

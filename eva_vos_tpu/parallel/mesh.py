"""Device mesh and sharding helpers.

Replaces the reference's NCCL process-group plumbing (``util/dist.py:18-45``)
with the JAX SPMD model: one process, a named mesh, sharding annotations,
and XLA-inserted collectives over ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch pytree with the leading axis sharded."""
    sharding = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

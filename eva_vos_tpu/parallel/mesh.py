"""Device mesh and sharding helpers.

Replaces the reference's NCCL process-group plumbing (``util/dist.py:18-45``)
with the JAX SPMD model: one process, a named mesh, sharding annotations,
and XLA-inserted collectives over ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Multi-host entry point (the reference's NCCL rendezvous,
    ``util/dist.py:18-21``, re-expressed as ``jax.distributed``).

    Call once per host before any jax op; afterwards ``jax.devices()``
    spans every host's chips (ICI within a slice, DCN across slices) and
    ``make_mesh()`` builds a global mesh.  Arguments default to the
    standard env vars (``JAX_COORDINATOR_ADDRESS`` etc. / cloud TPU
    metadata); returns False (no-op) for single-process runs so callers
    can wire it unconditionally.
    """
    import os

    if num_processes is None:
        num_processes = int(os.environ.get("EVAVOS_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("EVAVOS_COORDINATOR"),
        num_processes=num_processes,
        process_id=process_id if process_id is not None
        else int(os.environ.get("EVAVOS_PROCESS_ID", "0")))
    return True


def host_shard_range(n_items: int, process_index: int | None = None,
                     process_count: int | None = None) -> tuple[int, int]:
    """Per-host contiguous [min_idx, max_idx) slice of an experiment's
    video list — the derived version of the reference's manual
    ``--min-idx/--max-idx`` sharding (``annotation_dataset.py:56-58``,
    README "run the experiments simultaneously on multiple GPUs")."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n_items // pc)
    lo = min(pi * per, n_items)
    return lo, min(lo + per, n_items)


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

"""Device-mesh helpers for sharded batch solves.

The scaling recipe (SURVEY.md §5 "distributed communication backend"): put
the instance batch axis on a 1-D mesh, annotate the batched state with a
``NamedSharding``, and let XLA insert the collectives — the only
cross-device communication ADMM needs is the all-reduce of the ``done``
flags deciding loop exit (the batched driver's ``jnp.all``), which rides
ICI.  Multi-host processes call :func:`init_distributed` first; single
process + multi-device works out of the box.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "batch_sharding", "init_distributed",
           "replicated_sharding"]


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "batch",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the instance-batch axis.

    ``n_devices=None`` uses every visible device.  For multi-host runs the
    device list spans all processes (jax.devices() is global).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "batch") -> NamedSharding:
    """Shard the leading (instance) axis over the mesh; everything else
    replicated."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (no-op when already initialized or
    single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)

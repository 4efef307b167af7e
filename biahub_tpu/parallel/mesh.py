"""Mesh construction and sharding layouts.

The reference's parallelism is an embarrassingly-parallel job fan-out over
positions/timepoints/channels with no inter-worker communication
(reference: SURVEY.md §2 "Parallelism & distribution"). The TPU-native
equivalent is one axis: a ``batch`` mesh axis over all chips, with (t, c, fov)
work units sharded along it. Collectives enter only for cross-FOV reductions
(e.g. well-averaged focus) which ride ICI via jnp means over the sharded axis.
"""

from __future__ import annotations

from functools import lru_cache

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["get_mesh", "batch_sharding", "replicated_sharding"]


@lru_cache(maxsize=None)
def get_mesh(n_devices: int | None = None) -> Mesh:
    """A 1D ``batch`` mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), ("batch",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh; replicate the rest."""
    return NamedSharding(mesh, PartitionSpec("batch"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())

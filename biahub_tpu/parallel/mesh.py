"""Mesh construction and sharding layouts.

The reference's parallelism is an embarrassingly-parallel job fan-out over
positions/timepoints/channels with no inter-worker communication
(reference: SURVEY.md §2 "Parallelism & distribution"). The TPU-native
equivalent is one axis: a ``batch`` mesh axis over this host's chips, with
(t, c, fov) work units sharded along it. Collectives enter only for
cross-FOV reductions (e.g. well-averaged focus), which ride ICI via jnp
means over the sharded axis — or DCN over the 2D ``("host", "batch")``
global mesh in multi-host runs (see :mod:`biahub_tpu.parallel.distributed`).
"""

from __future__ import annotations

from functools import lru_cache

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "get_mesh",
    "get_global_mesh",
    "batch_sharding",
    "host_batch_sharding",
    "replicated_sharding",
]


@lru_cache(maxsize=None)
def get_mesh(n_devices: int | None = None) -> Mesh:
    """A 1D ``batch`` mesh over this process's first ``n_devices`` local
    devices (default: all of them).

    Batch execution is share-nothing across hosts (each host owns a stripe of
    the work units), so the per-host compute mesh never spans DCN.
    """
    devices = jax.local_devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), ("batch",))


@lru_cache(maxsize=None)
def get_global_mesh() -> Mesh:
    """The 2D ``("host", "batch")`` mesh over every device in the runtime.

    Row h holds process h's local devices, so ``PartitionSpec("batch")``
    collectives stay on ICI and only ``"host"``-axis collectives cross DCN.
    """
    import numpy as np

    devices = np.asarray(jax.devices()).reshape(jax.process_count(), -1)
    return Mesh(devices, ("host", "batch"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh; replicate the rest."""
    return NamedSharding(mesh, PartitionSpec("batch"))


def host_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading axis over both global-mesh axes (host-major)."""
    return NamedSharding(mesh, PartitionSpec(("host", "batch")))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())

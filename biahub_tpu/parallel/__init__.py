"""Device-mesh, sharding, and multi-host helpers for batch parallelism."""

from biahub_tpu.parallel.distributed import (
    barrier,
    is_coordinator,
    maybe_initialize_distributed,
    process_count,
    process_index,
)
from biahub_tpu.parallel.mesh import (
    batch_sharding,
    get_global_mesh,
    get_mesh,
    host_batch_sharding,
    replicated_sharding,
)

__all__ = [
    "barrier",
    "batch_sharding",
    "get_global_mesh",
    "get_mesh",
    "host_batch_sharding",
    "is_coordinator",
    "maybe_initialize_distributed",
    "process_count",
    "process_index",
    "replicated_sharding",
]

"""Device-mesh and sharding helpers for batch parallelism over TPU chips."""

from biahub_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding

__all__ = ["batch_sharding", "get_mesh", "replicated_sharding"]

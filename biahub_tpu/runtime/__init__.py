"""Execution runtime: the reference's Slurm fan-out, collapsed onto devices.

Where the reference submits one Slurm job per position and a process pool per
(t, c) unit (reference: biahub/deskew.py:729-752, SURVEY.md §2), this runtime
plans (position, t, c) work units into same-shape device batches, runs them
through a jitted vmapped kernel sharded over a ``jax.sharding.Mesh``, and
streams zarr chunks in/out through tensorstore's native async I/O.
"""

from biahub_tpu.runtime.resources import (
    echo_resources,
    estimate_resources,
    settings_fingerprint,
)
from biahub_tpu.runtime.executor import (
    BatchRunner,
    resolve_cluster,
    sbatch_to_overrides,
)

__all__ = [
    "BatchRunner",
    "echo_resources",
    "estimate_resources",
    "resolve_cluster",
    "sbatch_to_overrides",
    "settings_fingerprint",
]

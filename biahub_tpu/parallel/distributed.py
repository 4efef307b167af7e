"""Multi-host execution over DCN: the plate-scale analog of the Slurm array.

The reference scales past one node by fanning one Slurm job per position with
``slurm_array_parallelism=100`` (reference: biahub/deskew.py:722-752); workers
share nothing and coordinate through the zarr store. The TPU-native analog is
a multi-process JAX runtime: every host runs the same verb, owns a
deterministic stripe of the (position, t, c) work units (``BatchRunner``
stripes them by ``jax.process_index()``), performs its own zarr I/O against
the shared store — the same data plane as the reference — and computes on its
local chips. The global ``("host", "batch")`` mesh exists for the few
cross-FOV collectives (well-averaged statistics), which ride DCN.

Launch: run the same CLI command on every host with either the standard
cluster auto-detection (TPU pods: ``jax.distributed.initialize()`` with no
arguments) or explicit coordinates::

    BIAHUB_TPU_COORDINATOR=host0:8476 \
    BIAHUB_TPU_NUM_PROCESSES=4 \
    BIAHUB_TPU_PROCESS_ID=$SLURM_PROCID  biahub deskew ...

Create the output plate once (``--init`` on the coordinator, exactly the
reference's Nextflow init-phase contract) or rely on idempotent plate
creation plus ``barrier()``.
"""

from __future__ import annotations

import os

import jax

__all__ = [
    "maybe_initialize_distributed",
    "process_index",
    "process_count",
    "is_coordinator",
    "barrier",
]

_INITIALIZED = False


def _int_env(name: str) -> int | None:
    value = os.environ.get(name)
    return int(value) if value is not None else None


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize ``jax.distributed`` once, from arguments or environment.

    Environment: ``BIAHUB_TPU_COORDINATOR`` (host:port),
    ``BIAHUB_TPU_NUM_PROCESSES``, ``BIAHUB_TPU_PROCESS_ID``; or set
    ``BIAHUB_TPU_DISTRIBUTED=auto`` on a TPU pod / managed cluster to let JAX
    auto-detect the coordinator. Returns True when a multi-process runtime is
    active. Must run before the first JAX computation.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    try:
        from jax._src import distributed as _jax_distributed

        if _jax_distributed.global_state.client is not None:
            # Another entry point (a test harness, an embedding application)
            # brought the runtime up already; adopt it.
            _INITIALIZED = True
            return jax.process_count() > 1
    except Exception:  # pragma: no cover - private-API drift
        pass
    coordinator_address = coordinator_address or os.environ.get(
        "BIAHUB_TPU_COORDINATOR"
    )
    num_processes = (
        num_processes
        if num_processes is not None
        else _int_env("BIAHUB_TPU_NUM_PROCESSES")
    )
    process_id = (
        process_id if process_id is not None else _int_env("BIAHUB_TPU_PROCESS_ID")
    )
    if coordinator_address is not None:
        if num_processes is None or process_id is None:
            raise RuntimeError(
                "BIAHUB_TPU_COORDINATOR is set but the process coordinates "
                "are incomplete: also export BIAHUB_TPU_NUM_PROCESSES and "
                "BIAHUB_TPU_PROCESS_ID (or unset the coordinator for a "
                "single-host run)."
            )
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif os.environ.get("BIAHUB_TPU_DISTRIBUTED") == "auto":
        jax.distributed.initialize()
    else:
        return False
    _INITIALIZED = True
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    """True on the process that should perform once-per-run work (plate
    creation, config echo) — the analog of the reference's login node."""
    return jax.process_index() == 0


_BARRIER_SEQ = 0


def barrier(name: str = "biahub-barrier", timeout_s: float | None = None) -> None:
    """Block until every process reaches this point (no-op single-process).

    Used around output-plate creation so workers never write into a store the
    coordinator has not finished initializing.

    Bounded: when a peer dies (preemption, OOM-kill), waiting forever would
    stall the whole fleet — the reference gets its resilience from Nextflow's
    preemption retries (reference: nextflow/nextflow.config:36-56); here the
    survivor fails fast after ``timeout_s`` (default
    ``BIAHUB_TPU_BARRIER_TIMEOUT_S``, 600 s) with an actionable error, and a
    restarted run resumes from the per-unit progress records
    (io/progress.py). Barrier ids get a per-process sequence suffix; every
    process must call barriers in the same order (which the blocking
    semantics require anyway), so the suffixes agree.
    """
    global _BARRIER_SEQ
    if jax.process_count() <= 1:
        return
    if timeout_s is None:
        timeout_s = float(os.environ.get("BIAHUB_TPU_BARRIER_TIMEOUT_S", "600"))
    client = None
    try:
        from jax._src import distributed as _jax_distributed

        client = _jax_distributed.global_state.client
    except Exception:  # pragma: no cover - private-API drift
        client = None
    if client is None:  # pragma: no cover - adopted runtimes without a client
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
        return
    _BARRIER_SEQ += 1
    try:
        client.wait_at_barrier(f"{name}-{_BARRIER_SEQ}", int(timeout_s * 1000))
    except Exception as exc:
        msg = str(exc)
        timed_out = "DEADLINE" in msg.upper() or "TIME" in msg.upper()
        if timed_out:
            raise RuntimeError(
                f"barrier {name!r} timed out after {timeout_s:.0f} s — a "
                f"peer process likely died (preempted/OOM). This process is "
                f"exiting so the fleet fails fast instead of hanging; "
                f"restart the run on all hosts and finished units will be "
                f"skipped via the resume records. (Tune with "
                f"BIAHUB_TPU_BARRIER_TIMEOUT_S.)"
            ) from exc
        # Non-timeout failures (connection reset, invalid barrier state)
        # keep the real error front and center — misreporting them as a
        # peer death sends the operator hunting the wrong problem.
        raise RuntimeError(f"barrier {name!r} failed: {msg}") from exc

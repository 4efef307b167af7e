"""Opt-in tracing and per-batch timing.

The reference's observability is ad-hoc ``time.time()`` deltas plus the
Nextflow trace reports (reference: SURVEY.md §5.1). Here a single env var
turns on structured per-batch timing and, when a directory is given, a JAX
profiler trace viewable in TensorBoard/Perfetto:

    BIAHUB_TPU_PROFILE=1            # timing lines on stderr
    BIAHUB_TPU_PROFILE=/tmp/trace   # timing lines + device trace to that dir
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

__all__ = ["profiled_section", "profiling_enabled", "batch_timer"]


def profiling_enabled() -> bool:
    return bool(os.environ.get("BIAHUB_TPU_PROFILE"))


def _trace_dir() -> str | None:
    value = os.environ.get("BIAHUB_TPU_PROFILE", "")
    return value if value and value != "1" else None


@contextlib.contextmanager
def profiled_section(name: str):
    """Wrap a whole verb run: device trace (if a dir is set) + wall time."""
    if not profiling_enabled():
        yield
        return
    trace_dir = _trace_dir()
    start = time.perf_counter()
    if trace_dir is not None:
        import jax

        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
    print(
        f"[biahub-tpu profile] {name}: {time.perf_counter() - start:.3f}s",
        file=sys.stderr,
    )


@contextlib.contextmanager
def batch_timer(label: str, n_units: int, unit_bytes: int):
    """Per-batch timing line: units, effective bandwidth, wall time."""
    if not profiling_enabled():
        yield
        return
    start = time.perf_counter()
    yield
    elapsed = time.perf_counter() - start
    gbps = n_units * unit_bytes / max(elapsed, 1e-9) / 2**30
    print(
        f"[biahub-tpu profile] {label}: {n_units} units in {elapsed:.3f}s "
        f"({gbps:.2f} GiB/s input)",
        file=sys.stderr,
    )

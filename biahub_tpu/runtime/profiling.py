"""Opt-in tracing and per-batch timing.

The reference's observability is ad-hoc ``time.time()`` deltas plus the
Nextflow trace reports (reference: SURVEY.md §5.1). Here a single env var
turns on structured per-batch timing and, when a directory is given, a JAX
profiler trace viewable in TensorBoard/Perfetto:

    BIAHUB_TPU_PROFILE=1            # timing lines on stderr
    BIAHUB_TPU_PROFILE=/tmp/trace   # timing lines + device trace to that dir

With a trace directory, the end of the section also prints a per-fusion
device-time table parsed straight from the trace (no TensorBoard needed) —
the view that located every hot spot during kernel development: fused
Pallas calls, XLA copies/transposes, and their share of device time.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

__all__ = [
    "profiled_section",
    "profiling_enabled",
    "batch_timer",
    "summarize_device_trace",
]


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
    if trace_dir is not None:
        try:
            summarize_device_trace(trace_dir)
        except Exception as exc:  # pragma: no cover - trace format drift
            print(f"[biahub-tpu profile] trace summary failed: {exc!r}",
                  file=sys.stderr)


def summarize_device_trace(trace_dir: str, top: int = 15, file=None) -> list:
    """Per-fusion device-time table from the newest trace under ``trace_dir``.

    Parses the trace-viewer JSON the JAX profiler writes (works over the
    axon tunnel, where TensorBoard is unavailable) and prints the ``top``
    device-side ops by total duration. Returns the full (name, total_ms,
    count) list for programmatic use.
    """
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    totals: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e.get("pid"), ""):
            totals[e["name"]] += e["dur"] / 1000.0
            counts[e["name"]] += 1
    rows = sorted(
        ((name, ms, counts[name]) for name, ms in totals.items()),
        key=lambda r: -r[1],
    )
    out = file or sys.stderr
    print("[biahub-tpu profile] device time by op:", file=out)
    for name, ms, count in rows[:top]:
        print(f"  {ms:9.2f} ms  x{count:4d}  {name[:80]}", file=out)
    return rows


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

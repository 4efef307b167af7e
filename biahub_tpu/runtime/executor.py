"""The batch executor: device batching replaces the Slurm/process-pool fan-out.

The reference's execution model is one Slurm job per position, each running a
process pool over (t, c) units (reference: biahub/deskew.py:729-752 and
iohub's ``process_single_position``). Here a single controller enumerates the
same (position, t, c) work units, groups same-shape units into batches, and
runs them through a jitted, vmapped kernel whose batch axis is sharded across
all local devices. tensorstore reads are prefetched one batch ahead and
writes are asynchronous; per-unit completion is recorded only after the
write future resolves (crash-safe resume).

``--cluster`` compatibility: ``debug`` runs fully synchronously (every batch
flushed before the next), ``local`` is the default pipelined mode, and
``slurm`` is accepted with a warning and behaves like ``local`` — there is no
job scheduler between the controller and the chips anymore.

Multi-host: when a ``jax.distributed`` runtime is active (see
:mod:`biahub_tpu.parallel.distributed`), every process runs the same verb and
``run_units`` deterministically stripes the work units by
``jax.process_index()`` — share-nothing across hosts with per-host zarr I/O,
the TPU analog of the reference's 100-wide Slurm array
(reference: biahub/deskew.py:722-752).
"""

from __future__ import annotations

import os
import threading
import time as _time
import traceback
import warnings
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import numpy as np

from biahub_tpu.io.ngff import Position
from biahub_tpu.io.progress import ProgressStore
from biahub_tpu.runtime.profiling import batch_timer
from biahub_tpu.parallel.mesh import batch_sharding, get_mesh

__all__ = [
    "resolve_cluster",
    "sbatch_to_overrides",
    "BatchRunner",
    "WorkUnit",
    "PositionJob",
]

# Default cap on the device-resident batch: input + output arrays both live in
# HBM during a step (TPU v5e has 16 GB); leave room for XLA temporaries.
# 4 GiB admits 8 flagship volumes per step (~440 MB in+out each), which
# amortizes the per-dispatch tunnel overhead ~6% better than 4-volume
# batches (bench.py --batch sweep); donation reuses the input HBM.
DEFAULT_MAX_BATCH_BYTES = 4 * 2**30


_CACHE_ENABLED = False


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across CLI invocations.

    Every biahub verb is a separate process; without this, each run repays the
    full TPU compile (tens of seconds to minutes for large batched programs).
    Opt out with BIAHUB_TPU_NO_COMPILE_CACHE=1.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED or os.environ.get("BIAHUB_TPU_NO_COMPILE_CACHE") == "1":
        return
    cache_dir = os.environ.get(
        "BIAHUB_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "biahub_tpu", "jax_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
    _CACHE_ENABLED = True


def stripe_units(units: Sequence, label: str = "units") -> list:
    """This process's share of a deterministically-enumerated work list.

    The multi-host ownership rule used by ``BatchRunner.run_units`` —
    ``units[i::n_proc]`` of the SAME caller-enumerated sequence — exposed
    for verb-level loops (over-HBM chunked fallbacks) that execute outside
    the runner but must honor the same contract.
    """
    units = list(units)
    n_proc = jax.process_count()
    if n_proc <= 1:
        return units
    pidx = jax.process_index()
    share = units[pidx::n_proc]
    print(
        f"multi-host: process {pidx + 1}/{n_proc} owns "
        f"{len(share)}/{len(units)} {label}"
    )
    return share


def resolve_cluster(cluster: str | None = None, local: bool = False) -> str:
    """Resolve the execution mode. CI forces 'debug'; explicit value wins.

    Mirrors the reference's cluster resolution (reference:
    biahub/cli/utils.py:79-92) so tests exercise the in-process path.
    """
    if os.environ.get("CI") == "true":
        return "debug"
    if cluster is not None:
        if cluster == "slurm":
            warnings.warn(
                "cluster='slurm' is accepted for compatibility but biahub-tpu "
                "runs on-device batches from a single controller; running locally.",
                stacklevel=2,
            )
            return "local"
        return cluster
    # The reference defaults to slurm unless --local is passed (reference:
    # biahub/cli/utils.py:79-92); with on-device batches there is no scheduler
    # between the controller and the chips, so both default to the pipelined
    # in-process mode.
    return "local"


def sbatch_to_overrides(filepath: str | Path) -> dict:
    """Parse '#SBATCH --key=value' / '#LOCAL --key=value' override lines.

    Kept for CLI compatibility (reference: biahub/cli/parsing.py:198-249);
    the returned dict is surfaced in logs but no longer feeds a scheduler.
    """
    overrides: dict[str, Any] = {}
    with open(filepath) as f:
        for line in f:
            for keyword in ("SBATCH", "LOCAL"):
                prefix = f"#{keyword} --"
                if line.startswith(prefix):
                    body = line[len(prefix) :].strip()
                    key, value = body.split("=", 1)
                    key = key.replace("-", "_").strip()
                    try:
                        parsed: Any = int(value.strip())
                    except ValueError:
                        parsed = value.strip()
                    if keyword == "SBATCH":
                        overrides["slurm_" + key] = parsed
                    else:
                        overrides[key] = parsed
    return overrides


@dataclass(frozen=True)
class WorkUnit:
    """One ZYX (or CZYX) volume to process: a (position, t, c) coordinate.

    ``t_out`` lets verbs that select a subset of timepoints write them
    contiguously (output time = enumeration index); None means t_out == t.
    """

    pos_idx: int
    t: int
    c_in: int | tuple[int, ...]
    c_out: int | tuple[int, ...]
    t_out: int | None = None

    @property
    def out_t(self) -> int:
        return self.t if self.t_out is None else self.t_out


@dataclass
class _Group:
    shape: tuple[int, ...]
    units: list[WorkUnit] = field(default_factory=list)


class PositionJob:
    """Job facade over one position's work units.

    The monitorable analog of the reference's one-submitit-job-per-position
    (reference: biahub/cli/monitor.py:91-150 polls ``job.state``): PENDING →
    RUNNING → COMPLETED/FAILED/CANCELLED as the batch executor progresses.
    ``cancel()`` requests the whole run to stop at the next batch boundary.
    """

    def __init__(self, name: str, n_units: int, cancel_event: threading.Event):
        self.name = name
        self.n_units = n_units
        self.n_done = 0
        self.state = "PENDING"
        self.error: str | None = None
        self._cancel_event = cancel_event

    def done(self) -> bool:
        return self.state in ("COMPLETED", "FAILED", "CANCELLED")

    def cancel(self) -> None:
        self._cancel_event.set()
        if not self.done():
            self.state = "CANCELLED"

    def _unit_done(self) -> None:
        self.n_done += 1
        if self.n_done >= self.n_units:
            self.state = "COMPLETED"

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"PositionJob({self.name}, {self.state}, {self.n_done}/{self.n_units})"


class RunCancelled(RuntimeError):
    """Raised when a monitored run is cancelled via ctrl-C / job.cancel()."""


class BatchRunner:
    """Runs a jittable per-volume kernel over plate work units in device batches.

    Parameters
    ----------
    cluster : 'debug' | 'local'
        'debug' synchronizes after every batch; 'local' pipelines reads,
        compute, and writes.
    max_batch_bytes : int
        HBM budget for one batch of input volumes (float32).
    mesh : jax.sharding.Mesh, optional
        Mesh whose first axis the batch dimension is sharded over. Defaults to
        a 1D mesh over all local devices.
    """

    def __init__(
        self,
        cluster: str = "local",
        max_batch_bytes: int | None = None,
        mesh=None,
    ):
        self.cluster = cluster
        if max_batch_bytes is None:
            max_batch_bytes = int(
                os.environ.get("BIAHUB_TPU_MAX_BATCH_BYTES", DEFAULT_MAX_BATCH_BYTES)
            )
        self.max_batch_bytes = max_batch_bytes
        self.mesh = mesh if mesh is not None else get_mesh()
        self._jit_cache: dict[int, Callable] = {}
        self.jobs: dict[int, PositionJob] = {}
        self._cancel = threading.Event()
        # Wall-time split of the last run_units call (read/device/write, byte
        # counts) — the sustained-throughput bench's data source.
        self.last_stats: dict | None = None
        _enable_compilation_cache()

    # -- planning ------------------------------------------------------------

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size

    def _batch_size(
        self,
        unit_shape: tuple[int, ...],
        n_units: int,
        out_bytes: int = 0,
        workspace_bytes: int = 0,
        in_itemsize: int = 4,
    ) -> int:
        # Budget the input AND output footprint: outputs can dwarf inputs
        # (keep-overhang deskew emits ~9x the input voxels), and sizing on
        # input alone exhausts HBM at production volume sizes. Kernels with
        # large internal working sets (the multipass warp's common frame)
        # declare them via workspace_bytes — invisible to shape tracing.
        # Non-f32 inputs ship to the device in their native dtype (half the
        # transfer bytes for uint16 camera data) and are cast to f32 on
        # device; the cast copy materializes before the first Pallas call,
        # so such units cost itemsize + 4 bytes/voxel of input-side HBM.
        in_bpv = in_itemsize + (4 if in_itemsize != 4 else 0)
        unit_bytes = (
            int(np.prod(unit_shape)) * in_bpv + int(out_bytes) + int(workspace_bytes)
        )
        # Pipelined mode dispatches one chunk ahead of the blocking result
        # fetch, so up to two chunks' footprints coexist in HBM — halve the
        # per-chunk budget there. 'debug' flushes synchronously (one chunk).
        budget = self.max_batch_bytes
        if self.cluster != "debug":
            budget //= 2
        by_mem = max(1, budget // max(unit_bytes, 1))
        b = int(min(n_units, by_mem))
        # Round up to a multiple of the device count so sharding stays even;
        # padding units are dropped after compute.
        nd = self.n_devices
        if b % nd:
            b = min(((b + nd - 1) // nd) * nd, ((n_units + nd - 1) // nd) * nd)
        return max(b, 1)

    def _unit_output_bytes(self, kernel, group, per_unit_params,
                           broadcast=None) -> int:
        """Per-unit output footprint via an abstract trace (no compute)."""
        example = per_unit_params(group.units[0]) if per_unit_params else {}
        try:
            out = jax.eval_shape(
                lambda v: kernel(v, **example, **(broadcast or {})),
                jax.ShapeDtypeStruct(group.shape, np.float32),
            )
            return sum(
                int(np.prod(leaf.shape)) * leaf.dtype.itemsize
                for leaf in jax.tree_util.tree_leaves(out)
            )
        except Exception:  # non-traceable kernel: assume output matches input
            return int(np.prod(group.shape)) * 4

    def _put_broadcast(self, broadcast_params):
        """Device-put per-acquisition kernel arrays ONCE (replicated on
        multi-device meshes). These must thread through jit as ARGUMENTS:
        a closed-over device array becomes an HLO constant, which bloats
        the executable and can exceed compile-service request limits
        (measured: a ~250 MB spectral-deskew table closure drew HTTP 413
        from the remote compiler)."""
        if not broadcast_params:
            return {}
        if self.n_devices > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            sh = NamedSharding(self.mesh, PartitionSpec())
            return {
                k: (jax.device_put(v, sh) if v is not None else None)
                for k, v in broadcast_params.items()
            }
        return {
            k: (jax.device_put(v) if v is not None else None)
            for k, v in broadcast_params.items()
        }

    def _jitted(self, kernel: Callable, param_names: tuple[str, ...],
                broadcast_names: tuple[str, ...] = ()) -> Callable:
        key = (id(kernel), param_names, broadcast_names)
        if key not in self._jit_cache:
            n_p = len(param_names)

            # Kernels that ingest camera dtypes natively (their Pallas
            # pass converts in VMEM — e.g. the fused deconvolve chain's
            # pass A) declare it via a `native_ingest_dtypes` attribute;
            # everything else gets the device-side f32 cast here.
            native = tuple(
                np.dtype(d)
                for d in getattr(kernel, "native_ingest_dtypes", ())
            )

            # Kernels with a `batched_impl` attribute take the whole batch
            # in one call instead of vmap — the fused chain's manual-DMA
            # Pallas kernels need the batch axis on their grid (Pallas
            # forbids the non-trivial ANY-space indexing vmap would need;
            # kernels/chain.py deconvolve_deskew_warp_batched). Only on a
            # single device: the batch grid axis cannot be SPMD-partitioned,
            # so sharded meshes keep the vmapped form. Per-unit traced
            # params (per-timepoint matrices) never coexist with an impl
            # today; guard anyway.
            impl = (
                getattr(kernel, "batched_impl", None)
                if self.n_devices == 1 and n_p == 0
                else None
            )

            def batched(volumes, *args):
                params, bs = args[:n_p], args[n_p:]
                # Device-side ingest cast: volumes arrive in the store's
                # native dtype (uint16 for mantis camera data — half the
                # host->device bytes of a host-side f32 cast; reference
                # reads camera dtype natively, biahub/deskew.py:554-582).
                # Exact for uint16 -> f32; a no-op for f32 input.
                if np.dtype(volumes.dtype) not in native:
                    volumes = volumes.astype(np.float32)
                if impl is not None:
                    return impl(volumes, **dict(zip(broadcast_names, bs)))
                return jax.vmap(
                    lambda v, *p: kernel(
                        v,
                        **dict(zip(param_names, p)),
                        **dict(zip(broadcast_names, bs)),
                    )
                )(volumes, *params)

            # Donating the input batch lets XLA reuse its HBM for outputs —
            # material headroom when outputs are larger than inputs (deskew).
            # Donation only helps (and only avoids a compile warning) when
            # the ingest dtype matches the f32 compute dtype, so it is keyed
            # per input dtype: uint16 camera batches skip it (their HBM is
            # freed at the cast instead).
            # On TPU the jit RESULT layouts are pinned to row-major default:
            # left to itself, XLA's layout assignment picks a zero-padding
            # result layout for non-128-multiple minor dims and inserts a
            # full-volume copy after the final Pallas kernel (~1 ms/volume
            # on the warp chains, measured via scripts/probe_outlayout.py);
            # the kernels already emit default-layout buffers.
            cell: dict = {}

            def lazy_jit(volumes, *params):
                donate = (0,) if volumes.dtype == np.float32 else ()
                fn = cell.get(donate)
                if fn is None:
                    if jax.default_backend() == "tpu":
                        try:
                            from jax.experimental.layout import Format, Layout

                            out_tree = jax.eval_shape(
                                batched, volumes, *params
                            )
                            if self.n_devices > 1:
                                sh = batch_sharding(self.mesh)
                            else:
                                sh = jax.sharding.SingleDeviceSharding(
                                    jax.local_devices()[0]
                                )
                            outs = jax.tree_util.tree_map(
                                lambda s: Format(
                                    Layout(tuple(range(s.ndim))), sh
                                ),
                                out_tree,
                            )
                            fn = jax.jit(
                                batched,
                                donate_argnums=donate,
                                out_shardings=outs,
                            )
                        except Exception:
                            fn = None
                    if fn is None:
                        fn = jax.jit(batched, donate_argnums=donate)
                    cell[donate] = fn
                return fn(volumes, *params)

            self._jit_cache[key] = lazy_jit
        return self._jit_cache[key]

    # -- execution -----------------------------------------------------------

    def run_units(
        self,
        kernel: Callable,
        units: Sequence[WorkUnit],
        input_positions: Sequence[Position],
        output_positions: Sequence[Position],
        out_dtype=None,
        resume: bool = False,
        resume_token: str = "",
        per_unit_params: Callable[[WorkUnit], dict[str, np.ndarray]] | None = None,
        progress_label: str = "",
        monitor: bool = False,
        unit_workspace_bytes: int = 0,
        post_fetch: Callable[[np.ndarray], np.ndarray] | None = None,
        broadcast_params: dict | None = None,
    ) -> int:
        """Process work units; returns the number of units computed.

        ``kernel`` maps one ZYX (c_in is an int) or CZYX (c_in is a tuple)
        volume to its output volume and must be jittable; per-unit traced
        parameters (e.g. a per-timepoint transform) come from
        ``per_unit_params``. ``broadcast_params`` carries per-ACQUISITION
        kernel arrays (transfer functions, prepared filters, lerp tables)
        shared by every unit: they are device-put once and threaded through
        jit as traced arguments — closing over them instead would embed
        them as HLO constants (see :meth:`_put_broadcast`). ``unit_workspace_bytes`` declares the kernel's
        per-unit internal working set (e.g. the multipass warp's common
        frame) so batch sizing doesn't overcommit HBM on intermediates that
        shape tracing can't see. ``post_fetch`` transforms each unit's numpy
        result before the zarr write — for index-space rearrangements that
        are free as host views but cost a device pass (e.g. deskew's
        coverslip flip, ~1 ms/volume as an XLA rev).

        ``monitor=True`` runs the batches on a worker thread while the calling
        thread renders a live per-position job table (ctrl-C cancels the run
        at the next batch boundary; reference: biahub/cli/monitor.py:91-150).
        The table is also exposed as ``self.jobs`` for programmatic polling.
        """
        # Multi-host striping: each process owns units[i::n_proc] of the SAME
        # caller-enumerated list, so ownership is disjoint and exhaustive
        # without coordination. Striping precedes resume filtering — filtering
        # first would let a process that observes another's fresh progress
        # records compute a different stripe, orphaning units.
        units = stripe_units(units)
        all_units = units
        progress: dict[int, ProgressStore] = {}
        if resume:
            for u in units:
                if u.pos_idx not in progress:
                    progress[u.pos_idx] = ProgressStore(
                        output_positions[u.pos_idx].path, resume_token
                    )
            remaining = [
                u
                for u in units
                if not progress[u.pos_idx].is_done(u.out_t, _c_key(u.c_out))
            ]
            skipped = len(units) - len(remaining)
            if skipped:
                print(f"Resume: skipping {skipped} finished units")
            units = remaining

        # Per-position job facades (even without --monitor: observability).
        self._cancel = threading.Event()
        remaining_per_pos: dict[int, int] = {}
        for u in units:
            remaining_per_pos[u.pos_idx] = remaining_per_pos.get(u.pos_idx, 0) + 1
        self.jobs = {}
        for u in all_units:
            if u.pos_idx in self.jobs:
                continue
            n_rem = remaining_per_pos.get(u.pos_idx, 0)
            job = PositionJob(
                _position_name(output_positions[u.pos_idx]), n_rem, self._cancel
            )
            if n_rem == 0:
                job.state = "COMPLETED"  # fully covered by resume records
            self.jobs[u.pos_idx] = job

        if not units:
            return 0
        if not monitor:
            return self._execute(
                kernel, units, input_positions, output_positions,
                out_dtype, resume, progress, per_unit_params,
                int(unit_workspace_bytes), post_fetch, broadcast_params,
            )

        from biahub_tpu.cli.monitor import monitor_jobs

        result: dict[str, Any] = {}

        def work():
            try:
                result["n"] = self._execute(
                    kernel, units, input_positions, output_positions,
                    out_dtype, resume, progress, per_unit_params,
                    int(unit_workspace_bytes), post_fetch, broadcast_params,
                )
            except RunCancelled:
                result["n"] = 0
            except Exception as exc:  # noqa: BLE001 - surfaced via the table
                result["error"] = exc
                tb = traceback.format_exc()
                failed_any = False
                for job in self.jobs.values():
                    if job.state == "RUNNING":
                        job.state = "FAILED"
                        job.error = tb
                        failed_any = True
                for job in self.jobs.values():
                    if not job.done():
                        if not failed_any:
                            # Failure before any unit ran (e.g. during batch
                            # planning): pin it on the first pending job so
                            # the table dumps the error.
                            job.state = "FAILED"
                            job.error = tb
                            failed_any = True
                        else:
                            job.state = "CANCELLED"

        worker = threading.Thread(target=work, name="biahub-batch-runner")
        worker.start()
        try:
            monitor_jobs(
                list(self.jobs.values()),
                [j.name for j in self.jobs.values()],
                poll_seconds=0.2,
            )
        finally:
            self._cancel_if_interrupted()
            worker.join()
        if "error" in result:
            raise result["error"]
        return int(result.get("n", 0))

    def _cancel_if_interrupted(self) -> None:
        # monitor_jobs re-raises KeyboardInterrupt after cancelling the job
        # facades; cancelling any job sets the shared event, which the batch
        # loop polls at every batch boundary.
        if any(j.state == "CANCELLED" for j in self.jobs.values()):
            self._cancel.set()

    def _execute(
        self,
        kernel: Callable,
        units: list[WorkUnit],
        input_positions: Sequence[Position],
        output_positions: Sequence[Position],
        out_dtype,
        resume: bool,
        progress: dict[int, ProgressStore],
        per_unit_params,
        unit_workspace_bytes: int = 0,
        post_fetch=None,
        broadcast_params: dict | None = None,
    ) -> int:
        broadcast = self._put_broadcast(broadcast_params)
        b_names = tuple(sorted(broadcast))
        # Group by input volume shape AND dtype — ragged positions can't
        # share a batch, and the device-side ingest cast means dtype is part
        # of the compiled program's signature.
        groups: dict[tuple, _Group] = {}
        for u in units:
            shape = _unit_shape(input_positions[u.pos_idx], u)
            dtype = np.dtype(input_positions[u.pos_idx].data.dtype)
            groups.setdefault((shape, dtype), _Group(shape)).units.append(u)

        sharding = batch_sharding(self.mesh) if self.n_devices > 1 else None
        n_done = 0
        pending_writes: list[tuple[Any, WorkUnit]] = []
        # Pipeline stats for the sustained-throughput bench: wall split into
        # time blocked on store reads, dispatch (host->device put + async
        # jit call), fetch (blocking device->host result transfer), and time
        # blocked on store writes; byte counts for host-I/O bandwidth.
        # Exposed as self.last_stats after every run.
        stats = {
            "read_wait_s": 0.0, "dispatch_s": 0.0, "fetch_s": 0.0,
            "write_wait_s": 0.0,
            "bytes_read": 0, "bytes_written": 0, "wall_s": 0.0, "n_units": 0,
        }
        # Back-compat alias consumed as "time in the device step".
        self.last_stats = stats
        wall_t0 = _time.perf_counter()

        def _flush(inflight):
            """Complete one dispatched chunk: blocking result fetch, host
            post-processing, async store writes, bounded write drain."""
            nonlocal n_done, pending_writes
            result, f_chunk, f_pad, f_B, f_n_chunks, f_ci, f_bytes = inflight
            t_fetch = _time.perf_counter()
            with batch_timer(
                f"batch {f_ci + 1}/{f_n_chunks}", len(f_chunk), f_bytes
            ):
                result_np = np.asarray(result)
            stats["fetch_s"] += _time.perf_counter() - t_fetch
            if f_pad:
                result_np = result_np[: len(f_chunk)]
            for i, u in enumerate(f_chunk):
                out_pos = output_positions[u.pos_idx]
                out_arr = out_pos["0"]
                data = result_np[i]
                if post_fetch is not None:
                    data = post_fetch(data)
                if out_dtype is not None:
                    data = data.astype(out_dtype)
                else:
                    data = data.astype(out_arr.dtype)
                future = out_arr.write_async((u.out_t, _c_index(u.c_out)), data)
                stats["bytes_written"] += data.nbytes
                pending_writes.append((future, u))
            n_done += len(f_chunk)

            # Bounded write window: in pipelined mode keep at most one
            # batch of writes in flight; everything older is drained NOW
            # and its resume record committed, so a crash mid-run loses at
            # most the in-flight batches of progress (not the whole run).
            keep = f_B if self.cluster != "debug" else 0
            t_write = _time.perf_counter()
            pending_writes = self._drain(
                pending_writes, progress, resume, keep=keep
            )
            stats["write_wait_s"] += _time.perf_counter() - t_write

        for (_, in_dtype), group in groups.items():
            B = self._batch_size(
                group.shape,
                len(group.units),
                self._unit_output_bytes(kernel, group, per_unit_params,
                                        broadcast),
                unit_workspace_bytes,
                in_itemsize=int(in_dtype.itemsize),
            )
            chunks = [
                group.units[i : i + B] for i in range(0, len(group.units), B)
            ]
            # Prefetch: start reads for the next chunk before computing this one.
            read_futures = _start_reads(chunks[0], input_positions)
            unit_bytes = int(np.prod(group.shape)) * int(in_dtype.itemsize)
            # Dispatch-ahead pipelining: chunk i+1 is put + dispatched BEFORE
            # chunk i's blocking result fetch, so the host->device transfer
            # and compute of i+1 overlap the device->host fetch of i (jit
            # calls are async; device execution is ordered). Transfer is the
            # production bottleneck — at PCIe rates a flagship volume moves
            # in ~13 ms against 5.2 ms of compute — so the overlap, not the
            # kernel, sets the sustained zarr->zarr rate. 'debug' mode
            # flushes synchronously (tests, bit-stable ordering).
            inflight = None
            for ci, chunk in enumerate(chunks):
                if self._cancel.is_set():
                    if inflight is not None:
                        _flush(inflight)
                    self._drain(pending_writes, progress, resume)
                    raise RunCancelled("batch run cancelled")
                for u in chunk:
                    job = self.jobs.get(u.pos_idx)
                    if job is not None and job.state == "PENDING":
                        job.state = "RUNNING"
                # Stack in the store's NATIVE dtype: the f32 cast happens on
                # device (see _jitted), halving host->device transfer bytes
                # for uint16 camera data and skipping a host copy per batch.
                t_read = _time.perf_counter()
                volumes = np.stack([np.asarray(f.result()) for f in read_futures])
                stats["read_wait_s"] += _time.perf_counter() - t_read
                stats["bytes_read"] += volumes.nbytes
                if ci + 1 < len(chunks):
                    read_futures = _start_reads(chunks[ci + 1], input_positions)

                params: dict[str, np.ndarray] = {}
                if per_unit_params is not None:
                    per_unit = [per_unit_params(u) for u in chunk]
                    for name in per_unit[0]:
                        params[name] = np.stack([p[name] for p in per_unit])

                # Pad EVERY chunk to the full batch size so one compiled
                # program serves the whole group (ragged tail batches would
                # otherwise trigger a fresh XLA compile each).
                pad = B - len(chunk) if len(chunks) > 1 else 0
                if sharding and (len(chunk) + pad) % self.n_devices:
                    pad += -(len(chunk) + pad) % self.n_devices
                if pad:
                    volumes = np.concatenate([volumes, volumes[-1:].repeat(pad, 0)])
                    for name in params:
                        params[name] = np.concatenate(
                            [params[name], params[name][-1:].repeat(pad, 0)]
                        )

                fn = self._jitted(kernel, tuple(sorted(params)), b_names)
                args = [params[k] for k in sorted(params)]
                args += [broadcast[k] for k in b_names]
                t_dev = _time.perf_counter()
                # Always materialize on device: input donation only frees
                # HBM for a device-resident committed array (and donating
                # a host numpy arg would just warn).
                volumes = jax.device_put(
                    volumes, sharding if sharding is not None else None
                )
                result = fn(volumes, *args)
                stats["dispatch_s"] += _time.perf_counter() - t_dev

                if inflight is not None:
                    _flush(inflight)
                inflight = (result, chunk, pad, B, len(chunks), ci, unit_bytes)
                if self.cluster == "debug":
                    _flush(inflight)
                    inflight = None

            if inflight is not None:
                _flush(inflight)

        t_write = _time.perf_counter()
        self._drain(pending_writes, progress, resume)
        stats["write_wait_s"] += _time.perf_counter() - t_write
        stats["wall_s"] = _time.perf_counter() - wall_t0
        stats["n_units"] = n_done
        return n_done

    def _drain(self, pending, progress, resume, keep: int = 0):
        """Resolve pending write futures oldest-first until ≤ ``keep`` remain,
        marking each unit's resume record only after its write is durable."""
        n_drain = max(0, len(pending) - keep)
        for future, u in pending[:n_drain]:
            future.result()
            if resume and u.pos_idx in progress:
                progress[u.pos_idx].mark_done(u.out_t, _c_key(u.c_out))
            job = self.jobs.get(u.pos_idx) if hasattr(self, "jobs") else None
            if job is not None:
                job._unit_done()
        return pending[n_drain:]

    # -- conveniences ----------------------------------------------------------

    def run_zyx(
        self,
        kernel: Callable,
        input_positions: Sequence[Position],
        output_positions: Sequence[Position],
        channel_pairs: Sequence[tuple[int, int]] | None = None,
        time_indices: Sequence[int] | str = "all",
        **kwargs,
    ) -> int:
        """Run a ZYX kernel over every (t, c) unit of each position."""
        units = []
        for p_idx, in_pos in enumerate(input_positions):
            T, C = in_pos.data.shape[:2]
            ts = range(T) if time_indices == "all" else time_indices
            pairs = channel_pairs if channel_pairs is not None else [(c, c) for c in range(C)]
            for t_out, t in enumerate(ts):
                for c_in, c_out in pairs:
                    units.append(WorkUnit(p_idx, int(t), int(c_in), int(c_out), int(t_out)))
        return self.run_units(kernel, units, input_positions, output_positions, **kwargs)

    def copy_channels(
        self,
        input_positions: Sequence[Position],
        output_positions: Sequence[Position],
        channel_pairs: Sequence[tuple[int, int]],
        time_indices: Sequence[int] | str = "all",
        center_crop: bool = True,
    ) -> None:
        """Host-side copy of untouched channels into the output plate.

        When shapes differ the source is center-cropped/zero-padded to fit
        (used by register/stabilize for non-registered channels). Multi-host
        runs stripe the copies by position.
        """
        futures = []
        position_pairs = list(zip(input_positions, output_positions))
        if jax.process_count() > 1:
            position_pairs = position_pairs[jax.process_index() :: jax.process_count()]
        for in_pos, out_pos in position_pairs:
            T = in_pos.data.shape[0]
            ts = range(T) if time_indices == "all" else time_indices
            out_arr = out_pos["0"]
            out_zyx = out_arr.shape[2:]
            for t in ts:
                for c_in, c_out in channel_pairs:
                    data = in_pos.data[int(t), int(c_in)]
                    if data.shape != tuple(out_zyx):
                        data = _match_shape(data, out_zyx)
                    futures.append(
                        out_arr.write_async((int(t), int(c_out)), data.astype(out_arr.dtype))
                    )
        for f in futures:
            f.result()


def _position_name(position: Position) -> str:
    """row/col/fov display name for the job table."""
    try:
        return "/".join(Path(str(position.path)).parts[-3:])
    except Exception:  # pragma: no cover - exotic store paths
        return str(getattr(position, "path", position))


def _c_key(c_out) -> int:
    return c_out if isinstance(c_out, int) else c_out[0]


def _c_index(c_out):
    return c_out if isinstance(c_out, int) else list(c_out)


def _unit_shape(position: Position, unit: WorkUnit) -> tuple[int, ...]:
    zyx = position.data.shape[2:]
    if isinstance(unit.c_in, tuple):
        return (len(unit.c_in),) + tuple(zyx)
    return tuple(zyx)


def _start_reads(chunk: Sequence[WorkUnit], input_positions: Sequence[Position]):
    futures = []
    for u in chunk:
        arr = input_positions[u.pos_idx]["0"]
        futures.append(arr.read_async((u.t, _c_index(u.c_in))))
    return futures


def _match_shape(data: np.ndarray, target: Sequence[int]) -> np.ndarray:
    """Center-crop or zero-pad a ZYX array to the target shape."""
    out = np.zeros(tuple(target), dtype=data.dtype)
    src_slices = []
    dst_slices = []
    for s, t in zip(data.shape, target):
        if s >= t:
            start = (s - t) // 2
            src_slices.append(slice(start, start + t))
            dst_slices.append(slice(0, t))
        else:
            start = (t - s) // 2
            src_slices.append(slice(0, s))
            dst_slices.append(slice(start, start + s))
    out[tuple(dst_slices)] = data[tuple(src_slices)]
    return out

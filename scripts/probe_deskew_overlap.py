"""Probe: does Mosaic overlap the xzy deskew kernel's block DMAs with MXU work?

The round-5 floor table (docs/kernels.md) shows the banded resample kernels
running at ~1.0x of their NO-overlap bound (traffic + compute) while the FFT
slab passes run at 0.74-0.79x (overlapped). Before attempting a manually
double-buffered rewrite, measure what the DMA alone costs under the exact
same grid/BlockSpec structure:

  full      — the production xzy deskew kernel (pre-transposed input, so no
              XLA prep is included in the number).
  dma_only  — identical pallas_call (same grid, same in/out blocks, same
              vmem limit) whose body does no MXU work: it copies 8 static
              slab rows to the output slots. Its time is the pipeline's
              pure data-movement cost.

If dma_only ~= the 819 GB/s traffic floor (~0.55 ms/vol), the full kernel's
~1.0 ms means compute is NOT overlapped and a hand-pipelined rewrite has
~0.45 ms/vol to win. If dma_only ~= 0.9 ms, the floor's bandwidth model is
optimistic for this access pattern and the kernel is already at its real
memory bound - nothing to win.

Run on the real chip: python scripts/probe_deskew_overlap.py
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from biahub_tpu.kernels.deskew import get_deskewed_data_shape
from biahub_tpu.kernels.pallas_deskew import TILE_X, _deskew_kernel_t

shape = (256, 256, 1024)  # flagship raw (Z, Y, X)
batch = 4
ls_angle_deg, px_to_scan_ratio = 36.17, 0.371
avg = 3

Z_in, Y_in, X_in = shape
output_shape, _ = get_deskewed_data_shape(
    shape, ls_angle_deg, px_to_scan_ratio, False
)
Z_out, Y_out, X_out = Y_in, X_in, output_shape[2]

ct = float(np.cos(ls_angle_deg * np.pi / 180))
px = float(px_to_scan_ratio)
offset = px * ct * (Z_out - 1) / 2 - px * (X_out - 1) / 2 + (Z_in - 1) / 2

K = int(np.ceil(TILE_X * px)) + 2 + 8
K = min(-(-K // 8) * 8, Z_in)
n_tiles = -(-X_out // TILE_X)

groups = -(-Y_in // avg)
groups8 = -(-groups // 8) * 8
pad_front = groups8 * avg - Y_in
yp = Y_in + pad_front
n_g8 = groups8 // 8

print(f"K={K} n_tiles={n_tiles} groups={groups} n_g8={n_g8} yp={yp}")
in_mb = yp * Z_in * X_in * 4 / 1e6
out_mb = X_out * groups * Y_out * 4 / 1e6
print(f"input {in_mb:.0f} MB  output {out_mb:.0f} MB  "
      f"traffic floor {(in_mb + out_mb) / 819e9 * 1e9:.3f} ms/vol")

vmem_params = {
    "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
}


def _dma_only_kernel(raw_ref, out_ref):
    # Same blocks in, same blocks out, no MXU work: 8 static slab rows
    # (one per output sublane slot) copied through VMEM.
    for s in range(8):
        out_ref[:, s, :] = raw_ref[s * avg, 0:TILE_X, :]


def _call(kernel_body):
    return pl.pallas_call(
        kernel_body,
        grid=(n_g8, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (8 * avg, Z_in, X_in),
                lambda g, t: (n_g8 - 1 - g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE_X, 8, Y_out),
            lambda g, t: (t, g, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((X_out, groups, Y_out), jnp.float32),
        **vmem_params,
    )


kernel_full = partial(
    _deskew_kernel_t,
    params=(Z_in, X_in, X_out, K, ct, px, offset, avg, yp, Z_out, groups8),
)


def run_full(data):
    return jax.vmap(_call(kernel_full))(data)


def run_dma(data):
    return jax.vmap(_call(_dma_only_kernel))(data)


rng = np.random.default_rng(0)
# Pre-transposed, front-padded tilt-major input (Yp, Z_in, X_in), as pass C
# emits it in the chain: the probe isolates the kernel from XLA prep.
data = rng.random((batch, yp, Z_in, X_in), dtype=np.float32)
data_d = jax.device_put(data)


def timed(fn, name, iters=20, windows=5):
    f = jax.jit(fn)
    out = f(data_d)
    probe = float(np.asarray(out[0, 0, 0, :8]).sum())  # force completion
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(data_d)
        float(np.asarray(out[0, 0, 0, :8]).sum())
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / (iters * batch)
    print(f"{name}: {ms:.3f} ms/vol   (probe {probe:.3f})")
    return ms


manual_only = "--manual-only" in sys.argv
if not manual_only:
    t_dma = timed(run_dma, "dma_only")
    t_full = timed(run_full, "full    ")
    print(f"compute share not overlapped: {t_full - t_dma:.3f} ms/vol")

# --- manually double-buffered variant ------------------------------------
# Mosaic's automatic pipeline prefetches the NEXT program's changed blocks
# one program ahead; with 4 x-tile programs per 25 MB input block the fetch
# for group-block g+1 starts only at (g, t=3) and must hide behind one
# ~15 us tile program - it cannot, so the kernel runs at DMA + compute
# (the dma_only/full split above). This variant folds the x tiles into the
# kernel body, grids over g alone, keeps the input in HBM (ANY), and DMAs
# block g+1 into the spare VMEM slot BEFORE computing block g's 4 tiles:
# the full ~60 us of group compute covers the ~40 us fetch.

from biahub_tpu.kernels.pallas_resample import _banded_dot_left


def _deskew_kernel_manual(hbm_ref, out_ref, slab_ref, sem_ref):
    # Pallas requires ANY-space inputs be full-array with a trivial index
    # map, so the batch axis rides the grid (NOT vmap) and the kernel DMAs
    # its own (b, group-block) input slices. The x tiles stay on the grid
    # too: the DMA chain advances only at tile 0, so the fetch for block
    # i+1 overlaps all 4 tile programs of block i (~60 us of compute vs a
    # ~40 us fetch) instead of Mosaic's 1-program lookahead; and the body
    # stays 24 banded dots (96-dot bodies with dynamic slices are the
    # known Mosaic compile-explosion shape).
    b = pl.program_id(0)
    g = pl.program_id(1)
    tile = pl.program_id(2)
    rows = 8 * avg
    i = b * n_g8 + g

    def dma(slot, bb, blk):
        # Natural group-block order is reversed (tilt rows arrive in
        # natural order, z runs in reverse).
        return pltpu.make_async_copy(
            hbm_ref.at[bb, pl.ds((n_g8 - 1 - blk) * rows, rows)],
            slab_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(tile == 0)
    def _():
        @pl.when(i == 0)
        def _():
            dma(0, 0, 0).start()

        nxt = i + 1

        @pl.when(nxt < batch * n_g8)
        def _():
            dma(nxt % 2, nxt // n_g8, nxt % n_g8).start()

        dma(i % 2, b, g).wait()

    slot = i % 2
    xo = (
        tile * TILE_X
        + jax.lax.broadcasted_iota(jnp.int32, (TILE_X, 1), 0)
    ).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_X, K), 1)
    for s in range(8):
        kprime = groups8 - 1 - (g * 8 + s)
        acc = jnp.zeros((TILE_X, X_in), jnp.float32)
        for j in range(avg):
            zo_val = yp - 1 - j - kprime * avg
            zo_f = jnp.minimum(zo_val, Z_out - 1).astype(jnp.float32)
            in_z = px * xo - px * ct * zo_f + offset
            i0 = jnp.floor(in_z)
            frac = in_z - i0
            i0 = i0.astype(jnp.int32)
            start = jnp.clip(i0[0, 0], 0, max(Z_in - K, 0))
            start = pl.multiple_of((start // 8) * 8, 8)
            offs = i0 - start
            w = (1.0 - frac) * (cols == offs) + frac * (cols == offs + 1)
            slab = slab_ref[slot, (7 - s) * avg + j, pl.ds(start, K), :]
            acc = acc + _banded_dot_left(w, slab)
        out_ref[0, :, s, :] = acc * (1.0 / avg)


def run_manual(data):
    call = pl.pallas_call(
        _deskew_kernel_manual,
        grid=(batch, n_g8, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, TILE_X, 8, Y_out),
            lambda b, g, t: (b, t, g, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, X_out, groups, Y_out), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8 * avg, Z_in, X_in), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
    )
    return call(data)


t_manual = timed(run_manual, "manual  ")
ref = np.asarray(jax.jit(run_full)(data_d))
got = np.asarray(jax.jit(run_manual)(data_d))
print(f"manual vs full max abs diff: {np.abs(ref - got).max():.3e}")

# Device-trace split (load-robust: wall numbers above are host-dispatch
# sensitive on a contended box; the per-fusion device durations are not).
if "--trace" in sys.argv:
    import tempfile

    from biahub_tpu.runtime.profiling import summarize_device_trace

    variants = [("manual", run_manual)]
    if not manual_only:
        variants = [("dma_only", run_dma), ("full", run_full)] + variants
    for name, fn in variants:
        f = jax.jit(fn)
        out = f(data_d)
        float(np.asarray(out[0, 0, 0, :8]).sum())
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                for _ in range(5):
                    out = f(data_d)
                float(np.asarray(out[0, 0, 0, :8]).sum())
            print(f"--- {name} device trace (5 iters x batch {batch}) ---")
            rows = summarize_device_trace(td, top=6)
            total = sum(ms for _, ms, _ in rows)
            print(f"{name} device total: {total / (5 * batch):.3f} ms/vol")

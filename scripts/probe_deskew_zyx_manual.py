"""Probe: manual-DMA batched ZYX deskew vs vmap of the automatic kernel.

The xzy kernel's 25 MB group blocks cannot prefetch behind one x-tile
program (hence the manual rewrite, 0.99 -> 0.67 ms/vol). The zyx kernel's
blocks are (avg, Z, X) ~ 3 MB fetched once per whole-group program (~4
tiles of MXU work), so Mosaic's one-ahead prefetch may already hide them.
This probe settles whether the headline step's deskew stage gains anything
from the manual chain. Run on the real chip.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from biahub_tpu.kernels.pallas_deskew import (
    deskew_zyx_pallas,
    deskew_zyx_pallas_batched,
)

shape = (256, 256, 1024)
batch = 4
ls_angle_deg, px_to_scan_ratio = 36.17, 0.371
avg = 3

Z, Y, X = shape
groups = -(-Y // avg)
groups8 = -(-groups // 8) * 8
pad8 = groups8 * avg - Y
pad = groups * avg - Y

rng = np.random.default_rng(0)
vols = rng.random((batch,) + shape, dtype=np.float32)
pre = jnp.pad(
    jnp.transpose(jnp.asarray(vols), (0, 2, 1, 3)),
    ((0, 0), (pad, 0), (0, 0), (0, 0)), mode="edge",
)
pre8 = jnp.pad(
    jnp.transpose(jnp.asarray(vols), (0, 2, 1, 3)),
    ((0, 0), (pad8, 0), (0, 0), (0, 0)), mode="edge",
)
pre_d = jax.device_put(pre)
pre8_d = jax.device_put(pre8)


def timed(fn, arg, name, iters=20, windows=5):
    f = jax.jit(fn)
    out = f(arg)
    float(np.asarray(out[0, 0, 0, :8]).sum())
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(arg)
        float(np.asarray(out[0, 0, 0, :8]).sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1e3 / (iters * batch):.3f} ms/vol")


timed(
    lambda d: jax.vmap(
        lambda v: deskew_zyx_pallas(
            v, ls_angle_deg, px_to_scan_ratio, False, average_window=avg,
            skip_flip=True, pre_transposed_zyx_shape=shape,
        )
    )(d),
    pre_d,
    "automatic (vmap)",
)
timed(
    lambda d: deskew_zyx_pallas_batched(
        d, ls_angle_deg, px_to_scan_ratio, False, average_window=avg,
        skip_flip=True, pre_transposed_zyx_shape=shape, out_layout="zyx",
    ),
    pre8_d,
    "manual zyx",
)

# Device-trace truth (wall numbers above carry ~0.6 ms/vol of tunnel
# dispatch overhead at batch 4).
import tempfile

from biahub_tpu.runtime.profiling import summarize_device_trace

for name, fn, arg in [
    (
        "automatic",
        lambda d: jax.vmap(
            lambda v: deskew_zyx_pallas(
                v, ls_angle_deg, px_to_scan_ratio, False,
                average_window=avg, skip_flip=True,
                pre_transposed_zyx_shape=shape,
            )
        )(d),
        pre_d,
    ),
    (
        "manual",
        lambda d: deskew_zyx_pallas_batched(
            d, ls_angle_deg, px_to_scan_ratio, False, average_window=avg,
            skip_flip=True, pre_transposed_zyx_shape=shape,
            out_layout="zyx",
        ),
        pre8_d,
    ),
]:
    f = jax.jit(fn)
    out = f(arg)
    float(np.asarray(out[0, 0, 0, :8]).sum())
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(5):
                out = f(arg)
            float(np.asarray(out[0, 0, 0, :8]).sum())
        rows = summarize_device_trace(td, top=6)
        for nm, ms, cnt in rows:
            print(f"{name}: {nm} {ms / (5 * batch):.3f} ms/vol x{cnt}")

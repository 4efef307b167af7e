"""Probe: does the zyx-mode deskew kernel (grid over z groups, 3-row input
blocks) already overlap its DMAs, unlike the xzy kernel's 25 MB blocks?

See probe_deskew_overlap.py for the xzy analysis. Run on the real chip.
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
from biahub_tpu.kernels.pallas_deskew import TILE_X, _deskew_kernel

shape = (256, 256, 1024)
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
pad_front = groups * avg - Y_in
yp = Y_in + pad_front

vmem_params = {
    "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
}

kernel = partial(
    _deskew_kernel,
    params=(Z_in, X_in, X_out, K, n_tiles, ct, px, offset, avg, yp, Z_out),
)


def _dma_only(raw_ref, out_ref):
    # The BlockSpec pipeline moves the full input block regardless of what
    # the body reads; touch a corner so nothing is elided, write the full
    # output block so write traffic matches the real kernel.
    out_ref[0, :, :] = jnp.zeros((Y_out, X_out), jnp.float32) + jnp.sum(
        raw_ref[0, 0:8, 0:128]
    )


def _call(body):
    return pl.pallas_call(
        body,
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((avg, Z_in, X_in), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Y_out, X_out), lambda k: (groups - 1 - k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((groups, Y_out, X_out), jnp.float32),
        **vmem_params,
    )


rng = np.random.default_rng(0)
data = rng.random((batch, yp, Z_in, X_in), dtype=np.float32)
data_d = jax.device_put(data)


def timed(fn, name, iters=20, windows=5):
    f = jax.jit(fn)
    out = f(data_d)
    float(np.asarray(out[0, 0, 0, :8]).sum())
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(data_d)
        float(np.asarray(out[0, 0, 0, :8]).sum())
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / (iters * batch)
    print(f"{name}: {ms:.3f} ms/vol")
    return ms


import tempfile

from biahub_tpu.runtime.profiling import summarize_device_trace

for name, body in [("dma_only", _dma_only), ("full", kernel)]:
    fn = lambda d: jax.vmap(_call(body))(d)
    timed(fn, name)
    f = jax.jit(fn)
    out = f(data_d)
    float(np.asarray(out[0, 0, 0, :8]).sum())
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(5):
                out = f(data_d)
            float(np.asarray(out[0, 0, 0, :8]).sum())
        rows = summarize_device_trace(td, top=4)
        kern_ms = max(
            (ms for nm, ms, _ in rows if "vmap" in nm or "fusion" in nm),
            default=0.0,
        )
        print(f"{name} kernel device: {kern_ms / (5 * batch):.3f} ms/vol")

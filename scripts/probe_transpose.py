"""Micro-benchmark: XLA major-axis transpose vs a Pallas shapecast kernel.

The FFT pipeline spends ~1.6 ms/volume on (z2, y, xw) <-> (y, z2, xw)
transposes (XLA moves them at ~540 GB/s). This probes whether a Pallas
kernel doing the interleave as an in-VMEM relayout beats it.
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

Z2, Y, XW = 128, 256, 512
SB = 8  # z-rows per program


def _tkernel(in_ref, out_ref):
    out_ref[:] = jnp.swapaxes(in_ref[:], 0, 1)


@jax.jit
def pallas_t01(a):
    return pl.pallas_call(
        _tkernel,
        grid=(Z2 // SB,),
        in_specs=[
            pl.BlockSpec((SB, Y, XW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (Y, SB, XW), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Y, Z2, XW), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(a)


@jax.jit
def xla_t01(a):
    return jnp.transpose(a, (1, 0, 2))


def timeit(fn, a, iters=20):
    out = fn(a)
    float(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a)
    float(out[0, 0, 0])
    return (time.perf_counter() - t0) * 1e3 / iters


rng = np.random.default_rng(0)
a = jax.device_put(rng.random((Z2, Y, XW), np.float32))
mb = Z2 * Y * XW * 4 / 2**20
try:
    t_p = timeit(pallas_t01, a)
    ok = np.array_equal(np.asarray(pallas_t01(a)), np.asarray(xla_t01(a)))
    print(f"pallas transpose: {t_p:.3f} ms for {mb:.0f} MB (equal={ok})")
except Exception as exc:
    print(f"pallas transpose failed: {type(exc).__name__}: {str(exc)[:300]}")
t_x = timeit(xla_t01, a)
print(f"xla    transpose: {t_x:.3f} ms for {mb:.0f} MB")

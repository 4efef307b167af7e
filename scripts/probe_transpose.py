"""Device-trace comparison: XLA major-axis transpose vs a Pallas shapecast.

The FFT pipeline spends ~1.6 ms/volume on (z2, y, xw) <-> (y, z2, xw)
transposes. Per-op device times from the profiler (single-op wall timings
are swamped by the ~2.5 ms axon dispatch overhead).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from biahub_tpu.runtime.profiling import summarize_device_trace

Z2, Y, XW = 128, 256, 512
SB = 8  # z-rows per program


def _tkernel(in_ref, out_ref):
    out_ref[:] = jnp.swapaxes(in_ref[:], 0, 1)


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
def both(a):
    b = pallas_t01(a)  # (Y, Z2, XW)
    c = jnp.transpose(b + 1.0, (1, 0, 2))  # XLA back to (Z2, Y, XW)
    d = pallas_t01(c + 1.0)
    e = jnp.transpose(d + 1.0, (1, 0, 2))
    return e, jnp.sum(e[0, 0, :8])


rng = np.random.default_rng(0)
a = jax.device_put(rng.random((Z2, Y, XW), np.float32))
out, p = both(a)
float(p)
ok = np.array_equal(
    np.asarray(jax.jit(pallas_t01)(a)), np.asarray(jnp.transpose(a, (1, 0, 2)))
)
print(f"pallas transpose correct: {ok} ({Z2 * Y * XW * 4 / 2**20:.0f} MB array)")

trace_dir = "/tmp/transpose_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(10):
        out, p = both(a)
    float(p)
summarize_device_trace(trace_dir, top=12)

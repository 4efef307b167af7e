"""x-pass restructure probe: 8 o-rows per program, output written directly in
(Zo, Yo, Xo) order — eliminating the chain's final full-volume transpose.

Compares device time of [shear_resample_pallas + jnp.transpose] vs the
restructured kernel emitting the transposed layout natively.
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

from biahub_tpu.kernels.pallas_resample import (
    TILE_R,
    _band_weights,
    _banded_dot,
    shear_resample_pallas,
    static_window_plan,
)
from biahub_tpu.runtime.profiling import summarize_device_trace

# x-pass geometry at the probe warp shape: input (Yo, Xi, Zo)
O, R_in, T = 1024, 484, 256
R_out = 484
cs = (1.0052, -0.0352, 3.1)  # (mxx, mxy, tx)
ORDER = 1
O8 = 8
n_o8 = -(-O // O8)
n_tiles = -(-R_out // TILE_R)

plan = static_window_plan([cs], O, R_out, R_in, ORDER)
K, starts = plan
print(f"K={K} n_tiles={n_tiles} starts={starts}", flush=True)

rng = np.random.default_rng(0)
data = rng.random((O, R_in, T), dtype=np.float32)


def kernel8(data_ref, out_ref):
    cr, co, tau = cs
    o8 = pl.program_id(0)
    for oo in range(O8):
        o_idx = (o8 * O8 + oo).astype(jnp.float32) if False else None
        o_val = (o8 * O8 + oo).astype(jnp.float32)
        for tile in range(n_tiles):
            tile_w = min(TILE_R, R_out - tile * TILE_R)
            ro = (
                tile * TILE_R
                + jax.lax.broadcasted_iota(jnp.int32, (tile_w, 1), 0)
            ).astype(jnp.float32)
            coords = cr * ro + co * o_val + tau
            i0 = jnp.floor(coords).astype(jnp.int32)
            start = starts[tile]
            cols = jax.lax.broadcasted_iota(jnp.int32, (tile_w, K), 1)
            w = _band_weights(coords, i0 - start, cols, ORDER, K)
            slab = data_ref[oo, start : start + K, :]  # (K, T)
            res = _banded_dot(slab, w)  # (T, tile_w)
            out_ref[:, oo, tile * TILE_R : tile * TILE_R + tile_w] = res


@jax.jit
def xpass8(d):
    out = pl.pallas_call(
        kernel8,
        grid=(n_o8,),
        in_specs=[
            pl.BlockSpec((O8, R_in, T), lambda o: (o, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((T, O8, R_out), lambda o: (0, o, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, O, R_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(d)
    return out, jnp.sum(out[0, 0, :8])


@jax.jit
def xpass_ref(d):
    out = shear_resample_pallas(d, R_out, *cs, order=ORDER)  # (O, T, R_out)
    out = jnp.transpose(out, (1, 0, 2))  # (T, O, R_out)
    return out, jnp.sum(out[0, 0, :8])


d = jax.device_put(data)
for name, fn in (("xpass8", xpass8), ("ref+T", xpass_ref)):
    t0 = time.perf_counter()
    out, p = fn(d)
    float(p)
    print(f"{name}: compile+first {time.perf_counter() - t0:.0f} s", flush=True)

o1, _ = xpass8(d)
o2, _ = xpass_ref(d)
diff = float(jnp.max(jnp.abs(o1 - o2)))
print("max|diff|:", diff, flush=True)

with jax.profiler.trace("/tmp/xpass_trace"):
    for _ in range(4):
        out, p = xpass8(d)
    float(p)
    for _ in range(4):
        out, p = xpass_ref(d)
    float(p)
summarize_device_trace("/tmp/xpass_trace", top=10)

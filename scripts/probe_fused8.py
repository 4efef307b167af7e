"""8-o fused z+y kernel probe: emits (Yo, Xi, Zo)-ordered output directly,
removing the mid-chain (Xi,Yo,Zo)->(Yo,Xi,Zo) transpose (~1.56 ms/vol).

Body cost: per program 8 o-rows x (pass1 dot + 8 pass2 dots) with static
windows — 216 split-dots; the probe checks Mosaic compile time stays sane
and device time matches the regular fused kernel.
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
    _banded_dot_left,
    shear_resample2_pallas,
    static_window_plan,
)
from biahub_tpu.runtime.profiling import summarize_device_trace

O, R_in, T_in = 484, 256, 1024
R_out, T_out = 256, 1024
rc = (1.0, 0.0, 0.5)
tc = (0.985, 0.035, -1.2)
ORDER = 1
K_r = 144
n_t_tiles = -(-T_out // TILE_R)
n_r_tiles = -(-R_out // TILE_R)
O8 = 8
n_o8 = -(-O // O8)

K_t, t_starts = static_window_plan([tc], O, T_out, T_in, ORDER)
print(f"K_t={K_t} t_starts={t_starts}", flush=True)

rng = np.random.default_rng(0)
data = rng.random((O, R_in, T_in), dtype=np.float32)


def fused8_body(data_ref, out_ref, res_ref):
    cr, co, tau = rc
    dr, do_, dtau = tc
    o8 = pl.program_id(0)
    rt = pl.program_id(1)

    ro = (rt * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, 1), 0)).astype(
        jnp.float32
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, K_r), 1)
    for oo in range(O8):
        o_val = (o8 * O8 + oo).astype(jnp.float32)
        coords = cr * ro + co * o_val + tau
        i0 = jnp.floor(coords).astype(jnp.int32)
        lo = jnp.minimum(i0[0, 0], i0[TILE_R - 1, 0]) - 1
        start = jnp.clip(lo, 0, max(R_in - K_r, 0))
        start = pl.multiple_of((start // 8) * 8, 8)
        w = _band_weights(coords, i0 - start, cols, ORDER, K_r)
        slab = data_ref[oo, pl.ds(start, K_r), :]
        res_ref[:, oo * TILE_R : (oo + 1) * TILE_R] = _banded_dot(slab, w)

    for t_i in range(n_t_tiles):
        tw = min(TILE_R, T_out - t_i * TILE_R)
        s2 = t_starts[t_i]
        to = (t_i * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0)).astype(
            jnp.float32
        )
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (tw, K_t), 1)
        for oo in range(O8):
            o_val = (o8 * O8 + oo).astype(jnp.float32)
            c2 = dr * to + do_ * o_val + dtau
            j0 = jnp.floor(c2).astype(jnp.int32)
            w2 = _band_weights(c2, j0 - s2, cols2, ORDER, K_t)
            win = res_ref[s2 : s2 + K_t, oo * TILE_R : (oo + 1) * TILE_R]
            out_ref[t_i * TILE_R : t_i * TILE_R + tw, oo, :] = _banded_dot_left(
                w2, win
            )


@jax.jit
def fused8(d):
    out = pl.pallas_call(
        fused8_body,
        grid=(n_o8, n_r_tiles),
        in_specs=[
            pl.BlockSpec((O8, R_in, T_in), lambda o, r: (o, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((T_out, O8, TILE_R), lambda o, r: (0, o, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_out, O, R_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T_in, O8 * TILE_R), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(d)
    return out, jnp.sum(out[0, 0, :8])


@jax.jit
def fused_ref(d):
    out = shear_resample2_pallas(d, R_out, T_out, rc, tc, order=ORDER)
    out = jnp.transpose(out, (1, 0, 2))  # (T_out, O, R_out)
    return out, jnp.sum(out[0, 0, :8])


d = jax.device_put(data)
for name, fn in (("fused8", fused8), ("ref+T", fused_ref)):
    t0 = time.perf_counter()
    out, p = fn(d)
    float(p)
    print(f"{name}: compile+first {time.perf_counter() - t0:.0f} s", flush=True)

o1, _ = fused8(d)
o2, _ = fused_ref(d)
diff = float(jnp.max(jnp.abs(o1 - o2)))
print("max|diff|:", diff, flush=True)

with jax.profiler.trace("/tmp/fused8_trace"):
    for _ in range(4):
        out, p = fused8(d)
    float(p)
    for _ in range(4):
        out, p = fused_ref(d)
    float(p)
summarize_device_trace("/tmp/fused8_trace", top=10)

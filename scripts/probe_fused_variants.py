"""Micro-variants of the fused two-axis resample kernel, timed on TPU.

Isolates where the fused kernel's time above its HBM-traffic floor lives —
and attacks the Mosaic compile explosion of the 8-way unrolled pass-2 loop:
  gridt     — pass-2 t-tiles moved into the GRID (small body, scratch
              persists across grid steps, pass 1 under @pl.when(t==0))
  staticwin — pass 2 with STATIC window starts (widened K_t covering the
              whole o-range; no dynamic sublane slicing of the scratch)
  cheapw2   — pass 2 with a trivially-built weight matrix (isolates the
              pass-2 VPU weight-build cost)
  pass1only — writes the pass-1 scratch straight out (lower bound: one
              banded dot + full traffic, no pass-2 work at all)
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
)

O, R_in, T_in = 484, 256, 1024
R_out, T_out = 256, 1024
rc = (1.0, 0.0, 0.5)
tc = (0.985, 0.035, -1.2)
ORDER = 1
K_r = 144
K_t = 144
n_t_tiles = -(-T_out // TILE_R)
n_r_tiles = -(-R_out // TILE_R)

rng = np.random.default_rng(0)
data = rng.random((O, R_in, T_in), dtype=np.float32)


def pass1(data_ref, res_ref, rt):
    cr, co, tau = rc
    o_idx = pl.program_id(0).astype(jnp.float32)
    ro = (rt * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, 1), 0)).astype(
        jnp.float32
    )
    coords = cr * ro + co * o_idx + tau
    i0 = jnp.floor(coords).astype(jnp.int32)
    lo = jnp.minimum(i0[0, 0], i0[TILE_R - 1, 0]) - 1
    start = jnp.clip(lo, 0, max(R_in - K_r, 0))
    start = pl.multiple_of((start // 8) * 8, 8)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, K_r), 1)
    w = _band_weights(coords, i0 - start, cols, ORDER, K_r)
    slab = data_ref[0, pl.ds(start, K_r), :]
    res_ref[:, :] = _banded_dot(slab, w)


def gridt_body(data_ref, out_ref, res_ref):
    dr, do_, dtau = tc
    o_idx = pl.program_id(0).astype(jnp.float32)
    rt = pl.program_id(1)
    t_i = pl.program_id(2)

    @pl.when(t_i == 0)
    def _():
        pass1(data_ref, res_ref, rt)

    to = (t_i * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, 1), 0)).astype(
        jnp.float32
    )
    c2 = dr * to + do_ * o_idx + dtau
    j0 = jnp.floor(c2).astype(jnp.int32)
    lo2 = jnp.minimum(j0[0, 0], j0[TILE_R - 1, 0]) - 1
    start2 = jnp.clip(lo2, 0, max(T_in - K_t, 0))
    start2 = pl.multiple_of((start2 // 8) * 8, 8)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, K_t), 1)
    w2 = _band_weights(c2, j0 - start2, cols2, ORDER, K_t)
    win = res_ref[pl.ds(start2, K_t), :]
    out_ref[0, :, :] = _banded_dot_left(w2, win)


def make_gridt():
    @jax.jit
    def run(d):
        out = pl.pallas_call(
            gridt_body,
            grid=(O, n_r_tiles, n_t_tiles),
            in_specs=[
                pl.BlockSpec((1, R_in, T_in), lambda o, r, t: (o, 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, TILE_R, TILE_R), lambda o, r, t: (o, t, r),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((O, T_out, R_out), jnp.float32),
            scratch_shapes=[pltpu.VMEM((T_in, TILE_R), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024
            ),
        )(d)
        return out, jnp.sum(out[0, 0, :8])

    return run


def body(data_ref, out_ref, res_ref, mode):
    dr, do_, dtau = tc
    o_idx = pl.program_id(0).astype(jnp.float32)
    rt = pl.program_id(1)
    pass1(data_ref, res_ref, rt)

    if mode == "pass1only":
        for t_i in range(n_t_tiles):
            out_ref[0, t_i * TILE_R : (t_i + 1) * TILE_R, :] = res_ref[
                t_i * TILE_R : (t_i + 1) * TILE_R, :
            ]
        return

    if mode == "staticwin":
        Kt2 = min(
            -(-(int(np.ceil(TILE_R * abs(tc[0]) + abs(tc[1]) * O)) + 2 + 8) // 8) * 8,
            T_in,
        )
        for t_i in range(n_t_tiles):
            tw = min(TILE_R, T_out - t_i * TILE_R)
            c_lo = min(tc[0] * t_i * TILE_R + tc[1] * o2 + tc[2] for o2 in (0, O - 1))
            s2 = int(np.clip(np.floor(c_lo) - 1, 0, max(T_in - Kt2, 0))) // 8 * 8
            to = (t_i * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0)).astype(jnp.float32)
            c2 = tc[0] * to + tc[1] * o_idx + tc[2]
            j0 = jnp.floor(c2).astype(jnp.int32)
            cols2 = jax.lax.broadcasted_iota(jnp.int32, (tw, Kt2), 1)
            w2 = _band_weights(c2, j0 - s2, cols2, ORDER, Kt2)
            win = res_ref[s2 : s2 + Kt2, :]
            out_ref[0, t_i * TILE_R : t_i * TILE_R + tw, :] = _banded_dot_left(w2, win)
        return

    for t_i in range(n_t_tiles):
        tw = min(TILE_R, T_out - t_i * TILE_R)
        to = (t_i * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0)).astype(
            jnp.float32
        )
        c2 = tc[0] * to + tc[1] * o_idx + tc[2]
        j0 = jnp.floor(c2).astype(jnp.int32)
        lo2 = jnp.minimum(j0[0, 0], j0[tw - 1, 0]) - 1
        start2 = jnp.clip(lo2, 0, max(T_in - K_t, 0))
        start2 = pl.multiple_of((start2 // 8) * 8, 8)
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (tw, K_t), 1)
        if mode == "cheapw2":
            w2 = (cols2 == t_i).astype(jnp.float32)
        else:
            w2 = _band_weights(c2, j0 - start2, cols2, ORDER, K_t)
        win = res_ref[pl.ds(start2, K_t), :]
        out_ref[0, t_i * TILE_R : t_i * TILE_R + tw, :] = _banded_dot_left(w2, win)


def make(mode):
    @jax.jit
    def run(d):
        out = pl.pallas_call(
            partial(body, mode=mode),
            grid=(O, n_r_tiles),
            in_specs=[
                pl.BlockSpec((1, R_in, T_in), lambda o, r: (o, 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, T_out, TILE_R), lambda o, r: (o, 0, r),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((O, T_out, R_out), jnp.float32),
            scratch_shapes=[pltpu.VMEM((T_in, TILE_R), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024
            ),
        )(d)
        return out, jnp.sum(out[0, 0, :8])

    return run


d = jax.device_put(data)
variants = [("gridt", make_gridt())]
for m in ("staticwin", "cheapw2", "pass1only"):
    variants.append((m, make(m)))

ref = None
for name, fn in variants:
    t0 = time.perf_counter()
    out, probe = fn(d)
    float(probe)
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out, probe = fn(d)
        float(probe)
        best = min(best, (time.perf_counter() - t0) * 1e3 / 5)
    if name == "gridt":
        ref = np.asarray(out[::97])
        check = ""
    elif name == "staticwin":
        diff = float(np.abs(np.asarray(out[::97]) - ref).max())
        check = f"  max|diff| vs gridt {diff:.2e}"
    else:
        check = ""
    print(f"{name:10s}  {best:7.3f} ms   (compile {compile_s:.0f} s){check}", flush=True)

# Round 2: library kernel (dynamic windows + real weights) for the in-process
# delta against pass1only/staticwin measured above.
from biahub_tpu.kernels.pallas_resample import shear_resample2_pallas

@jax.jit
def libbase(x):
    out = shear_resample2_pallas(x, R_out, T_out, rc, tc, order=ORDER)
    return out, jnp.sum(out[0, 0, :8])

t0 = time.perf_counter()
out, probe = libbase(d)
float(probe)
compile_s = time.perf_counter() - t0
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        out, probe = libbase(d)
    float(probe)
    best = min(best, (time.perf_counter() - t0) * 1e3 / 5)
diff = float(np.abs(np.asarray(out[::97]) - ref).max())
print(f"{'lib-base':10s}  {best:7.3f} ms   (compile {compile_s:.0f} s)  max|diff| vs gridt {diff:.2e}", flush=True)

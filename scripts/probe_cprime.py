"""Micro-probe: pass-C' formulation variants on the real chip.

C' measured 2.27 ms/volume (2.7x its traffic floor) inside the spectral
step. Variants:
  v0  current: U = dot_general(S, M, ((0,),(1,))) -> (xw, Xp); transposed
      sublane irfft; out (1, Ycov, Xp) zyx blocks.
  v1  v0 with the table PRE-SPLIT into bf16 hi/lo (no in-kernel split of M).
  v2  v0 with 2 output groups per program (half the grid).
  v3  natural R = M @ S -> (Xp, kx); standard lane irfft; out (1, Xp, Ycov)
      zxy blocks (consumer would transpose or store transposed).
Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_cprime.py
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

from biahub_tpu.kernels.pallas_fft import (
    _cdot, _dot, _full_spec, _radix_x_inv_mats, _vmem_params,
)
from biahub_tpu.kernels.pallas_spectral import (
    _cdot_zg, _deskew_geom, _spectral_table_np,
)

Z, Y, X = 256, 256, 1024
ANGLE, PX, AVG = 36.17, 0.371, 3
XW = X // 2  # peel + radix-x active at the flagship
PREC = "high"

z_out, x_out, G, ypt, _, _, _ = _deskew_geom((Z, Y, X), ANGLE, PX, False, AVG)
print(f"G={G} ypt={ypt} x_out={x_out}", flush=True)

rng = np.random.default_rng(0)
sr = jnp.asarray(rng.standard_normal((ypt, Z, XW)).astype(np.float32))
si = jnp.asarray(rng.standard_normal((ypt, Z, XW)).astype(np.float32))
mr_np, mi_np = _spectral_table_np((Z, Y, X), ANGLE, PX, False, AVG)
mr = jnp.asarray(mr_np)
mi = jnp.asarray(mi_np)

imats = _radix_x_inv_mats(X, 2)
prct, pict = (jnp.asarray(m.T.copy()) for m in imats[:2])
cols_t = tuple(jnp.asarray(m.T.copy()) for m in imats[2:])
prc, pic = (jnp.asarray(m) for m in imats[:2])
rows = tuple(jnp.asarray(m) for m in imats[2:])


def timed(fn, args, name, iters=8):
    t0 = time.perf_counter()
    out = fn(*args)
    float(out[0, 0, 0] if out.ndim == 3 else out[0, 0])
    print(f"{name} compile {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out[0, 0, 0] if out.ndim == 3 else out[0, 0])
    ms = (time.perf_counter() - t0) * 1e3 / iters
    print(f"{name}: {ms:.2f} ms/volume", flush=True)
    return ms


N_CM_T = 9  # prct, pict, wcol, t2c, t2s, t1c, t1s, t3c, t3s (radix-2 X)
CM_T = (prct, pict) + cols_t
CM_L = (prc, pic) + rows


def _irfft_t(ur, ui, prct_, pict_, cols, prec):
    o = prct_.shape[1]
    w = cols[0]
    a0 = _dot(prct_, w * ur[:o], prec) - _dot(pict_, w * ui[:o], prec)
    c2r, c2i = _cdot(prct_, pict_, ur[o:2*o], ui[o:2*o], prec)
    c1r, c1i = _cdot(prct_, pict_, ur[2*o:3*o], ui[2*o:3*o], prec)
    c3r, c3i = _cdot(prct_, pict_, ur[3*o:], ui[3*o:], prec)
    t2c, t2s, t1c, t1s, t3c, t3s = cols[1:]
    t2 = c2r * t2c - c2i * t2s
    u1r = c1r * t1c - c1i * t1s
    u1i = c1r * t1s + c1i * t1c
    u3r = c3r * t3c - c3i * t3s
    u3i = c3r * t3s + c3i * t3c
    return jnp.concatenate([
        a0 + t2 + u1r + u3r, a0 - t2 - u1i + u3i,
        a0 + t2 - u1r - u3r, a0 - t2 + u1i - u3i,
    ], axis=0)


def k_v0(sr_ref, si_ref, mr_ref, mi_ref, *rest, gpp=1):
    cm = [r[:] for r in rest[:N_CM_T]]
    out_ref = rest[N_CM_T]
    prct_, pict_, cols = cm[0], cm[1], tuple(cm[2:])
    for gg in range(gpp):
        # The S blocks arrive in REVERSED group order (padded tilt-y), the
        # M blocks ascending in z' — within a gpp-group block the halves
        # pair crosswise.
        s_base = (gpp - 1 - gg) * AVG
        ur = ui = None
        for j in range(AVG):
            t_r, t_i = _cdot_zg(
                sr_ref[s_base + j], si_ref[s_base + j],
                mr_ref[gg * AVG + AVG - 1 - j], mi_ref[gg * AVG + AVG - 1 - j],
                PREC,
            )
            ur = t_r if ur is None else ur + t_r
            ui = t_i if ui is None else ui + t_i
        out_ref[gg] = _irfft_t(ur, ui, prct_, pict_, cols, PREC)


def run_v0(gpp):
    def call(srx, six, mrx, mix):
        return pl.pallas_call(
            partial(k_v0, gpp=gpp),
            grid=(G // gpp,),
            in_specs=[
                pl.BlockSpec((AVG * gpp, Z, XW),
                             lambda i: (G // gpp - 1 - i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((AVG * gpp, Z, XW),
                             lambda i: (G // gpp - 1 - i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((AVG * gpp, x_out, Z), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((AVG * gpp, x_out, Z), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [_full_spec(tuple(m.shape)) for m in CM_T],
            out_specs=pl.BlockSpec((gpp, Y * 4, x_out), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, Y * 4, x_out), jnp.float32),
            **_vmem_params(False),
        )(srx, six, mrx, mix, *CM_T)
    return jax.jit(call)


# v1: pre-split bf16 table
def _dot_zg_b16(a, b_hi, b_lo):
    dims = (((0,), (1,)), ((), ()))
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y, dims, preferred_element_type=jnp.float32)

    return d(ah, b_hi) + d(ah, b_lo) + d(al, b_hi)


def k_v1(sr_ref, si_ref, mrh_ref, mrl_ref, mih_ref, mil_ref, *rest):
    cm = [r[:] for r in rest[:N_CM_T]]
    out_ref = rest[N_CM_T]
    prct_, pict_, cols = cm[0], cm[1], tuple(cm[2:])
    ur = ui = None
    for j in range(AVG):
        a_r, a_i = sr_ref[j], si_ref[j]
        bh_r, bl_r = mrh_ref[AVG - 1 - j], mrl_ref[AVG - 1 - j]
        bh_i, bl_i = mih_ref[AVG - 1 - j], mil_ref[AVG - 1 - j]
        # complex via 4 half-split dots (no Karatsuba: operands pre-split)
        t_r = _dot_zg_b16(a_r, bh_r, bl_r) - _dot_zg_b16(a_i, bh_i, bl_i)
        t_i = _dot_zg_b16(a_r, bh_i, bl_i) + _dot_zg_b16(a_i, bh_r, bl_r)
        ur = t_r if ur is None else ur + t_r
        ui = t_i if ui is None else ui + t_i
    out_ref[0] = _irfft_t(ur, ui, prct_, pict_, cols, PREC)


def run_v1():
    mrh = mr.astype(jnp.bfloat16)
    mrl = (mr - mrh.astype(jnp.float32)).astype(jnp.bfloat16)
    mih = mi.astype(jnp.bfloat16)
    mil = (mi - mih.astype(jnp.float32)).astype(jnp.bfloat16)

    def call(srx, six, a, b, c, d):
        return pl.pallas_call(
            k_v1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((AVG, Z, XW), lambda i: (G - 1 - i, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * 2
            + [
                pl.BlockSpec((AVG, x_out, Z), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * 4
            + [_full_spec(tuple(m.shape)) for m in CM_T],
            out_specs=pl.BlockSpec((1, Y * 4, x_out), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, Y * 4, x_out), jnp.float32),
            **_vmem_params(False),
        )(srx, six, a, b, c, d, *CM_T)

    return jax.jit(call), (sr, si, mrh, mrl, mih, mil)


# v3: natural M @ S, standard lane irfft, zxy out
def _irfft_lane(rr, ri, prc_, pic_, rows_, prec):
    o = prc_.shape[0]
    wrow, t2c, t2s, t1c, t1s, t3c, t3s = rows_
    a0 = (_dot(rr[:, :o] * wrow, prc_, prec)
          - _dot(ri[:, :o] * wrow, pic_, prec))
    from biahub_tpu.kernels.pallas_fft import _cdot_r

    c2r, c2i = _cdot_r(rr[:, o:2*o], ri[:, o:2*o], prc_, pic_, prec)
    c1r, c1i = _cdot_r(rr[:, 2*o:3*o], ri[:, 2*o:3*o], prc_, pic_, prec)
    c3r, c3i = _cdot_r(rr[:, 3*o:], ri[:, 3*o:], prc_, pic_, prec)
    t2 = c2r * t2c - c2i * t2s
    u1r = c1r * t1c - c1i * t1s
    u1i = c1r * t1s + c1i * t1c
    u3r = c3r * t3c - c3i * t3s
    u3i = c3r * t3s + c3i * t3c
    return jnp.concatenate([
        a0 + t2 + u1r + u3r, a0 - t2 - u1i + u3i,
        a0 + t2 - u1r - u3r, a0 - t2 + u1i - u3i,
    ], axis=1)


def k_v3(sr_ref, si_ref, mr_ref, mi_ref, *rest):
    cm = [r[:] for r in rest[:N_CM_T]]
    out_ref = rest[N_CM_T]
    prc_, pic_, rows_ = cm[0], cm[1], tuple(cm[2:])
    rr = ri = None
    for j in range(AVG):
        t_r, t_i = _cdot(
            mr_ref[AVG - 1 - j], mi_ref[AVG - 1 - j],
            sr_ref[j], si_ref[j], PREC,
        )  # (x_out, XW)
        rr = t_r if rr is None else rr + t_r
        ri = t_i if ri is None else ri + t_i
    out_ref[0] = _irfft_lane(rr, ri, prc_, pic_, rows_, PREC)


def run_v3():
    def call(srx, six, mrx, mix):
        return pl.pallas_call(
            k_v3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((AVG, Z, XW), lambda i: (G - 1 - i, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * 2
            + [
                pl.BlockSpec((AVG, x_out, Z), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * 2
            + [_full_spec(tuple(m.shape)) for m in CM_L],
            out_specs=pl.BlockSpec((1, x_out, X), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, x_out, X), jnp.float32),
            **_vmem_params(False),
        )(srx, six, mrx, mix, *CM_L)

    return jax.jit(call)


if __name__ == "__main__":
    v0 = run_v0(1)
    t_v0 = timed(v0, (sr, si, mr, mi), "v0 current (zyx, transposed irfft)")
    v2 = run_v0(2)
    t_v2 = timed(v2, (sr, si, mr, mi), "v2 2 groups/program")
    f1, a1 = run_v1()
    t_v1 = timed(f1, a1, "v1 pre-split bf16 table")
    v3 = run_v3()
    t_v3 = timed(v3, (sr, si, mr, mi), "v3 natural M@S, zxy out")
    # numeric cross-check v3 vs v0 (transposed)
    o0 = np.asarray(v0(sr, si, mr, mi)[5])
    o3 = np.asarray(v3(sr, si, mr, mi)[5])
    print("v0-vs-v3 max rel",
          np.abs(o0 - o3.T).max() / np.abs(o0).max(), flush=True)

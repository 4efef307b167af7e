"""Fused VMEM-resident matmul-DFT deconvolution kernel.

TPU-native replacement for the XLA ``rfftn -> Tikhonov filter -> irfftn``
deconvolution chain (reference semantics: biahub/deconvolve.py:34-70 via
waveorder's isotropic fluorescence model). XLA's TPU FFT runs far below the
HBM roofline here (~44 ms for a 256x256x1024 volume, ~85% of the 4-step
reconstruction chain), and XLA-level matmul-DFT rewrites lose on data
movement because every DFT stage round-trips HBM (docs/kernels.md). This
module fuses the whole inverse filter into three Pallas passes whose DFT
stages stay resident in VMEM:

- **Pass A** (grid over z): per z-slice, rfft along X and full DFT along Y
  as dense MXU matmuls — one HBM read of the volume, one write of the
  (re, im) half-spectrum.
- **Pass B** (grid over ky rows, ky-major layout): DFT along Z, the Tikhonov
  filter ``tf / (tf^2 + reg)``, and the inverse DFT along Z — fused, so the
  fully transformed spectrum never touches HBM. The (z, ky, kx) -> (ky, z,
  kx) transposes surrounding it are major-axis-only XLA copies; they buy
  whole-(Z, Xh)-tile operands (no sublane extraction) for the z contraction.
- **Pass C** (grid over z): inverse DFT along Y and irfft along X per slice,
  emitting the real volume.

Three shape-gated FLOP optimizations, all exact and all on for the flagship
256x256x1024 FOV:

- **Nyquist peel** (X % 256 == 0): kx = X/2 + 1 is 1 mod 128, so the dense
  passes would waste a fifth MXU tile-column on one lane; the Nyquist bin
  moves to a VPU (-1)^x reduction + a tiny XLA 2D chain, and every matmul
  runs at exactly 4 lane tiles.
- **Radix-2 z** (Z % 16 == 0): pass B's z-DFTs run as even/odd half-size
  dense transforms + twiddles — half the MXU FLOPs, and Z/2 = 128 is
  exactly the MXU tile depth at the flagship Z. Passes A/C write/read the
  even/odd-z split natively (separate arrays, no stride-2 relayout).
- **Radix-2 y** (Y % 16 == 0): the y-DFT in pass A runs decimation-in-
  frequency (sublane-HALF splits of the in-VMEM operand — aligned slices,
  not stride-2), emitting ky-even/odd spectra; pass C inverts with the
  matching decimation-in-time butterfly. Again half the y-DFT FLOPs.

Spectra are carried as split (re, im) float32 arrays: Mosaic has no complex
dtype, and the axon tunnel cannot fetch complex arrays anyway (CLAUDE.md).
Matmul precision (``BIAHUB_TPU_FFT_PRECISION``): the default ``high`` runs a
manual 2-term bf16 split (3 MXU passes; Mosaic has no native HIGH) at ~1e-5
relative error; ``highest`` keeps the full f32 mantissa (6 passes, ~6e-7)
when exactness matters more than throughput.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "deconvolve_zyx_pallas",
    "deconvolve_pallas_supported",
    "fourier_filter_zyx_pallas",
    "prepare_fourier_filter",
    "PreparedFilter",
    "pcc_corr_pallas",
    "pcc_pallas_supported",
    "pass_a_native_dtype_ok",
]

_VMEM_BUDGET_BYTES = 96 * 1024 * 1024


def _precision() -> str:
    """Matmul precision mode: high (manual 2-term bf16 split, 3 passes,
    ~1e-5 rel error — Mosaic has no native HIGH), highest (6 bf16 passes,
    ~6e-7), or default (1 bf16 pass, ~1e-2; throughput screening only)."""
    name = os.environ.get("BIAHUB_TPU_FFT_PRECISION", "high").lower()
    assert name in ("default", "high", "highest"), name
    return name


# ---------------------------------------------------------------------------
# DFT matrices (host-side, cached per axis length; f64 angles, f32 results)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _rfft_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, n//2+1) cos/sin matrices: F = v @ (C + iS) matches np.fft.rfft."""
    nh = n // 2 + 1
    ang = -2.0 * np.pi * np.outer(np.arange(n), np.arange(nh)) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=32)
def _dft_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, n) forward-DFT matrices applied from the left: G = W @ v."""
    ang = -2.0 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=32)
def _idft_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, n) inverse-DFT matrices with the 1/n normalization folded in."""
    ang = 2.0 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
    return (
        (np.cos(ang) / n).astype(np.float32),
        (np.sin(ang) / n).astype(np.float32),
    )


@lru_cache(maxsize=32)
def _irfft_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(n//2+1, n) matrices: v = Fr @ A + Fi @ B matches np.fft.irfft(F, n).

    Hermitian reassembly weights: the DC bin (and the Nyquist bin for even n)
    count once, every other half-spectrum bin twice.
    """
    nh = n // 2 + 1
    k = np.arange(nh)
    w = np.full(nh, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    ang = 2.0 * np.pi * np.outer(k, np.arange(n)) / n
    a = (w[:, None] * np.cos(ang) / n).astype(np.float32)
    b = (-w[:, None] * np.sin(ang) / n).astype(np.float32)
    return a, b


def _row(a: np.ndarray) -> np.ndarray:
    return a[None, :].astype(np.float32)


@lru_cache(maxsize=32)
def _radix_x_fwd_mats(x: int, level: int) -> tuple[np.ndarray, ...]:
    """Radix-2^level DIF matrices for the forward rfft along X (Nyquist
    peeled). The spectrum leaves in permuted lane order (level 1:
    [even | odd]; level 2: [4k | 4k+2 | 4k+1 | 4k+3]) — per-kx stages
    downstream are order-blind and the driver permutes the filter to match.

    Level 1 (M = x/2, Q = x/4): F[2k] = DFT_M(lo + hi)[k] and F[2k+1] =
    DFT_M((lo - hi) * tw1)[k] for k < Q share ONE (M, Q) cos/sin pair;
    tw1[x'] = exp(-2i*pi*x'/x) arrives as (1, M) twiddle rows.

    Level 2 recurses once more (O = x/8): the four quarter-streams
    s2 = slo+shi, d2 = (slo-shi)*tw2, e = dlo+dhi, f = (dlo-dhi)*tw2
    share ONE (Q, O) pair, 11 real dots total vs the dense 16.
    """
    m, q = x // 2, x // 4
    tw1 = -2.0 * np.pi * np.arange(m) / x
    if level == 1:
        ang = -2.0 * np.pi * np.outer(np.arange(m), np.arange(q)) / m
        return (
            np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32),
            _row(np.cos(tw1)),
            _row(np.sin(tw1)),
        )
    o = x // 8
    ang = -2.0 * np.pi * np.outer(np.arange(q), np.arange(o)) / q
    tw2 = -2.0 * np.pi * np.arange(q) / m
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
        _row(np.cos(tw1)),
        _row(np.sin(tw1)),
        _row(np.cos(tw2)),
        _row(np.sin(tw2)),
    )


@lru_cache(maxsize=32)
def _radix_x_inv_mats(x: int, level: int) -> tuple[np.ndarray, ...]:
    """Radix-2^level DIT matrices for the irfft along X, reversal-free.

    Level 1, from the permuted [even | odd] half-spectrum (Nyquist
    peeled): ``a = (rr_e * wrow) @ Prc - (ri_e * wrow) @ Pic`` is the
    half-period real inverse of the even bins; ``c = (rr_o + i ri_o) @
    (Prc + i Pic)`` and ``t = Re(e^{2i*pi*n/x} c) * 2/x`` (folded into the
    itw rows) give ``out = [a + t | a - t]`` — both lane halves in natural
    order, no lane-axis reversal anywhere.

    Level 2, from [4k | 4k+2 | 4k+1 | 4k+3]: quarter-period inverses
    a0 (real), c2/c1/c3 (complex) through one (O, Q) pair; the quarter
    phases i^p / (-i)^p turn into sign patterns on (Re, Im) parts:
    out = [a0+t2+u1r+u3r | a0-t2-u1i+u3i | a0+t2-u1r-u3r | a0-t2+u1i-u3i].
    """
    if level == 1:
        m, q = x // 2, x // 4
        ang = 2.0 * np.pi * np.outer(np.arange(q), np.arange(m)) / m
        w = np.full(q, 2.0)
        w[0] = 1.0
        itw = 2.0 * np.pi * np.arange(m) / x
        return (
            np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32),
            _row(w / x),
            _row(np.cos(itw) * 2.0 / x),
            _row(np.sin(itw) * 2.0 / x),
        )
    q, o = x // 4, x // 8
    ang = 2.0 * np.pi * np.outer(np.arange(o), np.arange(q)) / q
    w = np.full(o, 2.0)
    w[0] = 1.0
    n = np.arange(q)
    s = 2.0 / x
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
        _row(w / x),
        _row(np.cos(2 * np.pi * n * 2 / x) * s),
        _row(np.sin(2 * np.pi * n * 2 / x) * s),
        _row(np.cos(2 * np.pi * n / x) * s),
        _row(np.sin(2 * np.pi * n / x) * s),
        _row(np.cos(6 * np.pi * n / x) * s),
        _row(np.sin(6 * np.pi * n / x) * s),
    )


def _twiddles(n_half: int, n: int, sign: float) -> tuple[np.ndarray, np.ndarray]:
    """(n_half, 1) cos/sin columns of exp(sign * 2i*pi*k/n)."""
    ang = sign * 2.0 * np.pi * np.arange(n_half) / n
    return (
        np.cos(ang)[:, None].astype(np.float32),
        np.sin(ang)[:, None].astype(np.float32),
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _dot(a, b, prec):
    if prec == "high":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32)

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    precision = (
        jax.lax.Precision.HIGHEST if prec == "highest" else jax.lax.Precision.DEFAULT
    )
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=precision)


def _cdot(wr, wi, vr, vi, prec):
    """(wr + i wi) @ (vr + i vi) -> (re, im).

    ``highest`` runs the textbook four split dots; otherwise the Karatsuba
    3-multiplication form (m3 = (wr+wi)@(vr+vi), im = m3 - m1 - m2) trades
    one MXU matmul for two VPU adds — 25% fewer MXU passes on every complex
    stage. The cancellation in ``im`` grows the rounding error ~2x, still
    well inside the ``high`` mode's ~2e-5 envelope (tests/test_pallas_fft).
    """
    if prec == "highest":
        return (
            _dot(wr, vr, prec) - _dot(wi, vi, prec),
            _dot(wr, vi, prec) + _dot(wi, vr, prec),
        )
    m1 = _dot(wr, vr, prec)
    m2 = _dot(wi, vi, prec)
    m3 = _dot(wr + wi, vr + vi, prec)
    return m1 - m2, m3 - m1 - m2


def _cdot_r(vr, vi, wr, wi, prec):
    """(vr + i vi) @ (wr + i wi) -> (re, im), matrix on the right; same
    Karatsuba/4-dot split as :func:`_cdot`."""
    if prec == "highest":
        return (
            _dot(vr, wr, prec) - _dot(vi, wi, prec),
            _dot(vr, wi, prec) + _dot(vi, wr, prec),
        )
    m1 = _dot(vr, wr, prec)
    m2 = _dot(vi, wi, prec)
    m3 = _dot(vr + vi, wr + wi, prec)
    return m1 - m2, m3 - m1 - m2


def _fwd_yx_kernel(
    v_ref, cx_ref, sx_ref, wyr_ref, wyi_ref, *rest,
    prec, zb, peel, radix_z, radix_y, radix_x=False, slab=False,
):
    """rfft along X then DFT along Y of ``zb`` (Y, X) z-slices, all in VMEM.

    ``radix_x`` (requires peel): the X rfft runs decimation-in-frequency
    on the LANE halves — s = lo + hi and d = tw * (lo - hi) feed one shared
    (M, Q) cos/sin pair (cx_ref/sx_ref are the half-size matrices; the
    twiddle rows arrive first in ``rest``), emitting the spectrum in
    permuted [even-kx | odd-kx] lane order at 5/8 the dense MXU FLOPs.
    ``radix_y``: the y-DFT runs decimation-in-frequency — sublane-half
    splits s = lo+hi, d = tw*(lo-hi) feed two half-size dense transforms
    emitting ky-even/odd spectra. ``radix_z`` (requires zb == 2): spectra
    go to separate even-z/odd-z arrays for pass B's radix-2 z-DFT.
    ``peel``: the even-X Nyquist bin is dropped from the matmul width and
    emitted separately as a cheap VPU (-1)^x reduction.

    Output ref order: for each z-parity (1 or 2), for each ky-parity (1 or
    2): (re, im); then the Nyquist block when peeled.
    """
    if radix_x:
        txc_ref, txs_ref = rest[0], rest[1]
        rest = rest[2:]
        if radix_x == 2:
            tx2c_ref, tx2s_ref = rest[0], rest[1]
            rest = rest[2:]
    if radix_y:
        twyr_ref, twyi_ref = rest[0], rest[1]
        rest = rest[2:]
    ny = 2 if radix_y else 1
    nz = 2 if radix_z else 1
    spec_refs = rest[: nz * ny * 2]
    nyq_ref = rest[nz * ny * 2] if peel else None
    wyr = wyr_ref[:]
    wyi = wyi_ref[:]
    for j in range(zb):
        v = v_ref[j]  # (Y, X)
        if v.dtype in (jnp.uint16, jnp.int16):
            # Native camera-dtype ingest (pass_a_native_dtype_ok): the u16
            # operand rides into VMEM untouched (half the HBM read bytes of
            # a pre-cast f32 copy) and the bitcast to int16 happens HERE, in
            # registers — an XLA-level bitcast_convert before the
            # pallas_call materializes a full-volume HBM copy (0.41 ms/vol,
            # scripts/trace_u16.py). Mosaic has no unsigned converts, so:
            # sign-extend convert + wraparound fix, exact for the full u16
            # range.
            if v.dtype == jnp.uint16:
                v = jax.lax.bitcast_convert_type(v, jnp.int16)
            f = v.astype(jnp.float32)
            v = jnp.where(f < 0.0, f + 65536.0, f)
        elif v.dtype != jnp.float32:
            v = v.astype(jnp.float32)
        if radix_x:
            mh = txc_ref.shape[1]  # M = X/2
            s = v[:, :mh] + v[:, mh:]
            d0 = v[:, :mh] - v[:, mh:]
            cxe, sxe = cx_ref[:], sx_ref[:]
            dr = d0 * txc_ref[:]
            di = d0 * txs_ref[:]
            if radix_x == 2:
                qh = tx2c_ref.shape[1]  # Q = X/4
                t2c, t2s = tx2c_ref[:], tx2s_ref[:]
                s2 = s[:, :qh] + s[:, qh:]
                sd = s[:, :qh] - s[:, qh:]
                d2r = sd * t2c
                d2i = sd * t2s
                er, ei = dr[:, :qh] + dr[:, qh:], di[:, :qh] + di[:, qh:]
                fr0, fi0 = dr[:, :qh] - dr[:, qh:], di[:, :qh] - di[:, qh:]
                fr = fr0 * t2c - fi0 * t2s
                fi = fr0 * t2s + fi0 * t2c
                f0r, f0i = _dot(s2, cxe, prec), _dot(s2, sxe, prec)
                f2r, f2i = _cdot_r(d2r, d2i, cxe, sxe, prec)
                f1r, f1i = _cdot_r(er, ei, cxe, sxe, prec)
                f3r, f3i = _cdot_r(fr, fi, cxe, sxe, prec)
                xr = jnp.concatenate([f0r, f2r, f1r, f3r], axis=1)
                xi = jnp.concatenate([f0i, f2i, f1i, f3i], axis=1)
            else:
                xor_, xoi = _cdot_r(dr, di, cxe, sxe, prec)
                xr = jnp.concatenate([_dot(s, cxe, prec), xor_], axis=1)
                xi = jnp.concatenate([_dot(s, sxe, prec), xoi], axis=1)
        else:
            xr = _dot(v, cx_ref[:], prec)  # (Y, Xw)
            xi = _dot(v, sx_ref[:], prec)
        if radix_y:
            y2 = wyr.shape[0]
            sr, si = xr[:y2] + xr[y2:], xi[:y2] + xi[y2:]
            dr0, di0 = xr[:y2] - xr[y2:], xi[:y2] - xi[y2:]
            twr, twi = twyr_ref[:], twyi_ref[:]
            dr = twr * dr0 - twi * di0
            di = twr * di0 + twi * dr0
            results = [_cdot(wyr, wyi, sr, si, prec), _cdot(wyr, wyi, dr, di, prec)]
        else:
            results = [_cdot(wyr, wyi, xr, xi, prec)]
        if slab:
            # ky-major slab stores: the spectrum arrays are (ky, z, kx) and
            # each program writes 8 z-slots per parity into the STATIC
            # middle-axis slot j//2 — the free transpose direction (stores
            # into an 8-sublane middle axis; see docs/kernels.md). Kills
            # pass B's input-side XLA transposes.
            zpar, idx = j % 2, j // 2
            for kpar, (rr_, ii_) in enumerate(results):
                spec_refs[(zpar * ny + kpar) * 2][:, idx, :] = rr_
                spec_refs[(zpar * ny + kpar) * 2 + 1][:, idx, :] = ii_
        else:
            zpar = j if radix_z else 0
            idx = 0 if radix_z else j
            for kpar, (rr_, ii_) in enumerate(results):
                spec_refs[(zpar * ny + kpar) * 2][idx] = rr_
                spec_refs[(zpar * ny + kpar) * 2 + 1][idx] = ii_
        if peel:
            # Nyquist bin of the rfft: sum_x v * (-1)^x, exact on the VPU.
            sign = 1.0 - 2.0 * (
                jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) % 2
            ).astype(jnp.float32)
            nyq = jnp.sum(v * sign, axis=1, keepdims=True)  # (Y, 1)
            lane0 = (
                jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], 128), 1) == 0
            ).astype(jnp.float32)
            nyq_ref[j] = nyq * lane0  # (Y, 128), data in lane 0


def _dense_z_chain(gr, gi, wzr, wzi, izr, izi, filt_fn, prec):
    """Dense DFT_z -> filter -> iDFT_z on one (Z, Xw) complex tile."""
    hr, hi = _cdot(wzr, wzi, gr, gi, prec)
    hr, hi = filt_fn(hr, hi)
    return _cdot(izr, izi, hr, hi, prec)


def _radix_z_chain(er, ei, or_, oi, wzr, wzi, izr, izi, twr, twi, filt_fn, prec):
    """Radix-2 DFT_z -> filter -> iDFT_z on even/odd (Z/2, Xw) tiles.

    Decimation in time: X_lo = E + tw*O, X_hi = E - tw*O with half-size dense
    DFTs E, O and twiddles tw[k] = exp(-2i*pi*k/Z) — (Z/2, Z/2) matmuls at
    half the FLOPs of the dense (Z, Z) transform, and Z/2 = 128 is exactly
    the MXU tile depth at the flagship Z = 256. The inverse mirrors it:
    x_even = iDFT(X_lo + X_hi)/2, x_odd = iDFT(conj(tw)*(X_lo - X_hi))/2
    (the /2 is folded into the iDFT matrices by the driver). ``filt_fn``
    filters the CONCATENATED-k spectrum (lo;hi halves stacked on sublanes).
    """
    ehr, ehi = _cdot(wzr, wzi, er, ei, prec)
    ohr, ohi = _cdot(wzr, wzi, or_, oi, prec)
    tr = twr * ohr - twi * ohi
    ti = twr * ohi + twi * ohr
    lo_r, lo_i = ehr + tr, ehi + ti
    hi_r, hi_i = ehr - tr, ehi - ti
    lo_r, lo_i, hi_r, hi_i = filt_fn(lo_r, lo_i, hi_r, hi_i)
    sr, si = lo_r + hi_r, lo_i + hi_i
    dr0, di0 = lo_r - hi_r, lo_i - hi_i
    dr = twr * dr0 + twi * di0  # conj(tw) * (lo - hi)
    di = twr * di0 - twi * dr0
    xer, xei = _cdot(izr, izi, sr, si, prec)
    xor_, xoi = _cdot(izr, izi, dr, di, prec)
    return xer, xei, xor_, xoi


def _pass_b_kernel(*refs, reg, prec, radix_z, ny, n_filt, rows=1, slab=False):
    """Generic pass B: per ky row (one per ky parity when split), run the
    z-DFT -> filter -> iDFT_z chain, dense or radix-2.

    Ref order: spectra in (nz*ny*2) + filters (n_filt*ny) + z matrices
    (4 dense / 6 radix) + spectra out (nz*ny*2). ``reg`` selects the
    Tikhonov filter (n_filt == 1 per parity) vs complex (re, im) filters.

    ``slab`` mode processes ``rows`` ky rows per program: inputs arrive as
    ky-leading (rows, Z', Xt) blocks (leading-axis reads are free) and the
    filtered spectrum is stored Z-MAJOR into (Z', rows, Xt) blocks via
    static middle-axis slots — the free transpose direction — so pass C's
    input-side XLA transposes never materialize.
    """
    nz = 2 if radix_z else 1
    nspec = nz * ny * 2
    ins = refs[:nspec]
    filts = refs[nspec : nspec + n_filt * ny]
    mats = refs[nspec + n_filt * ny : -nspec]
    outs = refs[-nspec:]

    def store(idx, r, val):
        if slab:
            outs[idx][:, r, :] = val
        else:
            outs[idx][0] = val

    for r in range(rows):
        for kpar in range(ny):
            def filt_fn_full(hr, hi, _k=kpar, _r=r):
                if reg == "pre":  # Tikhonov transform pre-applied (prepared)
                    f = filts[_k][_r]
                    return hr * f, hi * f
                if reg is not None:
                    tf = filts[_k][_r]
                    f = tf / (tf * tf + reg)
                    return hr * f, hi * f
                fr, fi = filts[2 * _k][_r], filts[2 * _k + 1][_r]
                return hr * fr - hi * fi, hr * fi + hi * fr

            if radix_z:
                wzr, wzi, izr, izi, twr, twi = (m[:] for m in mats)
                z2 = wzr.shape[0]

                def filt_fn(lo_r, lo_i, hi_r, hi_i, _k=kpar, _r=r):
                    if reg == "pre":
                        f = filts[_k][_r]
                        return (
                            lo_r * f[:z2], lo_i * f[:z2],
                            hi_r * f[z2:], hi_i * f[z2:],
                        )
                    if reg is not None:
                        tf = filts[_k][_r]
                        f = tf / (tf * tf + reg)
                        return (
                            lo_r * f[:z2], lo_i * f[:z2],
                            hi_r * f[z2:], hi_i * f[z2:],
                        )
                    fr, fi = filts[2 * _k][_r], filts[2 * _k + 1][_r]
                    flr, fli, fhr, fhi = fr[:z2], fi[:z2], fr[z2:], fi[z2:]
                    return (
                        lo_r * flr - lo_i * fli,
                        lo_r * fli + lo_i * flr,
                        hi_r * fhr - hi_i * fhi,
                        hi_r * fhi + hi_i * fhr,
                    )

                xer, xei, xor_, xoi = _radix_z_chain(
                    ins[(0 * ny + kpar) * 2][r],
                    ins[(0 * ny + kpar) * 2 + 1][r],
                    ins[(1 * ny + kpar) * 2][r],
                    ins[(1 * ny + kpar) * 2 + 1][r],
                    wzr, wzi, izr, izi, twr, twi, filt_fn, prec,
                )
                store((0 * ny + kpar) * 2, r, xer)
                store((0 * ny + kpar) * 2 + 1, r, xei)
                store((1 * ny + kpar) * 2, r, xor_)
                store((1 * ny + kpar) * 2 + 1, r, xoi)
            else:
                wzr, wzi, izr, izi = (m[:] for m in mats)
                xr_, xi_ = _dense_z_chain(
                    ins[kpar * 2][r], ins[kpar * 2 + 1][r],
                    wzr, wzi, izr, izi, filt_fn_full, prec,
                )
                store(kpar * 2, r, xr_)
                store(kpar * 2 + 1, r, xi_)


def _inv_yx_kernel(*refs, prec, zb, peel, radix_z, radix_y, radix_x=False,
                   yzx_pad=None):
    """Inverse DFT along Y then irfft along X of ``zb`` (Y, Xw) slices.

    ``radix_x``: the spectrum arrives in permuted [even-kx | odd-kx] lane
    order and the irfft runs reversal-free decimation-in-time — the even
    bins' half-period real inverse ``a`` plus the odd bins' twiddled
    complex inverse ``t`` give ``out = [a + t | a - t]``, both halves in
    natural lane order (see _radix_x_inv_mats). ar/ai refs carry the shared
    half-size (Q, M) cos/sin pair; wrow + itw rows follow them.

    ``radix_y``: the spectra arrive ky-even/odd and the inverse runs the
    decimation-in-time butterfly — x_lo = A + ctw*B, x_hi = A - ctw*B with
    half-size dense inverse transforms A, B (the /2 folded into the
    matrices) and ctw[n] = exp(+2i*pi*n/Y). ``radix_z``: the spectra arrive
    as even-z/odd-z array pairs and the program writes the two consecutive
    real-z slices of its (2, Y, X) output block. ``peel``: the precomputed
    real Nyquist plane (lane 0 of a (zb, Y, 128) block) is broadcast-added
    with the (-1)^x basis on the VPU.

    ``yzx_pad`` (chain mode, zb == 8): the output array is (Y + pad, Z, X) —
    the transposed, front-edge-padded layout the fused deskew kernel
    consumes directly. Each slice stores into the STATIC sublane slot
    ``[:, j, :]`` (stores into an 8-sublane middle axis are fast; only
    extraction reads relayout) and the pad rows replicate tilt row 0,
    reproducing deskew's ``jnp.pad(..., mode="edge")`` prep for free.
    """
    ny = 2 if radix_y else 1
    nz = 2 if radix_z else 1
    spec_refs = refs[: nz * ny * 2]
    rest = refs[nz * ny * 2 :]
    iyr_ref, iyi_ref = rest[0], rest[1]
    rest = rest[2:]
    if radix_y:
        ctwr_ref, ctwi_ref = rest[0], rest[1]
        rest = rest[2:]
    ar_ref, ai_ref = rest[0], rest[1]
    rest = rest[2:]
    if radix_x == 1:
        wrow_ref, itwc_ref, itws_ref = rest[0], rest[1], rest[2]
        rest = rest[3:]
    elif radix_x == 2:
        (wrow_ref, t2c_ref, t2s_ref, t1c_ref, t1s_ref, t3c_ref,
         t3s_ref) = rest[:7]
        rest = rest[7:]
    nyq_ref = rest[0] if peel else None
    out_ref = rest[1] if peel else rest[0]
    iyr = iyr_ref[:]
    iyi = iyi_ref[:]
    for j in range(zb):
        zpar = (j % 2) if radix_z else 0
        idx = (j // 2) if radix_z else j
        if radix_y:
            er = spec_refs[(zpar * ny + 0) * 2][idx]
            ei = spec_refs[(zpar * ny + 0) * 2 + 1][idx]
            orr = spec_refs[(zpar * ny + 1) * 2][idx]
            ori = spec_refs[(zpar * ny + 1) * 2 + 1][idx]
            a_r, a_i = _cdot(iyr, iyi, er, ei, prec)
            b_r, b_i = _cdot(iyr, iyi, orr, ori, prec)
            ctwr, ctwi = ctwr_ref[:], ctwi_ref[:]
            p_r = ctwr * b_r - ctwi * b_i
            p_i = ctwr * b_i + ctwi * b_r
            rr = jnp.concatenate([a_r + p_r, a_r - p_r], axis=0)
            ri = jnp.concatenate([a_i + p_i, a_i - p_i], axis=0)
        else:
            hr = spec_refs[zpar * 2][idx]
            hi = spec_refs[zpar * 2 + 1][idx]
            rr, ri = _cdot(iyr, iyi, hr, hi, prec)
        if radix_x == 2:
            prc, pic = ar_ref[:], ai_ref[:]
            o = prc.shape[0]  # O = Xw/4
            w = wrow_ref[:]
            a0 = (_dot(rr[:, :o] * w, prc, prec)
                  - _dot(ri[:, :o] * w, pic, prec))
            c2r, c2i = _cdot_r(rr[:, o:2*o], ri[:, o:2*o], prc, pic, prec)
            c1r, c1i = _cdot_r(rr[:, 2*o:3*o], ri[:, 2*o:3*o], prc, pic,
                               prec)
            c3r, c3i = _cdot_r(rr[:, 3*o:], ri[:, 3*o:], prc, pic, prec)
            t2c, t2s = t2c_ref[:], t2s_ref[:]
            t1c, t1s = t1c_ref[:], t1s_ref[:]
            t3c, t3s = t3c_ref[:], t3s_ref[:]
            t2 = c2r * t2c - c2i * t2s
            u1r = c1r * t1c - c1i * t1s
            u1i = c1r * t1s + c1i * t1c
            u3r = c3r * t3c - c3i * t3s
            u3i = c3r * t3s + c3i * t3c
            out = jnp.concatenate([
                a0 + t2 + u1r + u3r,
                a0 - t2 - u1i + u3i,
                a0 + t2 - u1r - u3r,
                a0 - t2 + u1i - u3i,
            ], axis=1)
        elif radix_x:
            prc, pic = ar_ref[:], ai_ref[:]
            q = prc.shape[0]  # Q = Xw/2
            w = wrow_ref[:]
            a = _dot(rr[:, :q] * w, prc, prec) - _dot(ri[:, :q] * w, pic, prec)
            cr_, ci_ = _cdot_r(rr[:, q:], ri[:, q:], prc, pic, prec)
            t = cr_ * itwc_ref[:] - ci_ * itws_ref[:]
            out = jnp.concatenate([a + t, a - t], axis=1)
        else:
            out = _dot(rr, ar_ref[:], prec) + _dot(ri, ai_ref[:], prec)
        if peel:
            sign = 1.0 - 2.0 * (
                jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) % 2
            ).astype(jnp.float32)
            out = out + nyq_ref[j, :, 0:1] * sign
        if yzx_pad is None:
            out_ref[j] = out
        else:
            out_ref[yzx_pad:, j, :] = out
            if yzx_pad:
                out_ref[:yzx_pad, j, :] = jnp.broadcast_to(
                    out[0:1], (yzx_pad,) + out.shape[1:]
                )


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def deconvolve_pallas_supported(shape: tuple[int, int, int]) -> bool:
    """True when the fused kernel should handle this volume shape."""
    if os.environ.get("BIAHUB_TPU_NO_PALLAS") == "1":
        return False
    force = os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
    if jax.default_backend() != "tpu" and not force:
        return False
    z, y, x = shape
    if min(z, y, x) < 2:
        return False
    xh = x // 2 + 1
    f32 = 4
    # Pass A working set: 2-slice block + rfft/DFT matrices + spectrum
    # slices, doubled for Mosaic's pipeline buffering.
    pass_a = (2 * y * x + 2 * x * xh + 2 * y * y + 12 * y * xh) * f32 * 2
    # Pass B: per-ky-row (Z, Xh) tiles — up to four inputs (complex filters)
    # + two outputs, double-buffered, plus four (Z, Z) matrices and the
    # hr/hi + bf16-split temporaries (single-buffered).
    pass_b = (6 * 2 * z * xh + 4 * z * xh + 4 * z * z) * f32
    pass_c = (6 * y * xh + 2 * y * y + 2 * x * xh + y * x) * f32 * 2
    return max(pass_a, pass_b, pass_c) < _VMEM_BUDGET_BYTES


def pass_a_native_dtype_ok(shape: tuple[int, int, int], dtype) -> bool:
    """True when pass A can ingest this dtype natively (converting to f32
    in VMEM) instead of requiring a materialized f32 copy in HBM.

    uint16 is the mantis camera dtype (reference reads it natively,
    biahub/deskew.py:554-582): reading it raw halves pass A's input bytes
    AND removes the XLA cast pass (a full read+write of the volume) in
    front of the pipeline. Gated on 16-bit Mosaic tiling: the (zb, Y, X)
    input blocks need the sublane axis a multiple of the 16-row 16-bit
    tile and the lane axis a 128 multiple.
    """
    z, y, x = (int(s) for s in shape)
    if jnp.dtype(dtype) != jnp.uint16:
        return False
    return y % 16 == 0 and x % 128 == 0


def _pipeline_flags(z: int, y: int, x: int):
    """Static per-shape decisions shared by the driver and the filter
    preparer (peel, xw, radix levels). Kept in ONE place so a
    :func:`prepare_fourier_filter` result can never disagree with the
    pipeline that consumes it (same shape + same env knobs)."""
    xh = x // 2 + 1
    peel = x % 2 == 0 and xh % 128 == 1 and xh > 1
    xw = xh - 1 if peel else xh
    radix_min = int(os.environ.get("BIAHUB_TPU_FFT_RADIX_MIN", "256"))
    radix_z = z % 16 == 0 and z >= radix_min
    radix_y = y % 16 == 0 and y >= radix_min
    interpret = jax.default_backend() != "tpu"
    # Radix-2/4 X rides the Nyquist peel (xw = X/2): DIF halves/quarters on
    # the lane axis forward, reversal-free DIT inverse, spectrum carried in
    # permuted kx lane order (level 1 [even | odd]; level 2
    # [4k | 4k+2 | 4k+1 | 4k+3]). Compiled mode needs every lane
    # concat/slice boundary on a 128 multiple. BIAHUB_TPU_FFT_RADIX_X_MAX
    # caps the level (tests use it to pin level 1).
    radix_x = 0
    if peel and x >= radix_min:
        x_max = int(os.environ.get("BIAHUB_TPU_FFT_RADIX_X_MAX", "2"))
        if x % 8 == 0 and (interpret or x % 1024 == 0) and x_max >= 2:
            radix_x = 2
        elif x % 4 == 0 and (interpret or x % 512 == 0) and x_max >= 1:
            radix_x = 1
    return peel, xw, radix_x, radix_y, radix_z, interpret


class _Geom(NamedTuple):
    """Static per-shape pipeline geometry (derived from _pipeline_flags)."""

    z: int
    y: int
    x: int
    peel: bool
    xw: int
    radix_x: int
    radix_y: bool
    radix_z: bool
    interpret: bool
    zb: int
    z2: int
    y2: int
    nz: int
    ny: int
    yw: int
    zw: int


def _geometry(z: int, y: int, x: int) -> _Geom:
    peel, xw, radix_x, radix_y, radix_z, interpret = _pipeline_flags(z, y, x)
    zb = 2 if z % 2 == 0 else 1
    z2, y2 = z // 2, y // 2
    nz = 2 if radix_z else 1
    ny = 2 if radix_y else 1
    return _Geom(
        z, y, x, peel, xw, radix_x, radix_y, radix_z, interpret, zb, z2, y2,
        nz, ny, y2 if radix_y else y, z2 if radix_z else z,
    )


class _Mats(NamedTuple):
    """Device copies of the DFT matrices one _Geom needs, fwd + inv."""

    cx: jax.Array
    sx: jax.Array
    x_fwd_extra: tuple
    ax: jax.Array
    bx: jax.Array
    x_inv_extra: tuple
    wyr: jax.Array
    wyi: jax.Array
    iyr: jax.Array
    iyi: jax.Array
    y_fwd_tw: tuple  # (twyr, twyi) when radix_y else ()
    y_inv_tw: tuple  # (ctwr, ctwi) when radix_y else ()
    b_mats_v: tuple  # z-DFT matrices for pass B (4 dense / 6 radix)


def _build_mats(g: _Geom) -> _Mats:
    if g.radix_x:
        mats = _radix_x_fwd_mats(g.x, g.radix_x)
        cx, sx, *x_fwd_extra = (jnp.asarray(m) for m in mats)
        imats = _radix_x_inv_mats(g.x, g.radix_x)
        ax, bx, *x_inv_extra = (jnp.asarray(m) for m in imats)
    else:
        cx, sx = (jnp.asarray(m[:, : g.xw]) for m in _rfft_mats(g.x))
        ax, bx = (jnp.asarray(m[: g.xw]) for m in _irfft_mats(g.x))
        x_fwd_extra = []
        x_inv_extra = []
    if g.radix_y:
        wyr, wyi = (jnp.asarray(m) for m in _dft_mats(g.y2))
        iyr, iyi = (jnp.asarray(m / 2.0) for m in _idft_mats(g.y2))
        y_fwd_tw = tuple(jnp.asarray(m) for m in _twiddles(g.y2, g.y, -1.0))
        y_inv_tw = tuple(jnp.asarray(m) for m in _twiddles(g.y2, g.y, +1.0))
    else:
        wyr, wyi = (jnp.asarray(m) for m in _dft_mats(g.y))
        iyr, iyi = (jnp.asarray(m) for m in _idft_mats(g.y))
        y_fwd_tw = ()
        y_inv_tw = ()
    if g.radix_z:
        wzr, wzi = (jnp.asarray(m) for m in _dft_mats(g.z2))
        izr, izi = (jnp.asarray(m / 2.0) for m in _idft_mats(g.z2))
        tzr, tzi = (jnp.asarray(m) for m in _twiddles(g.z2, g.z, -1.0))
        b_mats_v = (wzr, wzi, izr, izi, tzr, tzi)
    else:
        wzr, wzi = (jnp.asarray(m) for m in _dft_mats(g.z))
        izr, izi = (jnp.asarray(m) for m in _idft_mats(g.z))
        b_mats_v = (wzr, wzi, izr, izi)
    return _Mats(
        cx, sx, tuple(x_fwd_extra), ax, bx, tuple(x_inv_extra),
        wyr, wyi, iyr, iyi, y_fwd_tw, y_inv_tw, b_mats_v,
    )


def _vmem_params(interpret: bool) -> dict:
    """Raise the scoped-VMEM budget: working sets exceed the 16 MB default
    at flagship shapes, and the kernels are MXU-bound, so trading pipeline
    headroom for big blocks is the right side of the bargain."""
    if interpret:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET_BYTES
        )
    }


def _t01(a):
    return jnp.transpose(a, (1, 0, 2))


def _run_pass_a(v: jax.Array, g: _Geom, m: _Mats, prec: str):
    """Forward rfft_X + DFT_Y over every z slice (pass A of both pipelines).

    Returns ``(spectra, nyq_raw)`` with ``spectra`` ALWAYS in the ky-major
    (yw, z-dim, xw) layout pass B consumes — emitted natively by the slab
    kernel when the gates allow, via XLA transposes otherwise — and
    ``nyq_raw`` the (z, y, 128) peeled-Nyquist block (None when not peeled).
    """
    nspec = g.nz * g.ny * 2
    zb = g.zb
    # Slab mode: 16 z-slices per program, spectra stored DIRECTLY in the
    # ky-major (ky, z, kx) layout pass B consumes (8 static middle-axis
    # z-slots per parity per program) — pass B's input-side XLA transposes
    # never materialize.
    slab_a = g.radix_z and g.z % 16 == 0 and (
        (16 * g.y * g.x + nspec * g.yw * 8 * g.xw
         + (16 * g.y * 128 if g.peel else 0)) * 4 * 2
        < _VMEM_BUDGET_BYTES - 16 * 1024 * 1024
    )
    if slab_a:
        zb = 16
        a_spec = pl.BlockSpec((g.yw, 8, g.xw), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        a_shape = jax.ShapeDtypeStruct((g.yw, g.z2, g.xw), jnp.float32)
    elif g.radix_z:
        a_spec = pl.BlockSpec((1, g.yw, g.xw), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        a_shape = jax.ShapeDtypeStruct((g.z2, g.yw, g.xw), jnp.float32)
    else:
        a_spec = pl.BlockSpec((zb, g.yw, g.xw), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        a_shape = jax.ShapeDtypeStruct((g.z, g.yw, g.xw), jnp.float32)
    a_out_specs = [a_spec] * nspec
    a_out_shapes = [a_shape] * nspec
    if g.peel:
        a_out_specs.append(
            pl.BlockSpec((zb, g.y, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        a_out_shapes.append(jax.ShapeDtypeStruct((g.z, g.y, 128), jnp.float32))
    a_extra = m.x_fwd_extra + m.y_fwd_tw
    a_extra_specs = [_full_spec(tuple(e.shape)) for e in m.x_fwd_extra]
    a_extra_specs += [_full_spec((g.y2, 1))] * 2 if g.radix_y else []
    a_out = pl.pallas_call(
        partial(
            _fwd_yx_kernel,
            prec=prec, zb=zb, peel=g.peel, radix_z=g.radix_z,
            radix_y=g.radix_y, radix_x=g.radix_x, slab=slab_a,
        ),
        grid=(g.z // zb,),
        in_specs=[
            pl.BlockSpec((zb, g.y, g.x), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(tuple(m.cx.shape)),
            _full_spec(tuple(m.cx.shape)),
            _full_spec((g.yw, g.yw)),
            _full_spec((g.yw, g.yw)),
        ]
        + a_extra_specs,
        out_specs=tuple(a_out_specs),
        out_shape=tuple(a_out_shapes),
        interpret=g.interpret,
        **_vmem_params(g.interpret),
    )(v, m.cx, m.sx, m.wyr, m.wyi, *a_extra)
    spectra = list(a_out[:nspec])
    if not slab_a:
        spectra = [_t01(s) for s in spectra]
    return spectra, (a_out[-1] if g.peel else None)


def _full_spec(shape):
    return pl.BlockSpec(
        shape, lambda *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )


def _build_filt_main(filter_arrays, xw, radix_x, radix_y, n_filt):
    """Filter blocks for pass B: drop the peeled bin, permute kx lanes to
    the radix-x order when engaged, split ky parity to match the spectra
    convention, and go ky-major for the per-row blocks."""
    def t01(a):
        return jnp.transpose(a, (1, 0, 2))

    def fprep(f):
        fm = f[..., :xw]
        if radix_x == 1:
            fm = jnp.concatenate([fm[..., 0::2], fm[..., 1::2]], axis=-1)
        elif radix_x == 2:
            fm = jnp.concatenate(
                [fm[..., 0::4], fm[..., 2::4], fm[..., 1::4], fm[..., 3::4]],
                axis=-1,
            )
        return fm

    if radix_y:
        filt_main = []
        for f in filter_arrays:
            fm = fprep(f)
            filt_main.extend([t01(fm[:, 0::2, :]), t01(fm[:, 1::2, :])])
        # Reorder to (kpar, filt) = [f0_e, f1_e, f0_o, f1_o] -> per-kpar sets
        if n_filt == 2:
            filt_main = [filt_main[0], filt_main[2], filt_main[1], filt_main[3]]
    else:
        filt_main = [t01(fprep(f)) for f in filter_arrays]
    return filt_main


class PreparedFilter(NamedTuple):
    """Device-resident filter blocks pre-arranged for the 3-pass engine.

    The per-call filter preparation (Tikhonov transform, peeled-bin slice,
    radix-x kx lane permute, ky-parity split, ky-major transposes) costs
    ~1.5 ms of XLA copies per batched call at the flagship FOV; the
    transfer function is constant across an acquisition, so verbs hoist it
    once via :func:`prepare_fourier_filter` and pass the result through
    ``prepared=``. NamedTuple of arrays -> a valid jit-traceable pytree.
    """

    main: tuple  # ky-major per-parity pass-B filter blocks
    nyq: tuple   # transformed (Z, Y) Nyquist planes (empty when no peel)


def prepare_fourier_filter(
    shape: tuple[int, int, int],
    filter_arrays,
    regularization_strength: float | None = None,
) -> PreparedFilter:
    """Pre-arrange a deconvolution/Fourier filter for ``shape`` volumes.

    Tikhonov mode (``regularization_strength`` set): ``filter_arrays`` is
    ``(tf_half,)`` and the inverse-filter transform ``tf/(tf^2+reg)`` is
    folded in here. Hermitian-complex mode: ``filter_arrays`` is
    ``(re_half, im_half)``. The result is only valid for this volume shape
    and the current env knobs (the pipeline validates block shapes).
    """
    z, y, x = (int(s) for s in shape)
    peel, xw, radix_x, radix_y, _, _ = _pipeline_flags(z, y, x)
    if regularization_strength is not None:
        tf = filter_arrays[0].astype(jnp.float32)
        reg = float(regularization_strength)
        arrays = (tf / (tf * tf + reg),)
    else:
        arrays = tuple(f.astype(jnp.float32) for f in filter_arrays)
    main = _build_filt_main(arrays, xw, radix_x, radix_y, len(arrays))
    planes = tuple(f[..., -1] for f in arrays) if peel else ()
    return PreparedFilter(main=tuple(main), nyq=planes)


def _nyq_filter_chain(nyq_raw, filter_planes, reg, x):
    """XLA transform chain for the peeled Nyquist-kx plane.

    ``nyq_raw`` (Z, Y) is the real (-1)^x reduction from pass A; the plane's
    y/z DFTs, filter, and inverse DFTs are a 2D problem ~1000x smaller than
    the main spectrum, so XLA f32 FFTs handle it exactly. ``filter_planes``
    are the filters' (Z, Y) Nyquist slices (``f[..., -1]``) — planes only,
    so sharded callers never replicate whole filter volumes. Returns the
    REAL plane pass C broadcast-adds with the (-1)^x basis, with the irfft's
    1/X normalization folded in (the Nyquist bin's Hermitian weight is 1).
    """
    spec = jnp.fft.fftn(nyq_raw.astype(jnp.complex64), axes=(0, 1))
    if reg == "pre":
        spec = spec * filter_planes[0]  # Tikhonov transform pre-applied
    elif reg is not None:
        tf = filter_planes[0]
        spec = spec * (tf / (tf * tf + reg))
    else:
        fr, fi = filter_planes
        spec = spec * jax.lax.complex(fr, fi)
    plane = jnp.real(jnp.fft.ifftn(spec, axes=(0, 1))) / x
    return plane.astype(jnp.float32)


def _run_fourier_pipeline(zyx_data: jax.Array, filter_arrays, reg=None,
                          yzx_pad=None, prepared=None):
    """Shared 3-pass driver (see the module docstring). ``reg`` selects the
    Tikhonov kernels (filter_arrays = (tf,)); None selects the
    complex-Hermitian-filter kernels (filter_arrays = (re, im)).

    ``yzx_pad``: chain mode — pass C emits (Y + yzx_pad, Z, X) with the
    front rows edge-replicated, the exact input layout of the fused deskew
    kernel (kernels/chain.py). ``prepared``: a :class:`PreparedFilter` for
    this shape — the per-call filter arrangement (and the Tikhonov
    transform) is skipped and ``filter_arrays`` may be None."""
    z, y, x = zyx_data.shape
    # Radix-2 only pays when the HALF transform still fills the MXU's 128
    # contraction depth: at n < 256 the half-size (n/2, n/2) matmuls run at
    # n/256 utilization, eating the 2x FLOP saving (measured: it slowed the
    # 64x256x256 phase reconstruction). Tests shrink the floor via env to
    # exercise the radix kernels on tiny shapes in interpret mode.
    g = _geometry(z, y, x)
    peel, xw, radix_x, radix_y, radix_z, interpret = (
        g.peel, g.xw, g.radix_x, g.radix_y, g.radix_z, g.interpret,
    )
    zb, z2, y2, nz, ny, yw, zw = g.zb, g.z2, g.y2, g.nz, g.ny, g.yw, g.zw
    n_filt = 1 if reg is not None else 2
    prec = _precision()
    if prepared is not None:
        if len(prepared.main) != n_filt * ny or tuple(
            prepared.main[0].shape
        ) != (yw, z, xw):
            raise ValueError(
                "PreparedFilter does not match this volume shape / env "
                f"config: got {len(prepared.main)} blocks of "
                f"{tuple(prepared.main[0].shape)}, expected "
                f"{n_filt * ny} of {(yw, z, xw)}. Rebuild it with "
                "prepare_fourier_filter under the same settings."
            )
        # The Tikhonov transform is folded into the prepared blocks.
        reg = "pre" if reg is not None else None

    m = _build_mats(g)
    ax, bx, x_inv_extra = m.ax, m.bx, m.x_inv_extra
    iyr, iyi = m.iyr, m.iyi
    b_mats_v = m.b_mats_v
    if radix_y:
        ctwr, ctwi = m.y_inv_tw

    if pass_a_native_dtype_ok((z, y, x), zyx_data.dtype):
        # Pass A bitcasts + converts in VMEM registers; no f32 copy in HBM
        # and no XLA-level bitcast (which materializes a full-volume copy —
        # scripts/trace_u16.py).
        v = zyx_data
    else:
        v = zyx_data.astype(jnp.float32)
    full = _full_spec
    vmem_params = _vmem_params(interpret)

    # -- Pass A ------------------------------------------------------------
    nspec = nz * ny * 2
    spectra, nyq_raw = _run_pass_a(v, g, m, prec)
    nyq_plane = None
    if peel:
        planes = (
            prepared.nyq
            if prepared is not None
            else tuple(f[..., -1] for f in filter_arrays)
        )
        nyq_plane = _nyq_filter_chain(nyq_raw[..., 0], planes, reg, x)

    # -- Pass B ------------------------------------------------------------
    t01 = _t01

    # Filter blocks: hoisted to prepare_fourier_filter when the caller
    # passes a PreparedFilter (the arrangement is ~1.5 ms of XLA copies per
    # call at the flagship FOV and the filter is constant per acquisition).
    filt_main = (
        list(prepared.main)
        if prepared is not None
        else _build_filt_main(filter_arrays, xw, radix_x, radix_y, n_filt)
    )

    # Slab mode: 8 ky rows per program reading ky-leading blocks and storing
    # the filtered spectrum Z-MAJOR via static middle-axis slots — pass C's
    # input-side transposes never materialize. The lane axis is tiled (xt)
    # to keep the 8-row working set inside the VMEM budget.
    slab_b = yw % 8 == 0
    xt = xw
    if slab_b:
        def b_vmem(cand):
            return (
                nspec * 8 * zw * cand * 2 + n_filt * ny * 8 * z * cand
            ) * 4 * 2
        xt = None
        cand = xw
        while cand >= 1:
            # Store DMA chunks are (8, xt) f32: below 16 KB the z-major
            # strided stores cost more than the transposes they replace
            # (measured: xt=256 at the flagship ran SLOWER than no slab;
            # the 64x256x256 recon FOV at xt=128 regressed 2.9 -> 6.1 ms).
            ok_align = interpret or (cand % 128 == 0 and cand * 8 * 4 >= 16384)
            if xw % cand == 0 and ok_align and (
                b_vmem(cand) < _VMEM_BUDGET_BYTES - 6 * 1024 * 1024
            ):
                xt = cand
                break
            cand //= 2
        if xt is None:
            slab_b = False

    b_kernel = partial(
        _pass_b_kernel,
        reg=reg if reg in (None, "pre") else float(reg),
        prec=prec, radix_z=radix_z, ny=ny, n_filt=n_filt,
    )
    b_args = (*spectra, *filt_main, *b_mats_v)
    if slab_b:
        def fullb(shape):
            return pl.BlockSpec(
                shape, lambda i, jx: (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )

        filtered = pl.pallas_call(
            partial(b_kernel, rows=8, slab=True),
            grid=(yw // 8, xw // xt),
            in_specs=(
                [pl.BlockSpec((8, zw, xt), lambda i, jx: (i, 0, jx),
                              memory_space=pltpu.VMEM)] * nspec
                + [pl.BlockSpec((8, z, xt), lambda i, jx: (i, 0, jx),
                                memory_space=pltpu.VMEM)] * len(filt_main)
                + [fullb(tuple(m.shape)) for m in b_mats_v]
            ),
            out_specs=(
                pl.BlockSpec((zw, 8, xt), lambda i, jx: (0, i, jx),
                             memory_space=pltpu.VMEM),
            ) * nspec,
            out_shape=tuple(
                jax.ShapeDtypeStruct((zw, yw, xw), jnp.float32)
                for _ in range(nspec)
            ),
            interpret=interpret,
            **vmem_params,
        )(*b_args)
    else:
        spec_row = pl.BlockSpec((1, zw, xw), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        spec_filt = pl.BlockSpec((1, z, xw), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        b_mats_specs = [full(tuple(m.shape)) for m in b_mats_v]
        filtered = pl.pallas_call(
            b_kernel,
            grid=(yw,),
            in_specs=[spec_row] * nspec + [spec_filt] * len(filt_main)
            + b_mats_specs,
            out_specs=(spec_row,) * nspec,
            out_shape=tuple(
                jax.ShapeDtypeStruct((yw, zw, xw), jnp.float32)
                for _ in range(nspec)
            ),
            # The forward spectrum is dead after this pass — reuse buffers.
            input_output_aliases={i: i for i in range(nspec)},
            interpret=interpret,
            **vmem_params,
        )(*b_args)

    # -- Pass C ------------------------------------------------------------
    return _run_pass_c(filtered, g, m, prec, slab_b, nyq_plane, yzx_pad)


def _run_pass_c(filtered, g: _Geom, m: _Mats, prec: str, slab_b: bool,
                nyq_plane, yzx_pad):
    """Pass C (iDFT_y + irfft_x) shared by the filter pipeline and the PCC
    cross-correlation driver: consumes pass B's nspec z-major (slab) or
    ky-major (row-mode, transposed here) spectrum arrays and emits the real
    volume — or the chain's (Y + pad, Z, X) handoff layout."""
    z, y, x = g.z, g.y, g.x
    nspec = g.nz * g.ny * 2
    peel, radix_x, radix_y, radix_z, interpret = (
        g.peel, g.radix_x, g.radix_y, g.radix_z, g.interpret,
    )
    zb, z2, y2, yw, xw = g.zb, g.z2, g.y2, g.yw, g.xw
    iyr, iyi = m.iyr, m.iyi
    ax, bx, x_inv_extra = m.ax, m.bx, m.x_inv_extra
    if radix_y:
        ctwr, ctwi = m.y_inv_tw
    full = _full_spec
    t01 = _t01
    vmem_params = _vmem_params(interpret)

    yzx = yzx_pad is not None and z % 8 == 0
    if yzx:
        # Chain mode: 8 (or 16) real-z slices per program, output written
        # directly in the (Y + pad, Z, X) transposed+edge-padded layout the
        # fused deskew kernel consumes (static [:, j, :] stores — see
        # _inv_yx_kernel). Kills the deskew-prep transpose + pad copies.
        # 16 z-slots per program double the store DMA chunks to 64 KB when
        # the working set fits (the 8-slot mode measured ~+0.3 ms vs the
        # plain-layout pass C — store granularity).
        c_zb = 8
        if z % 16 == 0:
            c16_vmem = (
                (y + yzx_pad) * 16 * x + nspec * 8 * yw * xw
            ) * 4 * 2 + 16 * y * x * 4
            if c16_vmem < _VMEM_BUDGET_BYTES - 16 * 1024 * 1024:
                c_zb = 16
        c_grid = z // c_zb
        blk0 = c_zb // 2 if radix_z else c_zb
        c_spec_in = pl.BlockSpec((blk0, yw, xw), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        c_out_specs = pl.BlockSpec((y + yzx_pad, c_zb, x),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
        c_out_shape = jax.ShapeDtypeStruct((y + yzx_pad, z, x), jnp.float32)
    else:
        c_zb = 2 if radix_z else zb
        c_grid = z2 if radix_z else z // zb
        c_spec_in = (
            pl.BlockSpec((1, yw, xw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            if radix_z
            else pl.BlockSpec((zb, yw, xw), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        )
        c_out_specs = pl.BlockSpec(
            (c_zb, y, x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        c_out_shape = jax.ShapeDtypeStruct((z, y, x), jnp.float32)
    c_in_specs = [c_spec_in] * nspec + [full((yw, yw))] * 2
    c_args = (list(filtered) if slab_b else [t01(f) for f in filtered])
    c_args += [iyr, iyi]
    if radix_y:
        c_in_specs += [full((y2, 1))] * 2
        c_args += [ctwr, ctwi]
    if radix_x:
        c_in_specs += [full(tuple(ax.shape))] * 2
        c_in_specs += [full(tuple(m.shape)) for m in x_inv_extra]
        c_args += [ax, bx, *x_inv_extra]
    else:
        c_in_specs += [full((xw, x)), full((xw, x))]
        c_args += [ax, bx]
    if peel:
        c_in_specs.append(
            pl.BlockSpec((c_zb, y, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        c_args.append(jnp.pad(nyq_plane[:, :, None], ((0, 0), (0, 0), (0, 127))))
    out = pl.pallas_call(
        partial(
            _inv_yx_kernel,
            prec=prec, zb=c_zb, peel=peel, radix_z=radix_z, radix_y=radix_y,
            radix_x=radix_x, yzx_pad=yzx_pad if yzx else None,
        ),
        grid=(c_grid,),
        in_specs=c_in_specs,
        out_specs=c_out_specs,
        out_shape=c_out_shape,
        interpret=interpret,
        **vmem_params,
    )(*c_args)
    if yzx_pad is not None and not yzx:
        # 8-z gate failed: honor the contract via XLA ops instead.
        out = jnp.pad(
            jnp.transpose(out, (1, 0, 2)),
            ((yzx_pad, 0), (0, 0), (0, 0)), mode="edge",
        )
    return out


def deconvolve_zyx_pallas(
    zyx_data: jax.Array,
    transfer_function_half: jax.Array | None = None,
    regularization_strength: float = 1e-3,
    yzx_pad: int | None = None,
    prepared: PreparedFilter | None = None,
) -> jax.Array:
    """Fused Tikhonov inverse filter; bit-parity with the XLA rfftn path to
    ~1e-5 relative (dense f32 DFT vs split-radix FFT rounding).

    ``yzx_pad``: emit (Y + pad, Z, X) with front rows edge-replicated — the
    fused deskew kernel's input layout (chain mode, kernels/chain.py).
    ``prepared``: a :func:`prepare_fourier_filter` result (Tikhonov mode)
    for this volume shape — the per-call filter arrangement is skipped and
    ``transfer_function_half`` may be omitted."""
    tf = None
    if prepared is None:
        tf = (transfer_function_half.astype(jnp.float32),)
    return _run_fourier_pipeline(
        zyx_data, tf, reg=float(regularization_strength), yzx_pad=yzx_pad,
        prepared=prepared,
    )


def fourier_filter_zyx_pallas(
    zyx_data: jax.Array,
    filter_half_real: jax.Array | None = None,
    filter_half_imag: jax.Array | None = None,
    prepared: PreparedFilter | None = None,
) -> jax.Array:
    """Apply a HERMITIAN complex frequency filter to a real volume:
    ``real(ifftn(fftn(v) * F))`` on the rfft half-spectrum.

    The phase-reconstruction inverse filter ``conj(H)/(|H|^2 + reg)`` is
    Hermitian because the WOTF H is the FFT of a real defocus kernel
    (recon/optics.py::phase_wotf_3d), so the half spectrum carries the whole
    operation. The filter halves arrive as split (re, im) f32 arrays sliced
    to ``[..., : X // 2 + 1]`` — or pre-arranged via ``prepared``
    (:func:`prepare_fourier_filter` with ``regularization_strength=None``).
    """
    filt = None
    if prepared is None:
        filt = (
            filter_half_real.astype(jnp.float32),
            filter_half_imag.astype(jnp.float32),
        )
    return _run_fourier_pipeline(zyx_data, filt, prepared=prepared)


# ---------------------------------------------------------------------------
# Phase cross-correlation through the matmul-DFT engine
# ---------------------------------------------------------------------------

_F32_EPS = float(np.finfo(np.float32).eps)


def _cross_power(h1r, h1i, h2r, h2i, normalization):
    """Elementwise H1 * conj(H2), optionally normalized (PCC semantics of
    kernels/fft.py::_pcc_core; reference:
    biahub/estimate_stabilization.py:169-255). For spectra of real volumes
    |H1 H2*| == |H1||H2|, so 'magnitude' and 'classic' differ only in the
    eps clamp placement — both are kept for exact parity with the XLA
    path."""
    cr = h1r * h2r + h1i * h2i
    ci = h1i * h2r - h1r * h2i
    if normalization == "magnitude":
        denom = jnp.maximum(jnp.sqrt(cr * cr + ci * ci), _F32_EPS)
        return cr / denom, ci / denom
    if normalization == "classic":
        denom = jnp.maximum(
            jnp.sqrt((h1r * h1r + h1i * h1i) * (h2r * h2r + h2i * h2i)),
            _F32_EPS,
        )
        return cr / denom, ci / denom
    return cr, ci


def _pass_b_cross_kernel(*refs, normalization, prec, radix_z, ny, rows=1,
                         slab=False):
    """Pass B for PCC: per ky row, z-DFT BOTH volumes' spectra, take the
    (normalized) cross-power, and inverse-z-DFT — the same chain as
    :func:`_pass_b_kernel` with the filter multiply replaced by the
    two-stream cross product. Ref order: spectra1 (nspec) + spectra2
    (nspec) + z matrices (4 dense / 6 radix) + outs (nspec)."""
    nz = 2 if radix_z else 1
    nspec = nz * ny * 2
    ins1 = refs[:nspec]
    ins2 = refs[nspec : 2 * nspec]
    mats = refs[2 * nspec : -nspec]
    outs = refs[-nspec:]

    def store(idx, r, val):
        if slab:
            outs[idx][:, r, :] = val
        else:
            outs[idx][0] = val

    for r in range(rows):
        for kpar in range(ny):
            if radix_z:
                wzr, wzi, izr, izi, twr, twi = (m[:] for m in mats)

                def fwd(ins, _k=kpar, _r=r):
                    er = ins[(0 * ny + _k) * 2][_r]
                    ei = ins[(0 * ny + _k) * 2 + 1][_r]
                    or_ = ins[(1 * ny + _k) * 2][_r]
                    oi = ins[(1 * ny + _k) * 2 + 1][_r]
                    ehr, ehi = _cdot(wzr, wzi, er, ei, prec)
                    ohr, ohi = _cdot(wzr, wzi, or_, oi, prec)
                    tr = twr * ohr - twi * ohi
                    ti = twr * ohi + twi * ohr
                    return ehr + tr, ehi + ti, ehr - tr, ehi - ti

                l1r, l1i, h1r, h1i = fwd(ins1)
                l2r, l2i, h2r, h2i = fwd(ins2)
                lo_r, lo_i = _cross_power(l1r, l1i, l2r, l2i, normalization)
                hi_r, hi_i = _cross_power(h1r, h1i, h2r, h2i, normalization)
                sr, si = lo_r + hi_r, lo_i + hi_i
                dr0, di0 = lo_r - hi_r, lo_i - hi_i
                dr = twr * dr0 + twi * di0  # conj(tw) * (lo - hi)
                di = twr * di0 - twi * dr0
                xer, xei = _cdot(izr, izi, sr, si, prec)
                xor_, xoi = _cdot(izr, izi, dr, di, prec)
                store((0 * ny + kpar) * 2, r, xer)
                store((0 * ny + kpar) * 2 + 1, r, xei)
                store((1 * ny + kpar) * 2, r, xor_)
                store((1 * ny + kpar) * 2 + 1, r, xoi)
            else:
                wzr, wzi, izr, izi = (m[:] for m in mats)
                h1r, h1i = _cdot(
                    wzr, wzi, ins1[kpar * 2][r], ins1[kpar * 2 + 1][r], prec
                )
                h2r, h2i = _cdot(
                    wzr, wzi, ins2[kpar * 2][r], ins2[kpar * 2 + 1][r], prec
                )
                cr, ci = _cross_power(h1r, h1i, h2r, h2i, normalization)
                xr_, xi_ = _cdot(izr, izi, cr, ci, prec)
                store(kpar * 2, r, xr_)
                store(kpar * 2 + 1, r, xi_)


def _run_pass_b_cross(s1, s2, g: _Geom, m: _Mats, prec: str, normalization):
    """Pass-B driver for PCC (slab and row modes mirroring
    :func:`_run_fourier_pipeline`'s dispatch). Returns (filtered, slab_b)."""
    nspec = g.nz * g.ny * 2
    zw, yw, xw = g.zw, g.yw, g.xw
    vmem_params = _vmem_params(g.interpret)
    b_kernel = partial(
        _pass_b_cross_kernel,
        normalization=normalization, prec=prec, radix_z=g.radix_z, ny=g.ny,
    )

    slab_b = yw % 8 == 0
    xt = xw
    if slab_b:
        def b_vmem(cand):
            # Two input spectrum streams + outputs, double-buffered.
            return (nspec * 8 * zw * cand * 3) * 4 * 2

        xt = None
        cand = xw
        while cand >= 1:
            ok_align = g.interpret or (
                cand % 128 == 0 and cand * 8 * 4 >= 16384
            )
            if xw % cand == 0 and ok_align and (
                b_vmem(cand) < _VMEM_BUDGET_BYTES - 6 * 1024 * 1024
            ):
                xt = cand
                break
            cand //= 2
        if xt is None:
            slab_b = False

    b_args = (*s1, *s2, *m.b_mats_v)
    if slab_b:
        def fullb(shape):
            return pl.BlockSpec(
                shape, lambda i, jx: (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )

        spec_in = pl.BlockSpec((8, zw, xt), lambda i, jx: (i, 0, jx),
                               memory_space=pltpu.VMEM)
        filtered = pl.pallas_call(
            partial(b_kernel, rows=8, slab=True),
            grid=(yw // 8, xw // xt),
            in_specs=(
                [spec_in] * (2 * nspec)
                + [fullb(tuple(mm.shape)) for mm in m.b_mats_v]
            ),
            out_specs=(
                pl.BlockSpec((zw, 8, xt), lambda i, jx: (0, i, jx),
                             memory_space=pltpu.VMEM),
            ) * nspec,
            out_shape=tuple(
                jax.ShapeDtypeStruct((zw, yw, xw), jnp.float32)
                for _ in range(nspec)
            ),
            interpret=g.interpret,
            **vmem_params,
        )(*b_args)
    else:
        spec_row = pl.BlockSpec((1, zw, xw), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        filtered = pl.pallas_call(
            b_kernel,
            grid=(yw,),
            in_specs=[spec_row] * (2 * nspec)
            + [_full_spec(tuple(mm.shape)) for mm in m.b_mats_v],
            out_specs=(spec_row,) * nspec,
            out_shape=tuple(
                jax.ShapeDtypeStruct((yw, zw, xw), jnp.float32)
                for _ in range(nspec)
            ),
            # The first volume's forward spectrum is dead after this pass.
            input_output_aliases={i: i for i in range(nspec)},
            interpret=g.interpret,
            **vmem_params,
        )(*b_args)
    return filtered, slab_b


def _nyq_cross_chain(nyq1, nyq2, normalization, x):
    """XLA cross-power chain for the peeled Nyquist-kx plane (the 2D analog
    of :func:`_nyq_filter_chain`): the plane is ~1000x smaller than the main
    spectrum, so XLA f32 FFTs handle it exactly."""
    s1 = jnp.fft.fftn(nyq1.astype(jnp.complex64), axes=(0, 1))
    s2 = jnp.fft.fftn(nyq2.astype(jnp.complex64), axes=(0, 1))
    spec = s1 * jnp.conj(s2)
    if normalization == "magnitude":
        spec = spec / jnp.maximum(jnp.abs(spec), _F32_EPS)
    elif normalization == "classic":
        spec = spec / jnp.maximum(jnp.abs(s1) * jnp.abs(s2), _F32_EPS)
    plane = jnp.real(jnp.fft.ifftn(spec, axes=(0, 1))) / x
    return plane.astype(jnp.float32)


def pcc_pallas_supported(shape: tuple[int, int, int]) -> bool:
    """True when the fused PCC should handle volume pairs of this shape."""
    if not deconvolve_pallas_supported(shape):
        return False
    z, y, x = shape
    xh = x // 2 + 1
    # Pass B carries TWO spectrum streams: 2 inputs + 1 output per parity
    # row, double-buffered, plus the z matrices and chain temporaries.
    pass_b = (3 * 2 * 2 * z * xh + 8 * z * xh + 4 * z * z) * 4
    return pass_b < _VMEM_BUDGET_BYTES


def pcc_corr_pallas(ref: jax.Array, mov: jax.Array,
                    normalization: str | None = None) -> jax.Array:
    """Phase-cross-correlation surface via the fused matmul-DFT engine:
    ``real(ifftn(fftn(ref) * conj(fftn(mov)) / norm))`` for two equal-shape
    real volumes (kernels/fft.py::_pcc_core semantics; reference:
    biahub/estimate_stabilization.py:128-255).

    Both forward transforms ride pass A, the cross-power + normalization
    fuses into the z-DFT chain of a two-stream pass B, and pass C emits the
    correlation volume — ~6 HBM round trips total instead of one per FFT
    axis per volume (the XLA rfftn path runs far below HBM speed on TPU)."""
    if ref.shape != mov.shape:
        raise ValueError(f"shape mismatch: {ref.shape} vs {mov.shape}")
    z, y, x = (int(s) for s in ref.shape)
    g = _geometry(z, y, x)
    m = _build_mats(g)
    prec = _precision()
    s1, nyq1 = _run_pass_a(ref.astype(jnp.float32), g, m, prec)
    s2, nyq2 = _run_pass_a(mov.astype(jnp.float32), g, m, prec)
    nyq_plane = None
    if g.peel:
        nyq_plane = _nyq_cross_chain(
            nyq1[..., 0], nyq2[..., 0], normalization, x
        )
    filtered, slab_b = _run_pass_b_cross(s1, s2, g, m, prec, normalization)
    return _run_pass_c(filtered, g, m, prec, slab_b, nyq_plane, None)

"""Fused spectral deconvolve+deskew: the shear resample folded into the iFFT.

The production light-sheet chain runs Tikhonov deconvolution (reference:
biahub/deconvolve.py:34-70) followed by deskew's scan-axis 2-tap lerp
(reference: biahub/deskew.py:374-456, 459-545). The standard composition
inverse-transforms the full spectrum back to the raw grid (pallas_fft.py
passes B/C), writes the volume, and re-reads it to resample — but the lerp
is a LINEAR functional of the z samples, so it evaluates directly from the
z-spectrum as one complex matrix per output tilt row (math validated in
kernels/fourier_resample.py + tests/test_fourier_resample.py):

    lerp(ifft_z(V), p) == M(p) @ V,   M[n, kz] ∝ (1-f)e^{iθz0} + f e^{iθ(z0+1)}

with per-tap validity masking reproducing the real-space kernel's
zero-padded boundaries EXACTLY (masked_lerp_dft_matrix). This module
restructures the inverse passes so the deskewed volume is emitted straight
out of the frequency domain — the deconvolved volume never touches HBM:

- **Pass A** (shared with pallas_fft): rfft_X + DFT_Y per z slice.
- **Pass B'1** (grid over ky rows): DFT_Z → filter — the forward half of
  pallas_fft's pass B — storing the filtered spectrum KZ-MAJOR via static
  middle-slot stores (the free transpose direction).
- **Pass B'2** (grid over kz slices): iDFT_Y per kz slice, storing Y-MAJOR
  with the tilt axis front-edge-padded for the averaging groups (the same
  yzx_pad trick as pass C chain mode).
- **Pass C'** (grid over averaged output z groups): per tilt row, the
  precomputed (X_out, Z) lerp-DFT matrix contracts the scan-axis spectrum
  (kz → x'), then a TRANSPOSED irfft_X emits the (Y_out, X_out) output
  slice in the standard deskew frame; ``average_window`` rows accumulate in
  VMEM so the slice-averaged output is all that is ever written.

vs the composition this kills the deskew pass (read+write of the full
deskewed volume), the yzx handoff, and the deconvolved volume's HBM round
trip, at the cost of reading the per-acquisition lerp table (~250 MB f32 at
the flagship FOV — precomputed once, like prepare_fourier_filter).

Output is bit-compatible with ``deskew_zyx(deconvolve_zyx(v), ...,
skip_flip=True)`` to the engine's precision envelope (~1e-5 relative in the
default ``high`` mode), including slice averaging, edge-padded tail groups,
and zero-padded overhang boundaries (keep_overhang True and False).
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

from biahub_tpu.kernels.pallas_fft import (
    _VMEM_BUDGET_BYTES,
    _build_filt_main,
    _build_mats,
    _cdot,
    _cdot_r,
    _dot,
    _full_spec,
    _geometry,
    _irfft_mats,
    _precision,
    _radix_x_inv_mats,
    _run_pass_a,
    _vmem_params,
    deconvolve_pallas_supported,
)

__all__ = [
    "PreparedSpectralDeskew",
    "prepare_spectral_deskew",
    "spectral_deskew_supported",
    "deconvolve_deskew_zyx_spectral",
]


# ---------------------------------------------------------------------------
# Per-acquisition lerp-DFT table
# ---------------------------------------------------------------------------


class PreparedSpectralDeskew(NamedTuple):
    """Device-ready lerp-DFT table for one acquisition geometry.

    ``mr/mi`` are (G*avg, X_out, Z_in) f32: row z' holds the REAL/IMAG parts
    of the masked lerp-DFT matrix for output tilt slice min(z', Z_out-1)
    (the clamp reproduces average_n_slices' edge-padded tail group), with
    the 1/(Z_in * average_window) normalization folded in. Constant per
    acquisition — hoist it out of the hot loop like
    pallas_fft.prepare_fourier_filter.
    """

    mr: jax.Array
    mi: jax.Array


def _deskew_geom(
    raw_shape: tuple[int, int, int],
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int,
):
    """(Z_out, X_out, G, YpT, ct, px, offset) of the deskew resample —
    IDENTICAL math to kernels/deskew.py:233-244 / pallas_deskew.py."""
    from biahub_tpu.kernels.deskew import get_deskewed_data_shape

    Z_in, Y_in, X_in = raw_shape
    output_shape, _ = get_deskewed_data_shape(
        (Z_in, Y_in, X_in), ls_angle_deg, px_to_scan_ratio, keep_overhang
    )
    Z_out, X_out = Y_in, output_shape[2]
    ct = float(np.cos(ls_angle_deg * np.pi / 180))
    px = float(px_to_scan_ratio)
    offset = px * ct * (Z_out - 1) / 2 - px * (X_out - 1) / 2 + (Z_in - 1) / 2
    avg = int(average_window)
    groups = -(-Z_out // avg)
    return Z_out, X_out, groups, groups * avg, ct, px, offset


_XZY_GPP = 8  # output-group block (middle-axis store width) of the xzy kernel


def _groups_pad(groups: int) -> int:
    """xzy-mode group count padded to the middle-axis block width."""
    return -(-groups // _XZY_GPP) * _XZY_GPP


@lru_cache(maxsize=8)
def _spectral_table_np(
    raw_shape: tuple[int, int, int],
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int,
    pad_groups: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    from biahub_tpu.kernels.fourier_resample import masked_lerp_dft_matrix

    Z_in = raw_shape[0]
    Z_out, X_out, groups, ypt, ct, px, offset = _deskew_geom(
        raw_shape, ls_angle_deg, px_to_scan_ratio, keep_overhang,
        average_window,
    )
    # xzy mode pads the group axis to the store-block width; the pad rows'
    # matrices are ZERO so the junk output z' slices are defined zeros.
    ypt_full = (_groups_pad(groups) if pad_groups else groups) * average_window
    zp = np.minimum(np.arange(ypt, dtype=np.float64), Z_out - 1)
    x_idx = np.arange(X_out, dtype=np.float64)
    in_z = px * x_idx[None, :] - px * ct * zp[:, None] + offset  # (YpT, X_out)
    mr = np.zeros((ypt_full, X_out, Z_in), np.float32)
    mi = np.zeros((ypt_full, X_out, Z_in), np.float32)
    scale = 1.0 / average_window
    # Chunked rows bound the f64/int64 temporaries (~8x the f32 output).
    for r0 in range(0, ypt, 16):
        r1 = min(r0 + 16, ypt)
        m = masked_lerp_dft_matrix(Z_in, in_z[r0:r1].ravel()).reshape(
            r1 - r0, X_out, Z_in
        )
        mr[r0:r1] = (m.real * scale).astype(np.float32)
        mi[r0:r1] = (m.imag * scale).astype(np.float32)
    return mr, mi


def prepare_spectral_deskew(
    raw_shape: tuple[int, int, int],
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int = 1,
    out_layout: str = "zyx",
) -> PreparedSpectralDeskew:
    """Build (host) the per-acquisition lerp-DFT table; cached by params.

    ``out_layout`` must match the ``deconvolve_deskew_zyx_spectral`` call the
    table feeds: ``"xzy"`` pads the group axis to the store-block width with
    zero rows (the chain/warp handoff mode)."""
    assert out_layout in ("zyx", "xzy"), out_layout
    mr, mi = _spectral_table_np(
        tuple(int(s) for s in raw_shape),
        float(ls_angle_deg),
        float(px_to_scan_ratio),
        bool(keep_overhang),
        int(average_window),
        out_layout == "xzy",
    )
    return PreparedSpectralDeskew(jnp.asarray(mr), jnp.asarray(mi))


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_z_filter_kernel(*refs, reg, prec, radix_z, ny, n_filt, rows):
    """Pass B'1: per ky row, forward DFT_Z then the frequency filter — the
    forward half of pallas_fft._pass_b_kernel — storing the FULL filtered kz
    spectrum KZ-MAJOR via static middle-slot stores (blocks (Z, rows, Xw)).

    Ref order: spectra in (nz*ny*2) + filters (n_filt*ny) + z matrices
    (2 dense / 4 radix: wzr, wzi[, twr, twi]) + spectra out (ny*2).
    """
    nz = 2 if radix_z else 1
    nspec_in = nz * ny * 2
    ins = refs[:nspec_in]
    filts = refs[nspec_in : nspec_in + n_filt * ny]
    mats = refs[nspec_in + n_filt * ny : -(ny * 2)]
    outs = refs[-(ny * 2) :]
    for r in range(rows):
        for kpar in range(ny):
            if radix_z:
                wzr, wzi, twr, twi = (mm[:] for mm in mats)
                ehr, ehi = _cdot(
                    wzr, wzi,
                    ins[(0 * ny + kpar) * 2][r], ins[(0 * ny + kpar) * 2 + 1][r],
                    prec,
                )
                ohr, ohi = _cdot(
                    wzr, wzi,
                    ins[(1 * ny + kpar) * 2][r], ins[(1 * ny + kpar) * 2 + 1][r],
                    prec,
                )
                tr = twr * ohr - twi * ohi
                ti = twr * ohi + twi * ohr
                hr = jnp.concatenate([ehr + tr, ehr - tr], axis=0)
                hi = jnp.concatenate([ehi + ti, ehi - ti], axis=0)
            else:
                wzr, wzi = (mm[:] for mm in mats)
                hr, hi = _cdot(
                    wzr, wzi, ins[kpar * 2][r], ins[kpar * 2 + 1][r], prec
                )
            if reg == "pre":
                f = filts[kpar][r]
                hr, hi = hr * f, hi * f
            elif reg is not None:
                tf = filts[kpar][r]
                f = tf / (tf * tf + reg)
                hr, hi = hr * f, hi * f
            else:
                fr, fi = filts[2 * kpar][r], filts[2 * kpar + 1][r]
                hr, hi = hr * fr - hi * fi, hr * fi + hi * fr
            outs[kpar * 2][:, r, :] = hr
            outs[kpar * 2 + 1][:, r, :] = hi


def _inv_y_pad_kernel(*refs, prec, radix_y, zb, pad):
    """Pass B'2: per kz slice, inverse DFT along Y (radix-2 DIT butterfly
    when split — same structure as pallas_fft._inv_yx_kernel's y stage),
    storing Y-MAJOR into (Yp, zb, Xw) blocks with the front ``pad`` rows
    edge-replicated (the averaging groups' tail padding, as in pass C's
    yzx_pad chain mode)."""
    ny = 2 if radix_y else 1
    ins = refs[: ny * 2]
    rest = refs[ny * 2 :]
    iyr_ref, iyi_ref = rest[0], rest[1]
    rest = rest[2:]
    if radix_y:
        ctwr_ref, ctwi_ref = rest[0], rest[1]
        rest = rest[2:]
    out_r, out_i = rest[0], rest[1]
    iyr = iyr_ref[:]
    iyi = iyi_ref[:]
    for j in range(zb):
        if radix_y:
            a_r, a_i = _cdot(iyr, iyi, ins[0][j], ins[1][j], prec)
            b_r, b_i = _cdot(iyr, iyi, ins[2][j], ins[3][j], prec)
            ctwr, ctwi = ctwr_ref[:], ctwi_ref[:]
            p_r = ctwr * b_r - ctwi * b_i
            p_i = ctwr * b_i + ctwi * b_r
            rr = jnp.concatenate([a_r + p_r, a_r - p_r], axis=0)
            ri = jnp.concatenate([a_i + p_i, a_i - p_i], axis=0)
        else:
            rr, ri = _cdot(iyr, iyi, ins[0][j], ins[1][j], prec)
        for dst, val in ((out_r, rr), (out_i, ri)):
            dst[pad:, j, :] = val
            if pad:
                dst[:pad, j, :] = jnp.broadcast_to(
                    val[0:1], (pad,) + val.shape[1:]
                )


def _dot_zg(a, b, prec):
    """dot_general contracting a.dim0 with b.dim1 -> (a.dim1, b.dim0), with
    the same precision modes as pallas_fft._dot (manual bf16 split for
    'high'). Lets the MXU consume both operands in their stored layouts —
    no VMEM transposes (the S tile contracts its sublane kz axis, the M
    tile its lane kz axis)."""
    dims = (((0,), (1,)), ((), ()))
    if prec == "high":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32
            )

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    precision = (
        jax.lax.Precision.HIGHEST if prec == "highest"
        else jax.lax.Precision.DEFAULT
    )
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32, precision=precision
    )


def _cdot_zg(ar, ai, br, bi, prec):
    """Complex product through _dot_zg (Karatsuba 3-dot except 'highest');
    result U[kx, x'] = sum_kz S[kz, kx] * M[x', kz]."""
    if prec == "highest":
        return (
            _dot_zg(ar, br, prec) - _dot_zg(ai, bi, prec),
            _dot_zg(ar, bi, prec) + _dot_zg(ai, br, prec),
        )
    m1 = _dot_zg(ar, br, prec)
    m2 = _dot_zg(ai, bi, prec)
    m3 = _dot_zg(ar + ai, br + bi, prec)
    return m1 - m2, m3 - m1 - m2


def _lerp_irfft_kernel(*refs, prec, avg, peel, radix_x):
    """Pass C': one averaged output z group per program.

    For each of the group's ``avg`` tilt rows, the (X_out, Z) masked
    lerp-DFT matrix contracts the row's scan-axis spectrum (Z, Xw) into
    U = (Xw, X_out) — kz → x' and the 1/(Z*avg) normalization in one
    matmul — accumulating the slice average in registers. The irfft along
    the coverslip axis then runs TRANSPOSED (matrices arrive pre-transposed,
    twiddle rows as columns, quarter splits on the SUBLANE axis), emitting
    the (Y_out, X_out) output slice directly in the standard deskew frame —
    the one free transpose direction is producing the consumer's layout.

    Input slab row j holds tilt row (G-1-g)*avg + j of the front-padded
    Y-major spectrum, which is output slice z' = g*avg + (avg-1-j): the M
    block is indexed ascending in z', so row (avg-1-j) pairs with slab row
    j. Padded slab rows replicate tilt row 0 and their M rows clamp to
    Z_out-1 — exactly average_n_slices' edge-padded tail group.
    """
    sr_ref, si_ref, mr_ref, mi_ref = refs[:4]
    rest = refs[4:]
    if radix_x == 0:
        axt_ref, bxt_ref = rest[0], rest[1]
        rest = rest[2:]
    elif radix_x == 1:
        prct_ref, pict_ref, wcol_ref, itwc_ref, itws_ref = rest[:5]
        rest = rest[5:]
    else:
        (prct_ref, pict_ref, wcol_ref, t2c_ref, t2s_ref, t1c_ref, t1s_ref,
         t3c_ref, t3s_ref) = rest[:9]
        rest = rest[9:]
    if peel:
        nyqr_ref, nyqi_ref = rest[0], rest[1]
        rest = rest[2:]
    out_ref = rest[0]

    ur = ui = None
    for j in range(avg):
        t_r, t_i = _cdot_zg(
            sr_ref[j], si_ref[j], mr_ref[avg - 1 - j], mi_ref[avg - 1 - j],
            prec,
        )
        ur = t_r if ur is None else ur + t_r
        ui = t_i if ui is None else ui + t_i

    if radix_x == 2:
        prct, pict = prct_ref[:], pict_ref[:]  # (Q, O)
        o = prct.shape[1]
        w = wcol_ref[:]  # (O, 1)
        a0 = (_dot(prct, w * ur[:o], prec) - _dot(pict, w * ui[:o], prec))
        c2r, c2i = _cdot(prct, pict, ur[o : 2 * o], ui[o : 2 * o], prec)
        c1r, c1i = _cdot(prct, pict, ur[2 * o : 3 * o], ui[2 * o : 3 * o],
                         prec)
        c3r, c3i = _cdot(prct, pict, ur[3 * o :], ui[3 * o :], prec)
        t2c, t2s = t2c_ref[:], t2s_ref[:]  # (Q, 1) columns
        t1c, t1s = t1c_ref[:], t1s_ref[:]
        t3c, t3s = t3c_ref[:], t3s_ref[:]
        t2 = c2r * t2c - c2i * t2s
        u1r = c1r * t1c - c1i * t1s
        u1i = c1r * t1s + c1i * t1c
        u3r = c3r * t3c - c3i * t3s
        u3i = c3r * t3s + c3i * t3c
        out = jnp.concatenate(
            [
                a0 + t2 + u1r + u3r,
                a0 - t2 - u1i + u3i,
                a0 + t2 - u1r - u3r,
                a0 - t2 + u1i - u3i,
            ],
            axis=0,
        )
    elif radix_x == 1:
        prct, pict = prct_ref[:], pict_ref[:]  # (M, Q)
        q = prct.shape[1]
        w = wcol_ref[:]  # (Q, 1)
        a = _dot(prct, w * ur[:q], prec) - _dot(pict, w * ui[:q], prec)
        cr_, ci_ = _cdot(prct, pict, ur[q:], ui[q:], prec)
        t = cr_ * itwc_ref[:] - ci_ * itws_ref[:]
        out = jnp.concatenate([a + t, a - t], axis=0)
    else:
        out = _dot(axt_ref[:], ur, prec) + _dot(bxt_ref[:], ui, prec)

    if peel:
        # Nyquist-kx contribution: real(M_j @ plane_row_j) accumulated over
        # the group, broadcast with the (-1)^y basis on the SUBLANE axis
        # (the coverslip axis is the output's row axis here).
        nrows_r = nyqr_ref[0]  # (avgP, Z)
        nrows_i = nyqi_ref[0]
        dims = (((1,), (1,)), ((), ()))
        acc = None
        for j in range(avg):
            nr = nrows_r[j : j + 1, :]
            ni = nrows_i[j : j + 1, :]
            m_r = mr_ref[avg - 1 - j]
            m_i = mi_ref[avg - 1 - j]
            val = jax.lax.dot_general(
                nr, m_r, dims, preferred_element_type=jnp.float32
            ) - jax.lax.dot_general(
                ni, m_i, dims, preferred_element_type=jnp.float32
            )  # (1, X_out)
            acc = val if acc is None else acc + val
        sign = 1.0 - 2.0 * (
            jax.lax.broadcasted_iota(jnp.int32, (out.shape[0], 1), 0) % 2
        ).astype(jnp.float32)
        out = out + sign * acc
    out_ref[0] = out


def _lerp_irfft_xzy_kernel(*refs, prec, avg, peel, radix_x, gpp):
    """Pass C' in the chain/warp handoff mode: (X', Z', Y') output.

    Same math as :func:`_lerp_irfft_kernel`, restructured around the
    probe-measured fast formulation (scripts/probe_cprime.py: 23% faster
    than the transposed form): the lerp contraction runs as the NATURAL
    ``M @ S`` dot (both operands feed the MXU in their stored layouts) and
    the irfft along the coverslip axis runs on the LANE axis — the same
    orientation as pallas_fft's proven pass C — emitting (x'-tile, Y')
    slices. The grid is (group_blocks, x'_tiles) with the x'-tile axis
    inner (the S block index is constant along it, so Mosaic fetches each
    group block once); each program stores its ``gpp`` group slices into
    STATIC middle-axis slots of the (X', Z'_pad, Y') output — the free
    transpose direction — which is exactly the (Xi, Zi, Yi) layout the
    in-plane warp kernels consume (kernels/affine.py ``input_xzy``).

    Z'_pad is the group count padded to ``gpp``; the pad groups' table rows
    are zero (prepare_spectral_deskew(out_layout='xzy')) so the junk z'
    slices are defined zeros — downstream warps mask them via the logical
    input shape.
    """
    sr_ref, si_ref, mr_ref, mi_ref = refs[:4]
    rest = refs[4:]
    if radix_x == 0:
        ax_ref, bx_ref = rest[0], rest[1]
        rest = rest[2:]
    elif radix_x == 1:
        prc_ref, pic_ref, wrow_ref, itwc_ref, itws_ref = rest[:5]
        rest = rest[5:]
    else:
        (prc_ref, pic_ref, wrow_ref, t2c_ref, t2s_ref, t1c_ref, t1s_ref,
         t3c_ref, t3s_ref) = rest[:9]
        rest = rest[9:]
    if peel:
        nyqr_ref, nyqi_ref = rest[0], rest[1]
        rest = rest[2:]
    out_ref = rest[0]

    for gg in range(gpp):
        # S blocks arrive in REVERSED group order (the front-padded tilt
        # axis), M/out ascending in z': within a block the halves pair
        # crosswise — see _lerp_irfft_kernel's row-mapping derivation.
        s_base = (gpp - 1 - gg) * avg
        ur = ui = None
        for j in range(avg):
            t_r, t_i = _cdot(
                mr_ref[gg * avg + avg - 1 - j],
                mi_ref[gg * avg + avg - 1 - j],
                sr_ref[s_base + j], si_ref[s_base + j], prec,
            )  # (xt, Xw)
            ur = t_r if ur is None else ur + t_r
            ui = t_i if ui is None else ui + t_i

        if radix_x == 2:
            prc, pic = prc_ref[:], pic_ref[:]  # (O, Q)
            o = prc.shape[0]
            w = wrow_ref[:]  # (1, O)
            a0 = (_dot(ur[:, :o] * w, prc, prec)
                  - _dot(ui[:, :o] * w, pic, prec))
            c2r, c2i = _cdot_r(ur[:, o : 2 * o], ui[:, o : 2 * o], prc, pic,
                               prec)
            c1r, c1i = _cdot_r(ur[:, 2 * o : 3 * o], ui[:, 2 * o : 3 * o],
                               prc, pic, prec)
            c3r, c3i = _cdot_r(ur[:, 3 * o :], ui[:, 3 * o :], prc, pic, prec)
            t2c, t2s = t2c_ref[:], t2s_ref[:]  # (1, Q) rows
            t1c, t1s = t1c_ref[:], t1s_ref[:]
            t3c, t3s = t3c_ref[:], t3s_ref[:]
            t2 = c2r * t2c - c2i * t2s
            u1r = c1r * t1c - c1i * t1s
            u1i = c1r * t1s + c1i * t1c
            u3r = c3r * t3c - c3i * t3s
            u3i = c3r * t3s + c3i * t3c
            out = jnp.concatenate(
                [
                    a0 + t2 + u1r + u3r,
                    a0 - t2 - u1i + u3i,
                    a0 + t2 - u1r - u3r,
                    a0 - t2 + u1i - u3i,
                ],
                axis=1,
            )
        elif radix_x == 1:
            prc, pic = prc_ref[:], pic_ref[:]  # (Q, M)
            q = prc.shape[0]
            w = wrow_ref[:]  # (1, Q)
            a = (_dot(ur[:, :q] * w, prc, prec)
                 - _dot(ui[:, :q] * w, pic, prec))
            cr_, ci_ = _cdot_r(ur[:, q:], ui[:, q:], prc, pic, prec)
            t = cr_ * itwc_ref[:] - ci_ * itws_ref[:]
            out = jnp.concatenate([a + t, a - t], axis=1)
        else:
            out = _dot(ur, ax_ref[:], prec) + _dot(ui, bx_ref[:], prec)

        if peel:
            # real(M_j @ nyq_row_j) accumulated over the group, broadcast
            # with the (-1)^y basis on the LANE axis (Y' is the lane axis
            # in this orientation).
            nrows_r = nyqr_ref[gg]  # (avgP, Z)
            nrows_i = nyqi_ref[gg]
            dims = (((1,), (1,)), ((), ()))
            acc = None
            for j in range(avg):
                nr = nrows_r[j : j + 1, :]
                ni = nrows_i[j : j + 1, :]
                m_r = mr_ref[gg * avg + avg - 1 - j]
                m_i = mi_ref[gg * avg + avg - 1 - j]
                val = jax.lax.dot_general(
                    m_r, nr, dims, preferred_element_type=jnp.float32
                ) - jax.lax.dot_general(
                    m_i, ni, dims, preferred_element_type=jnp.float32
                )  # (xt, 1)
                acc = val if acc is None else acc + val
            sign = 1.0 - 2.0 * (
                jax.lax.broadcasted_iota(jnp.int32, (1, out.shape[1]), 1) % 2
            ).astype(jnp.float32)
            out = out + acc * sign
        out_ref[:, gg, :] = out


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def spectral_deskew_supported(
    shape: tuple[int, int, int],
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int = 1,
    n_filt: int = 1,
    out_layout: str = "zyx",
) -> bool:
    """True when the fused spectral deconvolve+deskew engine handles this
    geometry AND the engine is opted in (``BIAHUB_TPU_SPECTRAL_DESKEW=1``).

    OPT-IN, not the default: on TPU v5e the engine measured ~0.5 ms/volume
    SLOWER than the pass-C handoff composition at the flagship FOV (device
    trace 2026-08: A 1.43 + B'1 0.98 + B'2 0.79 + C' 2.27 = 5.52 ms/vol vs
    the composition's 5.0). Structural accounting: splitting pass B into
    B'1/B'2 adds a full-spectrum HBM round trip (+0.58 ms) and C' reads the
    255 MB lerp table every volume, while C' only saves 0.11 ms vs
    pass C + the one-hot deskew — the composition's z-chain (DFT_z, filter,
    iDFT_z) cancels locally per ky and needs no kz transpose, which the
    spectral fold fundamentally cannot avoid (the lerp consumes kz per
    tilt row). Kept for hardware generations with a different
    compute/bandwidth balance."""
    if os.environ.get("BIAHUB_TPU_SPECTRAL_DESKEW") != "1":
        return False
    if not deconvolve_pallas_supported(shape):
        return False
    z, y, x = (int(s) for s in shape)
    g = _geometry(z, y, x)
    if z % 8 or g.yw % 8:
        return False
    # Compiled slab stores need >= 16 KB contiguous chunks (measured floor,
    # pallas_fft slab_b): full-lane blocks give 8 * xw * 4 bytes per row.
    if not g.interpret and (g.xw % 128 or g.xw * 8 * 4 < 16384):
        return False
    try:
        _, x_out, _, ypt, _, _, _ = _deskew_geom(
            (z, y, x), ls_angle_deg, px_to_scan_ratio, keep_overhang,
            average_window,
        )
    except ValueError:  # overhang-only dataset
        return False
    avg = int(average_window)
    f32, dbuf = 4, 2
    nspec = g.nz * g.ny * 2
    b1 = (
        nspec * 8 * g.zw * g.xw          # spectra in
        + n_filt * g.ny * 8 * z * g.xw   # filter rows
        + g.ny * 2 * z * 8 * g.xw        # filtered out
    ) * f32 * dbuf
    b2 = (
        g.ny * 2 * 8 * g.yw * g.xw + 2 * ypt * 8 * g.xw
    ) * f32 * dbuf
    if out_layout == "xzy":
        xt = 128 if x_out > 128 else x_out
        c = (
            2 * _XZY_GPP * avg * z * g.xw   # group-block spectrum rows
            + 2 * _XZY_GPP * avg * xt * z   # lerp table tile
            + xt * _XZY_GPP * x             # output block
            + 2 * xt * g.xw                 # U accumulator
        ) * f32 * dbuf
    else:
        c = (
            2 * avg * z * g.xw      # spectrum rows
            + 2 * avg * x_out * z   # lerp table rows
            + x * x_out             # output slice
            + 2 * g.xw * x_out      # U accumulator
        ) * f32 * dbuf
    return max(b1, b2, c) < _VMEM_BUDGET_BYTES - 6 * 1024 * 1024


def _nyq_partial_chain(nyq_raw_zy, planes, reg, x, groups, avg, pad):
    """Peeled Nyquist-kx plane: forward 2D FFT + filter + inverse over Y
    ONLY (the scan axis must stay spectral for the fused lerp), rearranged
    into per-output-group (avg-row) blocks in pass-C' slab order."""
    spec = jnp.fft.fftn(nyq_raw_zy.astype(jnp.complex64), axes=(0, 1))
    if reg == "pre":
        spec = spec * planes[0]
    elif reg is not None:
        tf = planes[0]
        spec = spec * (tf / (tf * tf + reg))
    else:
        fr, fi = planes
        spec = spec * jax.lax.complex(fr, fi)
    plane = jnp.fft.ifft(spec, axis=1) / x  # (kz, y); 1/X irfft weight folded
    avg_p = -(-avg // 8) * 8

    def arrange(p):
        p = jnp.pad(p.astype(jnp.float32).T, ((pad, 0), (0, 0)), mode="edge")
        p = p.reshape(groups, avg, -1)[::-1]
        return jnp.pad(p, ((0, 0), (0, avg_p - avg), (0, 0)))

    return arrange(jnp.real(plane)), arrange(jnp.imag(plane))


def deconvolve_deskew_zyx_spectral(
    zyx_data: jax.Array,
    transfer_function_half: jax.Array | None = None,
    regularization_strength: float | None = 1e-3,
    *,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int = 1,
    prepared=None,
    deskew_table: PreparedSpectralDeskew | None = None,
    filter_halves: tuple | None = None,
    out_layout: str = "zyx",
) -> jax.Array:
    """Fused Tikhonov deconvolution + deskew, never materializing the
    deconvolved volume (see module docstring). Output matches
    ``deskew_zyx(deconvolve_zyx(v, tf, reg), ..., skip_flip=True)``:
    (ceil(Y/avg), X_in, X_out) in the UNFLIPPED coverslip frame.

    ``prepared``: a pallas_fft.PreparedFilter for this shape (Tikhonov mode
    when ``regularization_strength`` is set). ``filter_halves``: split
    (re, im) Hermitian filter arrays instead of a transfer function (the
    phase-reconstruction chain; ``regularization_strength=None``).
    ``deskew_table``: a :func:`prepare_spectral_deskew` result — built on
    the fly (host, cached) when omitted, but hoist it in hot loops; its
    ``out_layout`` must match.

    ``out_layout='xzy'`` (the chain/warp handoff): the output is
    (X_out, Z'_pad, X_in) — the (Xi, Zi, Yi) layout the in-plane warp
    consumes natively — where Z'_pad pads ceil(Y/avg) up to the store-block
    width with zero slices (callers pass the LOGICAL group count to the
    warp's domain mask). Probe-measured 23% faster than the transposed zyx
    kernel (scripts/probe_cprime.py) on top of skipping the warp-side
    transpose.
    """
    z, y, x = (int(s) for s in zyx_data.shape)
    g = _geometry(z, y, x)
    prec = _precision()
    reg = (
        float(regularization_strength)
        if regularization_strength is not None
        else None
    )
    n_filt = 1 if reg is not None else 2
    if prepared is not None:
        if len(prepared.main) != n_filt * g.ny or tuple(
            prepared.main[0].shape
        ) != (g.yw, z, g.xw):
            raise ValueError(
                "PreparedFilter does not match this volume shape / env "
                "config; rebuild with prepare_fourier_filter."
            )
        filt_main = list(prepared.main)
        reg_mode = "pre" if reg is not None else None
    else:
        filter_arrays = (
            (transfer_function_half.astype(jnp.float32),)
            if reg is not None
            else tuple(f.astype(jnp.float32) for f in filter_halves)
        )
        filt_main = _build_filt_main(
            filter_arrays, g.xw, g.radix_x, g.radix_y, n_filt
        )
        reg_mode = reg

    assert out_layout in ("zyx", "xzy"), out_layout
    avg = int(average_window)
    z_out, x_out, groups, ypt, _, _, _ = _deskew_geom(
        (z, y, x), ls_angle_deg, px_to_scan_ratio, keep_overhang, avg
    )
    if out_layout == "xzy":
        groups_eff = _groups_pad(groups)
        ypt = groups_eff * avg
    else:
        groups_eff = groups
    pad = ypt - z_out
    if deskew_table is None:
        deskew_table = prepare_spectral_deskew(
            (z, y, x), ls_angle_deg, px_to_scan_ratio, keep_overhang, avg,
            out_layout=out_layout,
        )
    mr, mi = deskew_table
    if tuple(mr.shape) != (ypt, x_out, z):
        raise ValueError(
            f"PreparedSpectralDeskew shape {tuple(mr.shape)} does not match "
            f"this geometry / out_layout (expected {(ypt, x_out, z)})."
        )

    m = _build_mats(g)
    vmem_params = _vmem_params(g.interpret)
    v = zyx_data.astype(jnp.float32)

    _debug = os.environ.get(
        "BIAHUB_TPU_SPECTRAL_DEBUG"
    ) == "1" and not isinstance(zyx_data, jax.core.Tracer)

    def _dbg(tag, arr):
        # BIAHUB_TPU_SPECTRAL_DEBUG=1: per-pass compile/run isolation on the
        # real chip (eager callers only; never fires under jit tracing).
        if _debug:
            import time as _t

            t0 = _t.time()
            probe = float(jnp.sum(arr[(0,) * (arr.ndim - 1)][:1]))
            print(f"# spectral {tag}: {_t.time() - t0:.1f}s probe {probe:.3e}",
                  flush=True)

    # -- Pass A --------------------------------------------------------------
    spectra, nyq_raw = _run_pass_a(v, g, m, prec)
    _dbg("pass A", spectra[0])

    # -- Pass B'1: DFT_Z + filter, kz-major out -------------------------------
    nspec = g.nz * g.ny * 2
    fwd_mats = m.b_mats_v[:2] + (m.b_mats_v[4:6] if g.radix_z else ())
    b1 = pl.pallas_call(
        partial(
            _fwd_z_filter_kernel,
            reg=reg_mode, prec=prec, radix_z=g.radix_z, ny=g.ny,
            n_filt=n_filt, rows=8,
        ),
        grid=(g.yw // 8,),
        in_specs=(
            [pl.BlockSpec((8, g.zw, g.xw), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)] * nspec
            + [pl.BlockSpec((8, z, g.xw), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)] * len(filt_main)
            + [_full_spec(tuple(mm.shape)) for mm in fwd_mats]
        ),
        out_specs=tuple(
            pl.BlockSpec((z, 8, g.xw), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(g.ny * 2)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((z, g.yw, g.xw), jnp.float32)
            for _ in range(g.ny * 2)
        ),
        interpret=g.interpret,
        **vmem_params,
    )(*spectra, *filt_main, *fwd_mats)
    _dbg("pass B'1", b1[0])

    # -- Pass B'2: iDFT_Y, y-major front-padded out ---------------------------
    b2_extra = (m.iyr, m.iyi) + m.y_inv_tw
    b2_specs = [_full_spec((g.yw, g.yw))] * 2
    if g.radix_y:
        b2_specs += [_full_spec((g.y2, 1))] * 2
    b2 = pl.pallas_call(
        partial(_inv_y_pad_kernel, prec=prec, radix_y=g.radix_y, zb=8,
                pad=pad),
        grid=(z // 8,),
        in_specs=(
            [pl.BlockSpec((8, g.yw, g.xw), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)] * (g.ny * 2)
            + b2_specs
        ),
        out_specs=tuple(
            pl.BlockSpec((ypt, 8, g.xw), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((ypt, z, g.xw), jnp.float32)
            for _ in range(2)
        ),
        interpret=g.interpret,
        **vmem_params,
    )(*b1, *b2_extra)
    _dbg("pass B'2", b2[0])

    # -- Pass C': fused lerp-resample + irfft_X -------------------------------
    nyq_planes = None
    if g.peel:
        nyq_planes = (
            prepared.nyq
            if prepared is not None
            else tuple(f[..., -1] for f in filter_arrays)
        )

    if out_layout == "xzy":
        # Chain/warp handoff: natural-orientation dots + lane irfft, stored
        # as (X', Z'_pad, Y') via static middle slots (_lerp_irfft_xzy_kernel).
        if g.radix_x:
            c_mats = tuple(
                jnp.asarray(mm) for mm in _radix_x_inv_mats(x, g.radix_x)
            )
        else:
            c_mats = tuple(jnp.asarray(mm[: g.xw]) for mm in _irfft_mats(x))
        gpp = _XZY_GPP
        n_gb = groups_eff // gpp
        xt = 128 if x_out > 128 else x_out
        n_xt = -(-x_out // xt)
        c_args = [
            b2[0], b2[1], mr.astype(jnp.float32), mi.astype(jnp.float32),
            *c_mats,
        ]
        c_specs = [
            pl.BlockSpec((gpp * avg, z, g.xw),
                         lambda gb, t: (n_gb - 1 - gb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp * avg, z, g.xw),
                         lambda gb, t: (n_gb - 1 - gb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp * avg, xt, z), lambda gb, t: (gb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp * avg, xt, z), lambda gb, t: (gb, t, 0),
                         memory_space=pltpu.VMEM),
        ] + [_full_spec(tuple(mm.shape)) for mm in c_mats]
        if g.peel:
            nyq_r, nyq_i = _nyq_partial_chain(
                nyq_raw[..., 0], nyq_planes, reg_mode, x, groups_eff, avg,
                pad,
            )
            avg_p = nyq_r.shape[1]
            c_args += [nyq_r, nyq_i]
            c_specs += [
                pl.BlockSpec((gpp, avg_p, z), lambda gb, t: (gb, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * 2
        return pl.pallas_call(
            partial(_lerp_irfft_xzy_kernel, prec=prec, avg=avg, peel=g.peel,
                    radix_x=g.radix_x, gpp=gpp),
            grid=(n_gb, n_xt),
            in_specs=c_specs,
            out_specs=pl.BlockSpec((xt, gpp, x), lambda gb, t: (t, gb, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x_out, groups_eff, x),
                                           jnp.float32),
            interpret=g.interpret,
            **vmem_params,
        )(*c_args)

    if g.radix_x:
        imats = _radix_x_inv_mats(x, g.radix_x)
        prct, pict = (jnp.asarray(mm.T.copy()) for mm in imats[:2])
        cols = tuple(jnp.asarray(mm.T.copy()) for mm in imats[2:])
        c_mats = (prct, pict) + cols
    else:
        axt, bxt = (jnp.asarray(mm[: g.xw].T.copy()) for mm in _irfft_mats(x))
        c_mats = (axt, bxt)

    c_args = [
        b2[0], b2[1], mr.astype(jnp.float32), mi.astype(jnp.float32),
        *c_mats,
    ]
    c_specs = [
        pl.BlockSpec((avg, z, g.xw), lambda i: (groups - 1 - i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((avg, z, g.xw), lambda i: (groups - 1 - i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((avg, x_out, z), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((avg, x_out, z), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [_full_spec(tuple(mm.shape)) for mm in c_mats]
    if g.peel:
        nyq_r, nyq_i = _nyq_partial_chain(
            nyq_raw[..., 0], nyq_planes, reg_mode, x, groups, avg, pad
        )
        avg_p = nyq_r.shape[1]
        c_args += [nyq_r, nyq_i]
        c_specs += [
            pl.BlockSpec((1, avg_p, z), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 2

    out = pl.pallas_call(
        partial(_lerp_irfft_kernel, prec=prec, avg=avg, peel=g.peel,
                radix_x=g.radix_x),
        grid=(groups,),
        in_specs=c_specs,
        out_specs=pl.BlockSpec((1, x, x_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((groups, x, x_out), jnp.float32),
        interpret=g.interpret,
        **vmem_params,
    )(*c_args)
    return out

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

Spectra are carried as split (re, im) float32 arrays: Mosaic has no complex
dtype, and the axon tunnel cannot fetch complex arrays anyway (CLAUDE.md).
Matmul precision (``BIAHUB_TPU_FFT_PRECISION``): the default ``high`` runs a
manual 2-term bf16 split (3 MXU passes; Mosaic has no native HIGH) at ~1e-5
relative error — 16.3 ms/volume on the flagship 256x256x1024 FOV vs XLA
rfftn's 44 ms; ``highest`` keeps the full f32 mantissa (6 passes, ~6e-7,
26.1 ms) when exactness matters more than throughput.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "deconvolve_zyx_pallas",
    "deconvolve_pallas_supported",
    "fourier_filter_zyx_pallas",
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


def _fwd_yx_kernel(
    v_ref, cx_ref, sx_ref, wyr_ref, wyi_ref, *out_refs, prec, zb, peel, radix
):
    """rfft along X then DFT along Y of ``zb`` (Y, X) z-slices, all in VMEM.

    ``peel``: the even-X Nyquist bin is dropped from the matmul width (so kx
    fills lane tiles exactly — 513 lanes cost 5 MXU tile-columns, 512 cost 4)
    and emitted separately as a cheap VPU (-1)^x reduction; its tiny y/z
    transforms run in XLA outside. ``radix``: spectra are written to separate
    even-z/odd-z arrays (requires zb == 2), feeding pass B's radix-2 z-DFT.
    """
    if radix:
        gr_refs = (out_refs[0], out_refs[2])
        gi_refs = (out_refs[1], out_refs[3])
        rest = out_refs[4:]
    else:
        gr_refs = (out_refs[0],) * zb
        gi_refs = (out_refs[1],) * zb
        rest = out_refs[2:]
    nyq_ref = rest[0] if peel else None
    wyr = wyr_ref[:]
    wyi = wyi_ref[:]
    for j in range(zb):
        v = v_ref[j]  # (Y, X)
        xr = _dot(v, cx_ref[:], prec)  # (Y, Xw)
        xi = _dot(v, sx_ref[:], prec)
        out_j = 0 if radix else j
        gr_refs[j][out_j] = _dot(wyr, xr, prec) - _dot(wyi, xi, prec)
        gi_refs[j][out_j] = _dot(wyr, xi, prec) + _dot(wyi, xr, prec)
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


def _z_filter_kernel(
    gr_ref,
    gi_ref,
    tf_ref,
    wzr_ref,
    wzi_ref,
    izr_ref,
    izi_ref,
    or_ref,
    oi_ref,
    *,
    reg,
    prec,
):
    """DFT_z -> Tikhonov filter -> iDFT_z for one ky row of the spectrum.

    The fully transformed spectrum lives only in VMEM between the two Z-DFT
    stages — this fusion is the whole point of the kernel. Spectra arrive
    ky-major ((Y, Z, Xh), one (1, Z, Xh) block per program), so every operand
    is a whole (Z, Xh) tile: contraction over z needs no sublane extraction
    (the per-column relayouts of a (Z, yb, Xh) slab held pass B at ~2x its
    floor), the kernel body is loop-free, and Xh needs no lane padding.
    """
    gr = gr_ref[0]  # (Z, Xh)
    gi = gi_ref[0]
    hr = _dot(wzr_ref[:], gr, prec) - _dot(wzi_ref[:], gi, prec)
    hi = _dot(wzr_ref[:], gi, prec) + _dot(wzi_ref[:], gr, prec)
    tf = tf_ref[0]
    filt = tf / (tf * tf + reg)
    hr = hr * filt
    hi = hi * filt
    or_ref[0] = _dot(izr_ref[:], hr, prec) - _dot(izi_ref[:], hi, prec)
    oi_ref[0] = _dot(izr_ref[:], hi, prec) + _dot(izi_ref[:], hr, prec)


def _z_complex_filter_kernel(
    gr_ref,
    gi_ref,
    fr_ref,
    fi_ref,
    wzr_ref,
    wzi_ref,
    izr_ref,
    izi_ref,
    or_ref,
    oi_ref,
    *,
    prec,
):
    """DFT_z -> complex (Hermitian) filter multiply -> iDFT_z per ky row.

    Same fusion (and ky-major layout) as :func:`_z_filter_kernel`, with the
    precomputed filter arriving as split (re, im) arrays — serves the
    phase-reconstruction inverse filter (recon/optics.py::tikhonov_inverse_3d).
    """
    gr = gr_ref[0]  # (Z, Xh)
    gi = gi_ref[0]
    hr = _dot(wzr_ref[:], gr, prec) - _dot(wzi_ref[:], gi, prec)
    hi = _dot(wzr_ref[:], gi, prec) + _dot(wzi_ref[:], gr, prec)
    fr = fr_ref[0]
    fi = fi_ref[0]
    pr = hr * fr - hi * fi
    pi = hr * fi + hi * fr
    or_ref[0] = _dot(izr_ref[:], pr, prec) - _dot(izi_ref[:], pi, prec)
    oi_ref[0] = _dot(izr_ref[:], pi, prec) + _dot(izi_ref[:], pr, prec)


def _radix_z_core(er, ei, or_, oi, wzr, wzi, izr, izi, twr, twi, filt_fn, prec):
    """Radix-2 DFT_z -> filter -> iDFT_z on even/odd (Z/2, Xw) tiles.

    Decimation in time: X_lo = E + tw*O, X_hi = E - tw*O with half-size dense
    DFTs E, O and twiddles tw[k] = exp(-2i*pi*k/Z) — (Z/2, Z/2) matmuls at
    half the FLOPs of the dense (Z, Z) transform, and Z/2 = 128 is exactly
    the MXU tile depth at the flagship Z = 256. The inverse mirrors it:
    x_even = iDFT(X_lo + X_hi)/2, x_odd = iDFT(conj(tw)*(X_lo - X_hi))/2
    (the /2 is folded into the iDFT matrices by the driver).
    """
    ehr = _dot(wzr, er, prec) - _dot(wzi, ei, prec)
    ehi = _dot(wzr, ei, prec) + _dot(wzi, er, prec)
    ohr = _dot(wzr, or_, prec) - _dot(wzi, oi, prec)
    ohi = _dot(wzr, oi, prec) + _dot(wzi, or_, prec)
    tr = twr * ohr - twi * ohi
    ti = twr * ohi + twi * ohr
    lo_r, lo_i = ehr + tr, ehi + ti
    hi_r, hi_i = ehr - tr, ehi - ti
    lo_r, lo_i, hi_r, hi_i = filt_fn(lo_r, lo_i, hi_r, hi_i)
    sr, si = lo_r + hi_r, lo_i + hi_i
    dr0, di0 = lo_r - hi_r, lo_i - hi_i
    # conj(tw) * (lo - hi)
    dr = twr * dr0 + twi * di0
    di = twr * di0 - twi * dr0
    xer = _dot(izr, sr, prec) - _dot(izi, si, prec)
    xei = _dot(izr, si, prec) + _dot(izi, sr, prec)
    xor_ = _dot(izr, dr, prec) - _dot(izi, di, prec)
    xoi = _dot(izr, di, prec) + _dot(izi, dr, prec)
    return xer, xei, xor_, xoi


def _z_filter_kernel_radix(
    er_ref, ei_ref, or_ref, oi_ref, tf_ref,
    wzr_ref, wzi_ref, izr_ref, izi_ref, twr_ref, twi_ref,
    her_ref, hei_ref, hor_ref, hoi_ref,
    *, reg, prec, z2,
):
    """Radix-2 Tikhonov variant of :func:`_z_filter_kernel` (one ky row)."""

    def filt(lo_r, lo_i, hi_r, hi_i):
        tf = tf_ref[0]
        f = tf / (tf * tf + reg)
        return lo_r * f[:z2], lo_i * f[:z2], hi_r * f[z2:], hi_i * f[z2:]

    xer, xei, xor_, xoi = _radix_z_core(
        er_ref[0], ei_ref[0], or_ref[0], oi_ref[0],
        wzr_ref[:], wzi_ref[:], izr_ref[:], izi_ref[:],
        twr_ref[:], twi_ref[:], filt, prec,
    )
    her_ref[0], hei_ref[0], hor_ref[0], hoi_ref[0] = xer, xei, xor_, xoi


def _z_complex_filter_kernel_radix(
    er_ref, ei_ref, or_ref, oi_ref, fr_ref, fi_ref,
    wzr_ref, wzi_ref, izr_ref, izi_ref, twr_ref, twi_ref,
    her_ref, hei_ref, hor_ref, hoi_ref,
    *, prec, z2,
):
    """Radix-2 complex-Hermitian-filter variant (one ky row)."""

    def filt(lo_r, lo_i, hi_r, hi_i):
        fr, fi = fr_ref[0], fi_ref[0]
        flr, fli, fhr, fhi = fr[:z2], fi[:z2], fr[z2:], fi[z2:]
        return (
            lo_r * flr - lo_i * fli,
            lo_r * fli + lo_i * flr,
            hi_r * fhr - hi_i * fhi,
            hi_r * fhi + hi_i * fhr,
        )

    xer, xei, xor_, xoi = _radix_z_core(
        er_ref[0], ei_ref[0], or_ref[0], oi_ref[0],
        wzr_ref[:], wzi_ref[:], izr_ref[:], izi_ref[:],
        twr_ref[:], twi_ref[:], filt, prec,
    )
    her_ref[0], hei_ref[0], hor_ref[0], hoi_ref[0] = xer, xei, xor_, xoi


def _inv_yx_kernel(*refs, prec, zb, peel, radix):
    """Inverse DFT along Y then irfft along X of ``zb`` (Y, Xw) slices.

    ``radix``: the spectra arrive as even-z/odd-z array pairs and the program
    writes the two consecutive real-z slices of its (2, Y, X) output block.
    ``peel``: the precomputed real Nyquist plane (lane 0 of a (zb, Y, 128)
    block) is broadcast-added with the (-1)^x basis on the VPU.
    """
    if radix:
        hr_refs = (refs[0], refs[2])
        hi_refs = (refs[1], refs[3])
        rest = refs[4:]
    else:
        hr_refs = (refs[0],) * zb
        hi_refs = (refs[1],) * zb
        rest = refs[2:]
    iyr_ref, iyi_ref, ar_ref, ai_ref = rest[:4]
    rest = rest[4:]
    nyq_ref = rest[0] if peel else None
    out_ref = rest[1] if peel else rest[0]
    iyr = iyr_ref[:]
    iyi = iyi_ref[:]
    for j in range(zb):
        hr = hr_refs[j][0 if radix else j]
        hi = hi_refs[j][0 if radix else j]
        rr = _dot(iyr, hr, prec) - _dot(iyi, hi, prec)
        ri = _dot(iyr, hi, prec) + _dot(iyi, hr, prec)
        out = _dot(rr, ar_ref[:], prec) + _dot(ri, ai_ref[:], prec)
        if peel:
            sign = 1.0 - 2.0 * (
                jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) % 2
            ).astype(jnp.float32)
            out = out + nyq_ref[j, :, 0:1] * sign
        out_ref[j] = out


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


def _nyq_filter_chain(nyq_raw, filter_arrays, reg, x):
    """XLA transform chain for the peeled Nyquist-kx plane.

    ``nyq_raw`` (Z, Y) is the real (-1)^x reduction from pass A; the plane's
    y/z DFTs, filter, and inverse DFTs are a 2D problem ~1000x smaller than
    the main spectrum, so XLA f32 FFTs handle it exactly. Returns the REAL
    plane pass C broadcast-adds with the (-1)^x basis, with the irfft's 1/X
    normalization folded in (the Nyquist bin's Hermitian weight is 1).
    """
    spec = jnp.fft.fftn(nyq_raw.astype(jnp.complex64), axes=(0, 1))
    if reg is not None:
        tf = filter_arrays[0][..., -1]  # (Z, Y) Nyquist slice
        spec = spec * (tf / (tf * tf + reg))
    else:
        fr, fi = (f[..., -1] for f in filter_arrays)
        spec = spec * jax.lax.complex(fr, fi)
    plane = jnp.real(jnp.fft.ifftn(spec, axes=(0, 1))) / x
    return plane.astype(jnp.float32)


def _run_fourier_pipeline(zyx_data: jax.Array, filter_arrays, reg=None):
    """Shared 3-pass driver: forward YX, the fused per-ky-row Z-DFT + filter
    + iDFT-Z pass, inverse YX. ``reg`` selects the Tikhonov kernels
    (filter_arrays = (tf,)); None selects the complex-Hermitian-filter
    kernels (filter_arrays = (re, im)).

    Two shape-gated optimizations (both exact, both on for the flagship
    256x256x1024 FOV):
    - **Nyquist peel** (X % 256 == 0): kx = X/2 + 1 is 1 mod 128, so the
      dense passes waste a fifth MXU tile-column on one lane; the Nyquist
      bin moves to a VPU reduction + tiny XLA chain and the matmuls run at
      exactly 4 tiles.
    - **Radix-2 z** (Z % 16 == 0): pass B's z-DFTs run as even/odd
      half-size dense transforms + twiddles — half the MXU FLOPs, and
      Z/2 = 128 is exactly the MXU tile depth at the flagship Z.
    """
    z, y, x = zyx_data.shape
    xh = x // 2 + 1
    peel = x % 2 == 0 and xh % 128 == 1 and xh > 1
    xw = xh - 1 if peel else xh
    radix = z % 16 == 0
    zb = 2 if z % 2 == 0 else 1
    z2 = z // 2
    prec = _precision()
    interpret = jax.default_backend() != "tpu"

    cx, sx = (jnp.asarray(m[:, :xw]) for m in _rfft_mats(x))
    wyr, wyi = (jnp.asarray(m) for m in _dft_mats(y))
    iyr, iyi = (jnp.asarray(m) for m in _idft_mats(y))
    ax, bx = (jnp.asarray(m[:xw]) for m in _irfft_mats(x))
    if radix:
        wzr, wzi = (jnp.asarray(m) for m in _dft_mats(z2))
        izr, izi = (jnp.asarray(m / 2.0) for m in _idft_mats(z2))
        ang = -2.0 * np.pi * np.arange(z2) / z
        twr = jnp.asarray(np.cos(ang)[:, None].astype(np.float32))
        twi = jnp.asarray(np.sin(ang)[:, None].astype(np.float32))
    else:
        wzr, wzi = (jnp.asarray(m) for m in _dft_mats(z))
        izr, izi = (jnp.asarray(m) for m in _idft_mats(z))

    v = zyx_data.astype(jnp.float32)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    # Working sets exceed the 16 MB default scoped-VMEM budget at flagship
    # shapes; the kernels are MXU-bound, so trading pipeline headroom for
    # big blocks is the right side of the bargain.
    vmem_params = (
        {}
        if interpret
        else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_BUDGET_BYTES
            )
        }
    )

    # -- Pass A ------------------------------------------------------------
    spec_zslice = pl.BlockSpec((zb, y, xw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_half = pl.BlockSpec((1, y, xw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if radix:
        a_out_specs = [spec_half] * 4
        a_out_shapes = [jax.ShapeDtypeStruct((z2, y, xw), jnp.float32)] * 4
    else:
        a_out_specs = [spec_zslice] * 2
        a_out_shapes = [jax.ShapeDtypeStruct((z, y, xw), jnp.float32)] * 2
    if peel:
        a_out_specs.append(
            pl.BlockSpec((zb, y, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        a_out_shapes.append(jax.ShapeDtypeStruct((z, y, 128), jnp.float32))
    a_out = pl.pallas_call(
        partial(_fwd_yx_kernel, prec=prec, zb=zb, peel=peel, radix=radix),
        grid=(z // zb,),
        in_specs=[
            pl.BlockSpec((zb, y, x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((x, xw)),
            full((x, xw)),
            full((y, y)),
            full((y, y)),
        ],
        out_specs=tuple(a_out_specs),
        out_shape=tuple(a_out_shapes),
        interpret=interpret,
        **vmem_params,
    )(v, cx, sx, wyr, wyi)
    spectra = list(a_out[:-1] if peel else a_out)
    nyq_plane = None
    if peel:
        nyq_plane = _nyq_filter_chain(a_out[-1][..., 0], filter_arrays, reg, x)

    # -- Pass B ------------------------------------------------------------
    # One program per ky ROW on ky-major spectra: each operand is a whole
    # (Z[/2], Xw) tile, so the z contraction needs no sublane extraction and
    # no per-column loop. The (z, ky, kx) -> (ky, z, kx) transposes are
    # major-axis-only XLA copies (the lane axis stays minor) — measured
    # cheaper than slab relayouts (~2x pass-B cost) or lane-folding's
    # flatten copies plus 25% pad traffic on every pass.
    def t01(a):
        return jnp.transpose(a, (1, 0, 2))

    filt_main = [t01(f[..., :xw]) for f in filter_arrays]
    zdim = z2 if radix else z
    spec_row = pl.BlockSpec((1, zdim, xw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_filt = pl.BlockSpec((1, z, xw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    n_spec = len(spectra)
    if radix:
        b_kernel = (
            partial(_z_filter_kernel_radix, reg=float(reg), prec=prec, z2=z2)
            if reg is not None
            else partial(_z_complex_filter_kernel_radix, prec=prec, z2=z2)
        )
        b_mats = [full((z2, z2))] * 4 + [full((z2, 1))] * 2
        mats = (wzr, wzi, izr, izi, twr, twi)
    else:
        b_kernel = (
            partial(_z_filter_kernel, reg=float(reg), prec=prec)
            if reg is not None
            else partial(_z_complex_filter_kernel, prec=prec)
        )
        b_mats = [full((z, z))] * 4
        mats = (wzr, wzi, izr, izi)
    filtered = pl.pallas_call(
        b_kernel,
        grid=(y,),
        in_specs=[spec_row] * n_spec + [spec_filt] * len(filt_main) + b_mats,
        out_specs=(spec_row,) * n_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((y, zdim, xw), jnp.float32) for _ in range(n_spec)
        ),
        # The forward spectrum is dead after this pass — reuse its buffers.
        input_output_aliases={i: i for i in range(n_spec)},
        interpret=interpret,
        **vmem_params,
    )(*[t01(s) for s in spectra], *filt_main, *mats)

    # -- Pass C ------------------------------------------------------------
    c_zb = 2 if radix else zb
    c_grid = z2 if radix else z // zb
    c_spec_in = spec_half if radix else spec_zslice
    c_in_specs = [c_spec_in] * n_spec + [
        full((y, y)),
        full((y, y)),
        full((xw, x)),
        full((xw, x)),
    ]
    c_args = [t01(f) for f in filtered] + [iyr, iyi, ax, bx]
    if peel:
        c_in_specs.append(
            pl.BlockSpec((c_zb, y, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        c_args.append(
            jnp.pad(nyq_plane[:, :, None], ((0, 0), (0, 0), (0, 127)))
        )
    out = pl.pallas_call(
        partial(_inv_yx_kernel, prec=prec, zb=c_zb, peel=peel, radix=radix),
        grid=(c_grid,),
        in_specs=c_in_specs,
        out_specs=pl.BlockSpec(
            (c_zb, y, x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((z, y, x), jnp.float32),
        interpret=interpret,
        **vmem_params,
    )(*c_args)
    return out


def deconvolve_zyx_pallas(
    zyx_data: jax.Array,
    transfer_function_half: jax.Array,
    regularization_strength: float = 1e-3,
) -> jax.Array:
    """Fused Tikhonov inverse filter; bit-parity with the XLA rfftn path to
    ~1e-5 relative (dense f32 DFT vs split-radix FFT rounding)."""
    tf = transfer_function_half.astype(jnp.float32)
    return _run_fourier_pipeline(
        zyx_data, (tf,), reg=float(regularization_strength)
    )


def fourier_filter_zyx_pallas(
    zyx_data: jax.Array,
    filter_half_real: jax.Array,
    filter_half_imag: jax.Array,
) -> jax.Array:
    """Apply a HERMITIAN complex frequency filter to a real volume:
    ``real(ifftn(fftn(v) * F))`` on the rfft half-spectrum.

    The phase-reconstruction inverse filter ``conj(H)/(|H|^2 + reg)`` is
    Hermitian because the WOTF H is the FFT of a real defocus kernel
    (recon/optics.py::phase_wotf_3d), so the half spectrum carries the whole
    operation. The filter halves arrive as split (re, im) f32 arrays sliced
    to ``[..., : X // 2 + 1]``.
    """
    return _run_fourier_pipeline(
        zyx_data,
        (
            filter_half_real.astype(jnp.float32),
            filter_half_imag.astype(jnp.float32),
        ),
    )

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
    v_ref, cx_ref, sx_ref, wyr_ref, wyi_ref, gr_ref, gi_ref, *, prec, zb
):
    """rfft along X then DFT along Y of ``zb`` (Y, X) z-slices, all in VMEM."""
    wyr = wyr_ref[:]
    wyi = wyi_ref[:]
    for j in range(zb):
        v = v_ref[j]  # (Y, X)
        xr = _dot(v, cx_ref[:], prec)  # (Y, Xh)
        xi = _dot(v, sx_ref[:], prec)
        gr_ref[j] = _dot(wyr, xr, prec) - _dot(wyi, xi, prec)
        gi_ref[j] = _dot(wyr, xi, prec) + _dot(wyi, xr, prec)


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


def _inv_yx_kernel(
    hr_ref, hi_ref, iyr_ref, iyi_ref, ar_ref, ai_ref, out_ref, *, prec, zb
):
    """Inverse DFT along Y then irfft along X of ``zb`` (Y, Xh) slices."""
    iyr = iyr_ref[:]
    iyi = iyi_ref[:]
    for j in range(zb):
        hr = hr_ref[j]
        hi = hi_ref[j]
        rr = _dot(iyr, hr, prec) - _dot(iyi, hi, prec)
        ri = _dot(iyr, hi, prec) + _dot(iyi, hr, prec)
        out_ref[j] = _dot(rr, ar_ref[:], prec) + _dot(ri, ai_ref[:], prec)


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


def _run_fourier_pipeline(zyx_data: jax.Array, z_filter_kernel, filter_arrays):
    """Shared 3-pass driver: forward YX, a caller-supplied fused Z-DFT +
    filter + iDFT-Z kernel over y-slabs, inverse YX."""
    z, y, x = zyx_data.shape
    xh = x // 2 + 1
    prec = _precision()
    interpret = jax.default_backend() != "tpu"

    cx, sx = (jnp.asarray(m) for m in _rfft_mats(x))
    wyr, wyi = (jnp.asarray(m) for m in _dft_mats(y))
    wzr, wzi = (jnp.asarray(m) for m in _dft_mats(z))
    izr, izi = (jnp.asarray(m) for m in _idft_mats(z))
    iyr, iyi = (jnp.asarray(m) for m in _idft_mats(y))
    ax, bx = (jnp.asarray(m) for m in _irfft_mats(x))

    v = zyx_data.astype(jnp.float32)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    # Two z-slices per program amortize per-program grid/DMA overhead in the
    # YX passes without the compile-time blowup of deeper unrolls.
    zb = 2 if z % 2 == 0 else 1
    spec_zslice = pl.BlockSpec((zb, y, xh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # Working sets exceed the 16 MB default scoped-VMEM budget at flagship
    # shapes (pass B's slabs; passes A/C's 2-slice blocks under vmap); the
    # kernels are MXU-bound, so trading pipeline headroom for big blocks is
    # the right side of the bargain.
    vmem_params = (
        {}
        if interpret
        else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_BUDGET_BYTES
            )
        }
    )

    gr, gi = pl.pallas_call(
        partial(_fwd_yx_kernel, prec=prec, zb=zb),
        grid=(z // zb,),
        in_specs=[
            pl.BlockSpec((zb, y, x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((x, xh)),
            full((x, xh)),
            full((y, y)),
            full((y, y)),
        ],
        out_specs=(spec_zslice, spec_zslice),
        out_shape=(
            jax.ShapeDtypeStruct((z, y, xh), jnp.float32),
            jax.ShapeDtypeStruct((z, y, xh), jnp.float32),
        ),
        interpret=interpret,
        **vmem_params,
    )(v, cx, sx, wyr, wyi)

    # Pass B runs one program per ky ROW on ky-major spectra: each operand is
    # then a whole (Z, Xh) tile, so the z contraction needs no sublane
    # extraction, no lane padding, and no per-column loop. The (z, ky, kx) ->
    # (ky, z, kx) transposes are major-axis only (the lane axis stays minor),
    # which XLA moves at near-HBM speed — measured cheaper than either the
    # slab relayouts (~2x pass-B cost) or lane-folding's flatten copies plus
    # 25% pad traffic on every pass.
    def t01(a):
        return jnp.transpose(a, (1, 0, 2))

    spec_row = pl.BlockSpec((1, z, xh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    hr, hi = pl.pallas_call(
        partial(z_filter_kernel, prec=prec),
        grid=(y,),
        in_specs=[spec_row, spec_row]
        + [spec_row] * len(filter_arrays)
        + [full((z, z))] * 4,
        out_specs=(spec_row, spec_row),
        out_shape=(
            jax.ShapeDtypeStruct((y, z, xh), jnp.float32),
            jax.ShapeDtypeStruct((y, z, xh), jnp.float32),
        ),
        # The forward spectrum is dead after this pass — reuse its buffers.
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
        **vmem_params,
    )(t01(gr), t01(gi), *[t01(f) for f in filter_arrays], wzr, wzi, izr, izi)

    out = pl.pallas_call(
        partial(_inv_yx_kernel, prec=prec, zb=zb),
        grid=(z // zb,),
        in_specs=[
            spec_zslice,
            spec_zslice,
            full((y, y)),
            full((y, y)),
            full((xh, x)),
            full((xh, x)),
        ],
        out_specs=pl.BlockSpec((zb, y, x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((z, y, x), jnp.float32),
        interpret=interpret,
        **vmem_params,
    )(t01(hr), t01(hi), iyr, iyi, ax, bx)
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
        zyx_data,
        partial(_z_filter_kernel, reg=float(regularization_strength)),
        (tf,),
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
        _z_complex_filter_kernel,
        (
            filter_half_real.astype(jnp.float32),
            filter_half_imag.astype(jnp.float32),
        ),
    )

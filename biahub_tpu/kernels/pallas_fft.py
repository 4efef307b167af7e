"""Fused VMEM-resident matmul-DFT deconvolution kernel.

TPU-native replacement for the XLA ``rfftn -> Tikhonov filter -> irfftn``
deconvolution chain (reference semantics: biahub/deconvolve.py:34-70, backed
by waveorder's isotropic fluorescence model). XLA's TPU FFT runs far below
the HBM roofline here (~44 ms for a 256x256x1024 volume, ~85% of the 4-step
reconstruction chain), and XLA-level matmul-DFT rewrites lose on data
movement because every DFT stage round-trips HBM (docs/kernels.md). This
module fuses the whole inverse filter into three Pallas passes whose DFT
stages stay resident in VMEM:

- **Pass A** (grid over z-slabs): per z-slice, rfft along X and full DFT
  along Y as dense MXU matmuls — one HBM read of the volume, one write of
  the (re, im) half-spectrum.
- **Pass B** (grid over y-slabs): DFT along Z, the Tikhonov filter
  ``tf / (tf^2 + reg)``, and the inverse DFT along Z — fused, so the fully
  transformed spectrum never touches HBM.
- **Pass C** (grid over z-slabs): inverse DFT along Y and irfft along X per
  slice, emitting the real volume.

Spectra are carried as split (re, im) float32 arrays: Mosaic has no complex
dtype, and the axon tunnel cannot fetch complex arrays anyway (CLAUDE.md).

Matmul precision (``BIAHUB_TPU_FFT_PRECISION``): the default ``high`` runs a
2-term bf16-split contraction (3 MXU passes — Mosaic has no native HIGH) at
~1e-5 relative error; the static DFT matrices are pre-split into stacked
(hi, lo) bf16 pairs on the host so only the data operand is split in-kernel.
``highest`` keeps the full f32 mantissa (6 passes, ~6e-7) when exactness
matters more than throughput; 16.3 ms vs 26.1 ms per flagship volume, both
far ahead of XLA rfftn's 44 ms.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["deconvolve_zyx_pallas", "deconvolve_pallas_supported"]

_VMEM_BUDGET_BYTES = 96 * 1024 * 1024


def _precision() -> str:
    """Matmul precision mode: high (2-term bf16 split, 3 passes, ~1e-5 rel
    error — Mosaic has no native HIGH), highest (6 bf16 passes, ~6e-7), or
    default (1 bf16 pass, ~1e-2; throughput screening only)."""
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


def _pack_mat(m: np.ndarray, prec: str) -> np.ndarray:
    """Matrix operand in kernel-ready form: stacked (hi, lo) bf16 for the
    split mode, plain f32 otherwise."""
    if prec != "high":
        return m
    import ml_dtypes

    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.stack([hi, lo])


# ---------------------------------------------------------------------------
# Kernel-side contraction helpers
# ---------------------------------------------------------------------------


def _d(x, y, precision=None):
    return jnp.dot(x, y, preferred_element_type=jnp.float32, precision=precision)


def _mat(ref, prec):
    """Load a matrix ref prepared by :func:`_pack_mat`."""
    if prec == "high":
        return ref[0], ref[1]
    return ref[:]


def _split(a):
    """2-term bf16 decomposition of an f32 array (data operand)."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return ah, al


def _prep(a, prec):
    """Prepare a data operand once so it can feed several contractions."""
    return _split(a) if prec == "high" else a


def _dot_dm(a, m, prec):
    """``data @ matrix``; ``a`` from :func:`_prep`, ``m`` from :func:`_mat`."""
    if prec == "high":
        ah, al = a
        mh, ml = m
        return _d(ah, mh) + _d(ah, ml) + _d(al, mh)
    p = jax.lax.Precision.HIGHEST if prec == "highest" else jax.lax.Precision.DEFAULT
    return _d(a, m, p)


def _dot_md(m, a, prec):
    """``matrix @ data`` (same contract as :func:`_dot_dm`)."""
    if prec == "high":
        ah, al = a
        mh, ml = m
        return _d(mh, ah) + _d(ml, ah) + _d(mh, al)
    p = jax.lax.Precision.HIGHEST if prec == "highest" else jax.lax.Precision.DEFAULT
    return _d(m, a, p)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_yx_kernel(
    v_ref, cx_ref, sx_ref, wyr_ref, wyi_ref, gr_ref, gi_ref, *, prec, zb
):
    """rfft along X then DFT along Y of ``zb`` (Y, X) z-slices, all in VMEM."""
    cx = _mat(cx_ref, prec)
    sx = _mat(sx_ref, prec)
    wyr = _mat(wyr_ref, prec)
    wyi = _mat(wyi_ref, prec)
    for zz in range(zb):
        v = _prep(v_ref[zz], prec)  # (Y, X)
        xr = _prep(_dot_dm(v, cx, prec), prec)  # (Y, Xh)
        xi = _prep(_dot_dm(v, sx, prec), prec)
        gr_ref[zz] = _dot_md(wyr, xr, prec) - _dot_md(wyi, xi, prec)
        gi_ref[zz] = _dot_md(wyr, xi, prec) + _dot_md(wyi, xr, prec)


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
    yb,
    reg,
    prec,
):
    """DFT_z -> Tikhonov filter -> iDFT_z for a (Z, yb, Xh) spectrum slab.

    The fully transformed spectrum lives only in VMEM between the two Z-DFT
    stages — this fusion is the whole point of the kernel.
    """
    wzr = _mat(wzr_ref, prec)
    wzi = _mat(wzi_ref, prec)
    izr = _mat(izr_ref, prec)
    izi = _mat(izi_ref, prec)
    for j in range(yb):
        gr = _prep(gr_ref[:, j, :], prec)  # (Z, Xh)
        gi = _prep(gi_ref[:, j, :], prec)
        hr = _dot_md(wzr, gr, prec) - _dot_md(wzi, gi, prec)
        hi = _dot_md(wzr, gi, prec) + _dot_md(wzi, gr, prec)
        tf = tf_ref[:, j, :]
        filt = tf / (tf * tf + reg)
        hr = _prep(hr * filt, prec)
        hi = _prep(hi * filt, prec)
        or_ref[:, j, :] = _dot_md(izr, hr, prec) - _dot_md(izi, hi, prec)
        oi_ref[:, j, :] = _dot_md(izr, hi, prec) + _dot_md(izi, hr, prec)


def _inv_yx_kernel(
    hr_ref, hi_ref, iyr_ref, iyi_ref, ar_ref, ai_ref, out_ref, *, prec, zb
):
    """Inverse DFT along Y then irfft along X of ``zb`` (Y, Xh) slices."""
    iyr = _mat(iyr_ref, prec)
    iyi = _mat(iyi_ref, prec)
    ax = _mat(ar_ref, prec)
    bx = _mat(ai_ref, prec)
    for zz in range(zb):
        hr = _prep(hr_ref[zz], prec)
        hi = _prep(hi_ref[zz], prec)
        rr = _prep(_dot_md(iyr, hr, prec) - _dot_md(iyi, hi, prec), prec)
        ri = _prep(_dot_md(iyr, hi, prec) + _dot_md(iyi, hr, prec), prec)
        out_ref[zz] = _dot_dm(rr, ax, prec) + _dot_dm(ri, bx, prec)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def _y_slab(y: int) -> int:
    return 8 if y % 8 == 0 else y


def _z_slab(z: int) -> int:
    return 4 if z % 4 == 0 else 1


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
    yb = _y_slab(y)
    zb = _z_slab(z)
    f32 = 4
    # Pass A working set: z-slab + rfft/DFT matrices + spectrum slabs,
    # doubled for Mosaic's pipeline buffering.
    pass_a = (zb * y * x + 2 * x * xh + 2 * y * y + (4 + 2 * zb) * y * xh) * f32 * 2
    # Pass B: three input slabs + two output slabs + four (Z, Z) matrices
    # + per-column temporaries.
    pass_b = (5 * z * yb * xh + 4 * z * z + 6 * z * xh) * f32 * 2
    pass_c = ((4 + 2 * zb) * y * xh + 2 * y * y + 2 * x * xh + zb * y * x) * f32 * 2
    return max(pass_a, pass_b, pass_c) < _VMEM_BUDGET_BYTES


def deconvolve_zyx_pallas(
    zyx_data: jax.Array,
    transfer_function_half: jax.Array,
    regularization_strength: float = 1e-3,
) -> jax.Array:
    """Fused Tikhonov inverse filter; parity with the XLA rfftn path to
    ~1e-5 relative at the default precision (~6e-7 at ``highest``)."""
    z, y, x = zyx_data.shape
    xh = x // 2 + 1
    prec = _precision()
    interpret = jax.default_backend() != "tpu"

    cx, sx = (jnp.asarray(_pack_mat(m, prec)) for m in _rfft_mats(x))
    wyr, wyi = (jnp.asarray(_pack_mat(m, prec)) for m in _dft_mats(y))
    wzr, wzi = (jnp.asarray(_pack_mat(m, prec)) for m in _dft_mats(z))
    izr, izi = (jnp.asarray(_pack_mat(m, prec)) for m in _idft_mats(z))
    iyr, iyi = (jnp.asarray(_pack_mat(m, prec)) for m in _idft_mats(y))
    ax, bx = (jnp.asarray(_pack_mat(m, prec)) for m in _irfft_mats(x))

    v = zyx_data.astype(jnp.float32)
    tf = transfer_function_half.astype(jnp.float32)

    def full(arr):
        shape = arr.shape
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    zb = _z_slab(z)
    spec_zslab = pl.BlockSpec((zb, y, xh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    params = (
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
            full(cx),
            full(sx),
            full(wyr),
            full(wyi),
        ],
        out_specs=(spec_zslab, spec_zslab),
        out_shape=(
            jax.ShapeDtypeStruct((z, y, xh), jnp.float32),
            jax.ShapeDtypeStruct((z, y, xh), jnp.float32),
        ),
        interpret=interpret,
        **params,
    )(v, cx, sx, wyr, wyi)

    yb = _y_slab(y)
    spec_yslab = pl.BlockSpec((z, yb, xh), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    hr, hi = pl.pallas_call(
        partial(
            _z_filter_kernel, yb=yb, reg=float(regularization_strength), prec=prec
        ),
        grid=(y // yb,),
        in_specs=[
            spec_yslab,
            spec_yslab,
            spec_yslab,
            full(wzr),
            full(wzi),
            full(izr),
            full(izi),
        ],
        out_specs=(spec_yslab, spec_yslab),
        out_shape=(
            jax.ShapeDtypeStruct((z, y, xh), jnp.float32),
            jax.ShapeDtypeStruct((z, y, xh), jnp.float32),
        ),
        # The forward spectrum is dead after this pass — reuse its buffers.
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
        **params,
    )(gr, gi, tf, wzr, wzi, izr, izi)

    out = pl.pallas_call(
        partial(_inv_yx_kernel, prec=prec, zb=zb),
        grid=(z // zb,),
        in_specs=[
            spec_zslab,
            spec_zslab,
            full(iyr),
            full(iyi),
            full(ax),
            full(bx),
        ],
        out_specs=pl.BlockSpec(
            (zb, y, x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((z, y, x), jnp.float32),
        interpret=interpret,
        **params,
    )(hr, hi, iyr, iyi, ax, bx)
    return out

"""Exact 2-tap-lerp resampling evaluated from the z-spectrum.

Groundwork for folding the deskew shear-resample INTO the inverse-FFT
passes (CLAUDE.md round-4 item 0): the deskew is a 1D linear interpolation
along the raw scan axis at positions ``p = px*x' - px*ct*z' + offset``
(kernels/deskew.py:233-259, mirroring reference biahub/deskew.py:139-151).
Instead of iDFT-ing to the integer z grid and then lerping, one matrix per
output row evaluates the lerp DIRECTLY from the spectrum:

    lerp(ifft(V), p) == M(p) @ V          (exact, not band-limited/sinc)

because the lerp is a linear functional of the samples:

    M[n, kz] = (1/Z) * [(1-f) e^{i*theta*z0} + f e^{i*theta*(z0+1)}]
             = (1/Z) * e^{i*theta*p} * g(theta, f)
    g(theta, f) = (1-f) e^{-i*theta*f} + f e^{i*theta*(1-f)}

with theta = 2*pi*kz/Z, z0 = floor(p), f = p - z0. The factored form is the
one the future Pallas pass C' wants: ``g`` depends only on (kz, frac(p)) and
the phase ramp is an outer product, so per-y matrices are a cheap modulation
of shared tables — but both forms are O(N*Z) transcendentals, so matrices
are PRECOMPUTED per acquisition (like pallas_fft.prepare_fourier_filter),
~126 MB bf16 at the flagship shape.

Caveats pinned by tests/test_fourier_resample.py:

- Spectrum evaluation is PERIODIC: positions whose lerp taps fall outside
  [0, Z-1] wrap instead of reading the zero-padding the real-space kernel
  uses. ``deskew_sample_positions`` returns the exactness mask; with
  ``keep_overhang=False`` geometries the interior is typically fully exact
  and any boundary columns must be zeroed (or real-space-patched) by the
  consumer.
- Matches the f32 real-space lerp to ~1e-6 relative in f64, limited by the
  pipeline's own f32 rounding when compared against deskew_zyx.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "lerp_dft_matrix",
    "masked_lerp_dft_matrix",
    "lerp_dft_factors",
    "deskew_sample_positions",
    "fourier_deskew_reference",
    "fourier_deconvolve_deskew_reference",
]


def lerp_dft_matrix(n: int, positions: np.ndarray) -> np.ndarray:
    """Complex (len(positions), n) matrix M with ``M @ fft(v) == lerp(v, p)``.

    Uses the numpy DFT convention (``np.fft.fft`` spectra). Positions may be
    any reals; taps wrap periodically (see module caveat).
    """
    p = np.asarray(positions, dtype=np.float64).ravel()
    z0 = np.floor(p)
    f = (p - z0)[:, None]
    kz = np.arange(n, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * kz / n
    return (
        (1.0 - f) * np.exp(1j * theta * z0[:, None])
        + f * np.exp(1j * theta * (z0[:, None] + 1.0))
    ) / n


def masked_lerp_dft_matrix(n: int, positions: np.ndarray) -> np.ndarray:
    """Like :func:`lerp_dft_matrix` but with PER-TAP validity masking: a tap
    whose index falls outside ``[0, n-1]`` is dropped from the row instead of
    wrapping, which reproduces the real-space kernel's zero-padded lerp
    EXACTLY (kernels/deskew.py:250-258 masks v0/v1 the same way) — including
    boundary columns and fully-out-of-range rows (which become zero). This is
    the production table the fused pass C' consumes
    (kernels/pallas_spectral.py); the unmasked form above remains the
    textbook identity the tests pin.

    Built from integer-mod roots of unity: ``e^{i*theta*z0}`` with integer
    ``z0`` and ``theta = 2*pi*kz/n`` is ``E[(kz*z0) mod n]`` for the n-entry
    table ``E[m] = e^{2i*pi*m/n}`` — exact in f64, no large-angle
    transcendental loss, and fast enough to build per acquisition.
    """
    p = np.asarray(positions, dtype=np.float64).ravel()
    i0 = np.floor(p)
    f = p - i0
    i0 = i0.astype(np.int64)
    kz = np.arange(n, dtype=np.int64)
    e_table = np.exp(2j * np.pi * np.arange(n) / n)
    w0 = np.where((i0 >= 0) & (i0 <= n - 1), 1.0 - f, 0.0)
    w1 = np.where((i0 + 1 >= 0) & (i0 + 1 <= n - 1), f, 0.0)
    m0 = np.mod(i0[:, None] * kz[None, :], n)
    m1 = np.mod((i0 + 1)[:, None] * kz[None, :], n)
    return (w0[:, None] * e_table[m0] + w1[:, None] * e_table[m1]) / n


def lerp_dft_factors(
    n: int, positions: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """The factored form: ``(phase, g)`` with ``phase * g == lerp_dft_matrix``.

    ``phase[j, kz] = e^{i*theta*p_j}/n`` is a pure position ramp (rank-1 in
    the exponent — the kernel-side per-y modulation), and
    ``g[j, kz] = (1-f)e^{-i*theta*f} + f e^{i*theta*(1-f)}`` depends only on
    the fractional part, so rows with equal ``frac(p)`` share it.
    """
    p = np.asarray(positions, dtype=np.float64).ravel()
    f = (p - np.floor(p))[:, None]
    kz = np.arange(n, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * kz / n
    phase = np.exp(1j * theta * p[:, None]) / n
    g = (1.0 - f) * np.exp(-1j * theta * f) + f * np.exp(1j * theta * (1.0 - f))
    return phase, g


def deskew_sample_positions(
    raw_shape: tuple[int, int, int],
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Scan-axis sample positions of the deskew resample, plus exactness mask.

    Returns ``(in_z, exact)`` of shape (Z_out, X_out): ``in_z`` is the
    fractional raw-z position feeding output voxel (z_out, :, x_out) —
    IDENTICAL math to kernels/deskew.py:233-244 — and ``exact`` marks
    entries whose periodic-spectrum evaluation equals the real-space masked
    lerp (both taps in range, or tap 0 in range with zero fraction).

    Caveat: the zero-fraction test is an exact f64 ``f == 0``, while the
    production kernels compute fractions in f32 — a position that is integer
    in one precision but not the other can flip classification right at the
    boundary. The mask is only consumed by the UNMASKED-matrix reference
    paths here; the production table (:func:`masked_lerp_dft_matrix`) drops
    invalid taps per entry and needs no mask at all.
    """
    from biahub_tpu.kernels.deskew import get_deskewed_data_shape

    Z_in, Y_in, X_in = raw_shape
    output_shape, _ = get_deskewed_data_shape(
        (Z_in, Y_in, X_in), ls_angle_deg, px_to_scan_ratio, keep_overhang
    )
    Z_out, X_out = Y_in, output_shape[2]
    ct = float(np.cos(ls_angle_deg * np.pi / 180))
    px = float(px_to_scan_ratio)
    offset = px * ct * (Z_out - 1) / 2 - px * (X_out - 1) / 2 + (Z_in - 1) / 2
    z_idx = np.arange(Z_out, dtype=np.float64)[:, None]
    x_idx = np.arange(X_out, dtype=np.float64)[None, :]
    in_z = px * x_idx - px * ct * z_idx + offset
    i0 = np.floor(in_z)
    f = in_z - i0
    both_in = (i0 >= 0) & (i0 + 1 <= Z_in - 1)
    lower_only = (i0 >= 0) & (i0 <= Z_in - 1) & (f == 0)
    return in_z, both_in | lower_only


def _pooled_lerp_rows(
    spectra: np.ndarray,
    in_z: np.ndarray,
    exact: np.ndarray,
    n: int,
    window: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Shared pass-C' accumulation loop: per tilt row, apply the lerp-DFT
    matrix to that row's scan-axis spectrum and accumulate ``window``
    consecutive rows into each pooled output row at store time (edge-padding
    the tail with the last row, matching kernels/deskew.py::average_n_slices).
    The pooled mask is conservative: an output row is exact only when every
    contributing row is. ``spectra`` is (Z_out_rows, n, Y_out)."""
    Z_out, X_out = in_z.shape
    w = int(window)
    n_groups = -(-Z_out // w)
    out = np.zeros((n_groups, X_out, spectra.shape[2]), dtype=np.float64)
    pooled_exact = np.ones((n_groups, X_out), dtype=bool)
    for z_out in range(n_groups * w):
        src = min(z_out, Z_out - 1)  # edge-pad the tail group
        m = lerp_dft_matrix(n, in_z[src])  # (X_out, n)
        out[z_out // w] += (m @ spectra[src]).real / w
        pooled_exact[z_out // w] &= exact[src]
    return np.transpose(out, (0, 2, 1)), pooled_exact


def fourier_deskew_reference(
    raw_data: np.ndarray,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Deskew one ZYX volume entirely via spectrum-domain lerp matrices.

    Slow reference implementation of the round-4 fused pass C' numerics
    (axis permute as in kernels/deskew.py:229-232 with ``skip_flip``-style
    unflipped Y, then per-z_out matrix application). Returns
    ``(deskewed, exact_mask)`` with the deskewed volume in the UNFLIPPED
    (Z_out, Y_out, X_out) frame of ``deskew_zyx(..., skip_flip=True)`` and
    the (Z_out, X_out) exactness mask; entries outside the mask wrap and
    must be zeroed/patched by the caller before comparing.

    ``average_window`` demonstrates the kernel-side slice-averaging fold:
    the pooled axis is the TILT axis, and each pooled member samples at a
    different shear offset, so the pool cannot ride a smaller iDFT_y — the
    per-row matmul results are accumulated into w-fold fewer output rows at
    store time instead (edge-padding the tail with the last row, matching
    kernels/deskew.py::average_n_slices). Output traffic shrinks w-fold;
    matmul count does not. The returned mask is pooled conservatively (an
    output row is exact only when every contributing row is).
    """
    Z_in, Y_in, X_in = raw_data.shape
    in_z, exact = deskew_sample_positions(
        (Z_in, Y_in, X_in), ls_angle_deg, px_to_scan_ratio, keep_overhang
    )
    Z_out, X_out = in_z.shape
    # (Z_out rows, raw scan z, Y_out) — the tilt axis leads, the scan axis is
    # the transform axis, and the coverslip-plane axis rides along.
    data = np.flip(np.transpose(raw_data.astype(np.float64), (1, 0, 2)), axis=0)
    spectra = np.fft.fft(data, axis=1)  # (Z_out, Z_in, Y_out)
    return _pooled_lerp_rows(spectra, in_z, exact, Z_in, average_window)


def fourier_deconvolve_deskew_reference(
    raw_data: np.ndarray,
    transfer_function: np.ndarray,
    regularization_strength: float,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Deconvolve + deskew as ONE spectral pipeline — the full round-4 chain.

    Validates the pass-commutation the planned B'/C' restructure rests on:
    Tikhonov filter in the full 3D frequency domain, inverse transforms over
    the tilt and coverslip axes FIRST (the future A/B' passes), then the
    per-tilt-row fused lerp matrices along the remaining scan-axis spectrum
    (the future pass C') — against the production composition
    ``deconvolve_zyx`` then ``deskew_zyx`` (reference semantics:
    biahub/deconvolve.py:34-70 then biahub/deskew.py:459-545).

    Same returns/conventions as :func:`fourier_deskew_reference`.
    """
    Z_in, Y_in, X_in = raw_data.shape
    tf = np.asarray(transfer_function, dtype=np.float64)
    filt = tf / (tf**2 + float(regularization_strength))
    spec = np.fft.fftn(raw_data.astype(np.float64)) * filt
    # Inverse over tilt (axis 1) and coverslip (axis 2); the scan axis stays
    # in the frequency domain for the fused resample.
    part = np.fft.ifft(np.fft.ifft(spec, axis=1), axis=2)
    in_z, exact = deskew_sample_positions(
        (Z_in, Y_in, X_in), ls_angle_deg, px_to_scan_ratio, keep_overhang
    )
    # (tilt rows, scan-axis spectrum, coverslip) with the tilt flip of
    # kernels/deskew.py:229-232 (skip_flip frame).
    spectra = np.flip(np.transpose(part, (1, 0, 2)), axis=0)
    return _pooled_lerp_rows(spectra, in_z, exact, Z_in, average_window)

"""Math validation for the spectrum-domain lerp (round-4 fused-deskew prep).

Pins the three identities the future fused pass C' rests on
(biahub_tpu/kernels/fourier_resample.py):

1. ``lerp_dft_matrix(Z, p) @ fft(v) == lerp(v, p)`` exactly (linear
   functional of the samples — NOT a band-limited approximation).
2. The factored (phase, g) form reproduces the dense matrix — the kernel's
   per-y modulation layout is mathematically equivalent.
3. The full Fourier-domain deskew equals ``deskew_zyx(..., skip_flip=True)``
   on every exact-mask voxel, and the keep_overhang=False interior is
   majority-exact (the wrap-affected boundary is a thin set of columns).
"""

import numpy as np
import pytest

from biahub_tpu.kernels.fourier_resample import (
    deskew_sample_positions,
    fourier_deskew_reference,
    lerp_dft_factors,
    lerp_dft_matrix,
    masked_lerp_dft_matrix,
)

LS_ANGLE, PX_TO_SCAN = 36.0, 0.387


def _real_lerp(v, positions):
    z0 = np.floor(positions).astype(int)
    f = positions - z0
    return (1 - f) * v[z0 % len(v)] + f * v[(z0 + 1) % len(v)]


@pytest.mark.parametrize("n", [8, 23, 64])
def test_lerp_dft_matrix_matches_real_space_lerp(n):
    rng = np.random.default_rng(0)
    v = rng.standard_normal(n)
    # In-range positions, including exact integers and near-edge fractions.
    p = np.concatenate(
        [rng.uniform(0, n - 1, size=17), np.array([0.0, 1.0, n - 1.0, n - 1.5])]
    )
    got = (lerp_dft_matrix(n, p) @ np.fft.fft(v)).real
    np.testing.assert_allclose(got, _real_lerp(v, p), atol=1e-10)


def test_lerp_dft_matrix_wraps_periodically_out_of_range():
    """Out-of-range taps wrap (the documented caveat) — pinned so the fused
    kernel's boundary handling stays honest."""
    n = 16
    v = np.arange(n, dtype=np.float64)
    p = np.array([n - 0.5])  # taps n-1 and n -> wraps to v[0]
    got = (lerp_dft_matrix(n, p) @ np.fft.fft(v)).real
    np.testing.assert_allclose(got, [0.5 * v[n - 1] + 0.5 * v[0]], atol=1e-10)


def _masked_real_lerp(v, positions):
    """Zero-padded 2-tap lerp — the real-space kernel's boundary semantics
    (kernels/deskew.py:250-258)."""
    n = len(v)
    z0 = np.floor(positions).astype(int)
    f = positions - z0
    v0 = np.where((z0 >= 0) & (z0 <= n - 1), v[np.clip(z0, 0, n - 1)], 0.0)
    v1 = np.where((z0 + 1 >= 0) & (z0 + 1 <= n - 1), v[np.clip(z0 + 1, 0, n - 1)], 0.0)
    return (1 - f) * v0 + f * v1


@pytest.mark.parametrize("n", [8, 23, 64])
def test_masked_lerp_dft_matrix_matches_zero_padded_lerp(n):
    """The production table drops invalid taps per entry, so it equals the
    zero-padded real-space lerp EVERYWHERE — boundary columns, out-of-range
    rows (zero), and the interior — with no exactness mask needed."""
    rng = np.random.default_rng(5)
    v = rng.standard_normal(n)
    p = np.concatenate(
        [
            rng.uniform(-3, n + 2, size=23),  # spans fully/partially out of range
            np.array([0.0, n - 1.0, -0.5, n - 0.5, n - 1.5, -1.0, float(n)]),
        ]
    )
    got = (masked_lerp_dft_matrix(n, p) @ np.fft.fft(v)).real
    np.testing.assert_allclose(got, _masked_real_lerp(v, p), atol=1e-10)


def test_masked_matrix_agrees_with_unmasked_on_interior():
    n = 16
    rng = np.random.default_rng(6)
    p = rng.uniform(0, n - 1.001, size=20)
    np.testing.assert_allclose(
        masked_lerp_dft_matrix(n, p), lerp_dft_matrix(n, p), atol=1e-12
    )


def test_factored_form_equals_dense_matrix():
    n = 24
    rng = np.random.default_rng(1)
    p = rng.uniform(-3, n + 3, size=40)  # any reals, in and out of range
    phase, g = lerp_dft_factors(n, p)
    np.testing.assert_allclose(phase * g, lerp_dft_matrix(n, p), atol=1e-12)


def test_fourier_deskew_matches_real_space_kernel():
    """End-to-end: spectrum-domain deskew == deskew_zyx on the exact mask."""
    import jax

    from biahub_tpu.kernels.deskew import deskew_zyx

    rng = np.random.default_rng(2)
    raw = rng.random((12, 10, 16), dtype=np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        want = np.asarray(
            deskew_zyx(
                raw,
                ls_angle_deg=LS_ANGLE,
                px_to_scan_ratio=PX_TO_SCAN,
                keep_overhang=False,
                average_window=1,
                skip_flip=True,
            )
        )
    got, exact = fourier_deskew_reference(
        raw, LS_ANGLE, PX_TO_SCAN, keep_overhang=False
    )
    assert got.shape == want.shape
    # (Z_out, X_out) mask broadcasts over the middle (Y_out) axis.
    mask = np.broadcast_to(exact[:, None, :], got.shape)
    assert mask.mean() > 0.5, "keep_overhang=False interior should be mostly exact"
    np.testing.assert_allclose(got[mask], want[mask], atol=1e-5)


@pytest.mark.parametrize("window", [2, 3])
def test_fourier_deskew_with_slice_averaging(window):
    """The store-time accumulation fold == deskew then average_n_slices."""
    import jax

    from biahub_tpu.kernels.deskew import deskew_zyx

    rng = np.random.default_rng(3)
    raw = rng.random((12, 10, 16), dtype=np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        want = np.asarray(
            deskew_zyx(
                raw,
                ls_angle_deg=LS_ANGLE,
                px_to_scan_ratio=PX_TO_SCAN,
                keep_overhang=False,
                average_window=window,
                skip_flip=True,
            )
        )
    got, exact = fourier_deskew_reference(
        raw, LS_ANGLE, PX_TO_SCAN, keep_overhang=False, average_window=window
    )
    assert got.shape == want.shape
    mask = np.broadcast_to(exact[:, None, :], got.shape)
    assert mask.mean() > 0.5
    np.testing.assert_allclose(got[mask], want[mask], atol=1e-5)


def test_fourier_deconvolve_deskew_matches_production_composition():
    """The full item-0 chain in one spectral pipeline == deconvolve_zyx then
    deskew_zyx (pass-commutation of the planned B'/C' restructure)."""
    import jax

    from biahub_tpu.kernels.deconvolve import (
        compute_transfer_function,
        deconvolve_zyx,
    )
    from biahub_tpu.kernels.deskew import deskew_zyx
    from biahub_tpu.kernels.fourier_resample import (
        fourier_deconvolve_deskew_reference,
    )

    rng = np.random.default_rng(4)
    shape = (12, 10, 16)
    raw = rng.random(shape, dtype=np.float32)
    psf = np.zeros((3, 3, 3), np.float32)
    psf[1, 1, 1] = 0.6
    psf[0, 1, 1] = psf[2, 1, 1] = 0.2
    tf = compute_transfer_function(psf, shape)
    reg = 1e-3
    with jax.default_device(jax.devices("cpu")[0]):
        decon = np.asarray(
            deconvolve_zyx(
                raw, tf[..., : shape[-1] // 2 + 1], regularization_strength=reg
            )
        )
        want = np.asarray(
            deskew_zyx(
                decon,
                ls_angle_deg=LS_ANGLE,
                px_to_scan_ratio=PX_TO_SCAN,
                keep_overhang=False,
                average_window=2,
                skip_flip=True,
            )
        )
    got, exact = fourier_deconvolve_deskew_reference(
        raw, tf, reg, LS_ANGLE, PX_TO_SCAN, keep_overhang=False, average_window=2
    )
    assert got.shape == want.shape
    mask = np.broadcast_to(exact[:, None, :], got.shape)
    scale = float(np.abs(want).max())
    np.testing.assert_allclose(got[mask], want[mask], atol=1e-5 * scale)


def test_exact_mask_matches_tap_validity():
    in_z, exact = deskew_sample_positions(
        (12, 10, 16), LS_ANGLE, PX_TO_SCAN, keep_overhang=False
    )
    i0 = np.floor(in_z)
    f = in_z - i0
    want = ((i0 >= 0) & (i0 + 1 <= 11)) | ((i0 >= 0) & (i0 <= 11) & (f == 0))
    np.testing.assert_array_equal(exact, want)

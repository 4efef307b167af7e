"""Parity tests for the fused matmul-DFT deconvolution kernel.

Runs the Pallas passes in interpret mode on the CPU mesh (conftest pins the
cpu backend) against the XLA rfftn reference path and raw numpy.fft.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from biahub_tpu.kernels.deconvolve import compute_transfer_function
from biahub_tpu.kernels.pallas_fft import (
    deconvolve_pallas_supported,
    deconvolve_zyx_pallas,
)


def _numpy_reference(vol, tf_half, reg):
    data_hat = np.fft.rfftn(vol)
    filt = tf_half / (tf_half**2 + reg)
    return np.fft.irfftn(data_hat * filt, s=vol.shape, axes=(0, 1, 2)).astype(
        np.float32
    )


@pytest.mark.parametrize(
    "shape",
    [
        (16, 24, 40),  # radix-2 z path (z % 16 == 0), no Nyquist peel
        (8, 7, 16),  # odd Y (one ky-row program per row), dense z
        (9, 12, 33),  # odd Z (zb=1) and odd X (no Nyquist bin)
        (4, 6, 9),  # tiny odd X
        (16, 8, 256),  # Nyquist peel (xh = 129) + radix-2 z combined
        (8, 6, 256),  # Nyquist peel with the dense z kernel
        (16, 16, 256),  # all three: peel + radix-2 z + radix-2 y
        (8, 32, 20),  # radix-2 y with the dense z kernel
        (16, 12, 40),  # yw % 8 != 0: the classic per-ky-row pass B path
    ],
)
def test_pallas_deconvolve_matches_numpy(shape, monkeypatch):
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")  # radix paths on tiny shapes
    rng = np.random.default_rng(7)
    vol = rng.standard_normal(shape, dtype=np.float32)
    psf = np.exp(
        -np.sum(np.square(np.mgrid[-1:2, -1:2, -1:2] / 1.2), axis=0)
    ).astype(np.float32)
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]
    reg = 1e-3

    assert deconvolve_pallas_supported(shape)
    got = np.asarray(deconvolve_zyx_pallas(jnp.asarray(vol), jnp.asarray(tf_half), reg))
    want = _numpy_reference(vol, tf_half, reg)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0)


def test_pallas_deconvolve_matches_xla_path(monkeypatch):
    """The dispatching deconvolve_zyx agrees with itself across backends.

    deconvolve_zyx is @jax.jit and its env-var dispatch runs at TRACE time, so
    each env configuration must re-trace: without jax.clear_caches() the second
    call would hit the first trace's jit cache and the test would compare the
    XLA path against itself (advisor finding, round 2).
    """
    import jax

    from biahub_tpu.kernels.deconvolve import deconvolve_zyx

    shape = (8, 16, 24)
    rng = np.random.default_rng(3)
    vol = rng.standard_normal(shape, dtype=np.float32)
    psf = rng.random((3, 3, 3), dtype=np.float32)
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

    monkeypatch.setenv("BIAHUB_TPU_NO_PALLAS", "1")
    jax.clear_caches()
    xla = np.asarray(deconvolve_zyx(jnp.asarray(vol), jnp.asarray(tf_half)))
    monkeypatch.delenv("BIAHUB_TPU_NO_PALLAS")
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")  # radix paths on tiny shapes
    jax.clear_caches()
    fused = np.asarray(deconvolve_zyx(jnp.asarray(vol), jnp.asarray(tf_half)))
    jax.clear_caches()  # do not leak FORCE_PALLAS traces into other tests
    scale = np.abs(xla).max()
    np.testing.assert_allclose(fused, xla, atol=2e-4 * scale, rtol=0)


@pytest.mark.parametrize("mode,tol", [("highest", 1e-5), ("high", 2e-4)])
def test_precision_modes(mode, tol, monkeypatch):
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")  # radix paths on tiny shapes
    monkeypatch.setenv("BIAHUB_TPU_FFT_PRECISION", mode)
    shape = (8, 16, 32)
    rng = np.random.default_rng(5)
    vol = rng.standard_normal(shape, dtype=np.float32)
    psf = rng.random((3, 3, 3), dtype=np.float32)
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]
    got = np.asarray(
        deconvolve_zyx_pallas(jnp.asarray(vol), jnp.asarray(tf_half), 1e-3)
    )
    want = _numpy_reference(vol, tf_half, 1e-3)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=tol * scale, rtol=0)


@pytest.mark.parametrize(
    "shape,xmax",
    [
        ((16, 16, 256), 2),  # radix-4 X + slab passes (8-slot ky/z stores)
        ((16, 16, 256), 1),  # radix-2 X pinned via BIAHUB_TPU_FFT_RADIX_X_MAX
        ((16, 16, 256), 0),  # dense X with the slab passes
        ((32, 24, 512), 2),  # radix-4 X, yw % 8 != 0 (per-row pass B)
    ],
)
def test_radix_x_levels_and_slab_passes(shape, xmax, monkeypatch):
    """The radix-2/4 X decompositions (permuted kx lane order) and the slab
    ky-major/z-major store paths all reproduce the dense reference."""
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_X_MAX", str(xmax))
    rng = np.random.default_rng(13)
    vol = rng.standard_normal(shape, dtype=np.float32)
    psf = rng.random((3, 3, 3), dtype=np.float32)
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]
    got = np.asarray(
        deconvolve_zyx_pallas(jnp.asarray(vol), jnp.asarray(tf_half), 1e-3)
    )
    want = _numpy_reference(vol, tf_half, 1e-3)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0)


@pytest.mark.parametrize("shape", [(16, 16, 256), (8, 12, 40)])
def test_prepared_filter_matches_inline(shape, monkeypatch):
    """prepare_fourier_filter + prepared= matches the inline filter path
    to division-rounding tolerance (the Tikhonov transform moves from the
    Mosaic VPU to XLA; everything else is unchanged), and a prepared
    filter built for another shape raises."""
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    from biahub_tpu.kernels.pallas_fft import prepare_fourier_filter

    rng = np.random.default_rng(21)
    vol = rng.standard_normal(shape, dtype=np.float32)
    psf = rng.random((3, 3, 3), dtype=np.float32)
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

    inline = np.asarray(
        deconvolve_zyx_pallas(jnp.asarray(vol), jnp.asarray(tf_half), 1e-3)
    )
    prep = prepare_fourier_filter(shape, (jnp.asarray(tf_half),), 1e-3)
    hoisted = np.asarray(
        deconvolve_zyx_pallas(jnp.asarray(vol), None, 1e-3, prepared=prep)
    )
    scale = np.abs(inline).max()
    np.testing.assert_allclose(hoisted, inline, atol=2e-5 * scale, rtol=0)

    with pytest.raises(ValueError, match="PreparedFilter"):
        deconvolve_zyx_pallas(
            jnp.asarray(vol[: shape[0] // 2]), None, 1e-3, prepared=prep
        )


def test_pallas_deconvolve_vmaps_over_channels(monkeypatch):
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")  # radix paths on tiny shapes
    import jax

    shape = (4, 8, 12)
    rng = np.random.default_rng(11)
    vols = rng.standard_normal((2,) + shape, dtype=np.float32)
    psf = rng.random((3, 3, 3), dtype=np.float32)
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

    got = np.asarray(
        jax.vmap(lambda v: deconvolve_zyx_pallas(v, jnp.asarray(tf_half), 1e-3))(
            jnp.asarray(vols)
        )
    )
    for c in range(2):
        want = _numpy_reference(vols[c], tf_half, 1e-3)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got[c], want, atol=2e-4 * scale, rtol=0)


def test_supported_gates_degenerate_and_oversized_shapes(monkeypatch):
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")  # radix paths on tiny shapes
    assert not deconvolve_pallas_supported((1, 16, 16))  # degenerate axis
    assert deconvolve_pallas_supported((256, 256, 1024))  # flagship FOV
    assert not deconvolve_pallas_supported((256, 256, 8192))  # DFT mats > VMEM
    monkeypatch.setenv("BIAHUB_TPU_NO_PALLAS", "1")
    assert not deconvolve_pallas_supported((16, 16, 16))


@pytest.mark.parametrize(
    "shape",
    [
        (8, 16, 24),  # radix-2 y, dense z, no peel
        (16, 8, 256),  # Nyquist peel + radix-2 z
        (16, 16, 256),  # peel + both radixes
    ],
)
def test_complex_hermitian_filter_matches_xla(shape, monkeypatch):
    """fourier_filter_zyx_pallas == real(ifftn(fftn(v) * F)) for Hermitian F
    (the phase-reconstruction inverse filter shape)."""
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")  # radix paths on tiny shapes
    from biahub_tpu.kernels.pallas_fft import fourier_filter_zyx_pallas
    rng = np.random.default_rng(21)
    vol = rng.standard_normal(shape, dtype=np.float32)
    # Hermitian complex filter: FFT of a real kernel, Tikhonov-inverted
    H = np.fft.fftn(rng.standard_normal(shape).astype(np.float32))
    filt = np.conj(H) / (np.abs(H) ** 2 + 1e-2)

    want = np.real(np.fft.ifftn(np.fft.fftn(vol) * filt)).astype(np.float32)
    xh = shape[-1] // 2 + 1
    got = np.asarray(
        fourier_filter_zyx_pallas(
            jnp.asarray(vol),
            jnp.asarray(np.real(filt[..., :xh]).astype(np.float32)),
            jnp.asarray(np.imag(filt[..., :xh]).astype(np.float32)),
        )
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0)


def test_tikhonov_inverse_hermitian_dispatch(monkeypatch):
    """tikhonov_inverse_3d(assume_hermitian=True) agrees with the general
    XLA path for an in-repo-style Hermitian transfer function."""
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")  # radix paths on tiny shapes
    from biahub_tpu.recon.optics import tikhonov_inverse_3d

    shape = (8, 16, 24)
    rng = np.random.default_rng(22)
    vol = rng.standard_normal(shape, dtype=np.float32)
    H = jnp.asarray(np.fft.fftn(rng.standard_normal(shape).astype(np.float32)))
    general = np.asarray(tikhonov_inverse_3d(jnp.asarray(vol), H, 1e-2))
    fused = np.asarray(
        tikhonov_inverse_3d(jnp.asarray(vol), H, 1e-2, assume_hermitian=True)
    )
    scale = np.abs(general).max()
    np.testing.assert_allclose(fused, general, atol=2e-4 * scale, rtol=0)


@pytest.mark.parametrize("shape", [(16, 11, 40), (16, 16, 256)])
def test_yzx_chain_output_matches_transposed_pad(shape, monkeypatch):
    """deconvolve_zyx_pallas(yzx_pad=p) == edge-pad(transpose(zyx result)) —
    the chain-mode pass C layout contract, radix and non-radix."""
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    from biahub_tpu.kernels.deconvolve import compute_transfer_function
    from biahub_tpu.kernels.pallas_fft import deconvolve_zyx_pallas

    rng = np.random.default_rng(23)
    vol = rng.standard_normal(shape, dtype=np.float32)
    psf = np.zeros((3, 3, 3), np.float32)
    psf[1, 1, 1] = 1.0
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

    zyx = np.asarray(deconvolve_zyx_pallas(vol, tf_half, 1e-3))
    for pad in (0, 2):
        yzx = np.asarray(deconvolve_zyx_pallas(vol, tf_half, 1e-3, yzx_pad=pad))
        ref = np.pad(
            np.transpose(zyx, (1, 0, 2)), ((pad, 0), (0, 0), (0, 0)),
            mode="edge",
        )
        np.testing.assert_allclose(yzx, ref, atol=1e-5)


def test_uint16_native_ingest_bit_exact(monkeypatch):
    """Camera-dtype (uint16) volumes ride pass A natively — the in-VMEM
    convert is exact, so the result must be bit-identical to pre-casting
    the volume to f32 on the host (reference reads camera dtype natively:
    biahub/deskew.py:554-582)."""
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    from biahub_tpu.kernels.deconvolve import deconvolve_zyx
    from biahub_tpu.kernels.pallas_fft import pass_a_native_dtype_ok

    shape = (16, 16, 128)
    assert pass_a_native_dtype_ok(shape, np.uint16)
    assert not pass_a_native_dtype_ok((16, 12, 128), np.uint16)  # y % 16
    assert not pass_a_native_dtype_ok(shape, np.float32)
    rng = np.random.default_rng(5)
    raw = rng.integers(0, 65535, size=shape).astype(np.uint16)
    tf = np.abs(rng.standard_normal((16, 16, 65))).astype(np.float32)
    got = np.asarray(deconvolve_zyx(jnp.asarray(raw), jnp.asarray(tf)))
    want = np.asarray(
        deconvolve_zyx(jnp.asarray(raw.astype(np.float32)), jnp.asarray(tf))
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    # Each engine geometry paired with one normalization mode (cycled, not
    # crossed: the normalization is elementwise and mode-independent of the
    # pass structure, and the full 5x3 product costs ~9 min of interpret
    # time on a 1-vCPU host).
    "shape,normalization",
    [
        ((16, 24, 40), None),  # radix-2 z, no peel
        ((8, 7, 16), "magnitude"),  # odd Y, dense z
        ((9, 12, 33), "classic"),  # odd Z and odd X
        ((16, 16, 256), "magnitude"),  # peel + radix-2 z + radix-2 y (+ radix X)
        ((16, 12, 40), None),  # yw % 8 != 0: per-ky-row pass B
    ],
)
def test_pcc_corr_pallas_matches_xla(shape, normalization, monkeypatch):
    """The fused PCC engine (two-stream pass B cross-power) matches the XLA
    rfftn cross-correlation to the engine's bf16-split envelope."""
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    from biahub_tpu.kernels.fft import _pcc_core
    from biahub_tpu.kernels.pallas_fft import (
        pcc_corr_pallas,
        pcc_pallas_supported,
    )

    rng = np.random.default_rng(11)
    a = rng.random(shape).astype(np.float32)
    b = rng.random(shape).astype(np.float32)
    assert pcc_pallas_supported(shape)
    got = np.asarray(pcc_corr_pallas(jnp.asarray(a), jnp.asarray(b), normalization))
    want = np.asarray(_pcc_core(jnp.asarray(a), jnp.asarray(b), normalization))
    scale = max(np.abs(want).max(), 1e-12)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0)


def test_pcc_shift_recovery_through_pallas_route(monkeypatch):
    """Integer shifts recovered exactly through the routed (vmapped) device
    path — the estimate-stabilization production call (reference:
    biahub/estimate_stabilization.py:198-255)."""
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    import scipy.ndimage as ndi

    from biahub_tpu.kernels.fft import pcc_shifts_pairwise

    rng = np.random.default_rng(3)
    base = ndi.gaussian_filter(rng.random((16, 32, 64)).astype(np.float32), 2)
    shifts = [(2, -3, 5), (-1, 4, -7)]
    movs = np.stack([np.roll(base, s, axis=(0, 1, 2)) for s in shifts])
    refs = np.stack([base, base])
    got = np.asarray(
        pcc_shifts_pairwise(jnp.asarray(refs), jnp.asarray(movs), "magnitude")
    )
    np.testing.assert_array_equal(got, -np.asarray(shifts, np.float32))

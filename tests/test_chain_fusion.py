"""Fused chain composition: deskew -> warp with the Y-flip folded into the
warp's affine must match the naive deskew-then-warp composition."""

import numpy as np
import pytest


def _naive(vol, angle, ratio, matrix, avg):
    from biahub_tpu.kernels.affine import affine_warp_auto
    from biahub_tpu.kernels.deskew import deskew_zyx

    deskewed = deskew_zyx(
        vol, ls_angle_deg=angle, px_to_scan_ratio=ratio,
        keep_overhang=False, average_window=avg,
    )
    return np.asarray(
        affine_warp_auto(deskewed, matrix, tuple(deskewed.shape))
    )


@pytest.mark.parametrize("force_pallas", [False, True])
@pytest.mark.parametrize("avg", [1, 2])
def test_deskew_then_warp_matches_naive(force_pallas, avg, monkeypatch):
    import jax

    if force_pallas:
        monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    else:
        monkeypatch.setenv("BIAHUB_TPU_NO_PALLAS", "1")
    jax.clear_caches()

    from biahub_tpu.kernels.chain import deskew_then_warp

    rng = np.random.default_rng(17)
    vol = rng.random((12, 16, 40), dtype=np.float32)
    angle, ratio = 30.0, 0.4

    theta = np.deg2rad(3.0)
    m = np.eye(4)
    m[1:3, 1:3] = 1.02 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    m[:3, 3] = [0.4, -0.8, 1.1]

    fusedv = np.asarray(
        deskew_then_warp(vol, angle, ratio, m, average_window=avg)
    )
    naive = np.asarray(_naive(vol, angle, ratio, m, avg))
    assert fusedv.shape == naive.shape
    # The composed y coefficients are the negated originals, which reorders
    # float rounding inside the bf16-split dots — tolerance, not bit-parity.
    np.testing.assert_allclose(fusedv, naive, atol=5e-5)
    jax.clear_caches()


def test_flip_y_matrix_is_involution():
    from biahub_tpu.kernels.chain import flip_y_matrix

    f = flip_y_matrix(33)
    np.testing.assert_array_equal(f @ f, np.eye(4))


@pytest.mark.parametrize("avg", [1, 3])
def test_deconvolve_deskew_warp_matches_naive(avg, monkeypatch):
    """The fully-fused chain (yzx pass C + pre-transposed deskew + folded
    flip) matches deconvolve -> deskew -> warp through the standard
    contracts."""
    import jax

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    monkeypatch.setenv("BIAHUB_TPU_SPECTRAL_DESKEW", "1")  # opt-in engine
    jax.clear_caches()

    from biahub_tpu.kernels.affine import affine_warp_auto
    from biahub_tpu.kernels.chain import deconvolve_deskew_warp
    from biahub_tpu.kernels.deconvolve import (
        compute_transfer_function,
        deconvolve_zyx,
    )
    from biahub_tpu.kernels.deskew import deskew_zyx

    shape = (16, 14, 40)  # Z % 8 == 0 -> the yzx fused path engages
    rng = np.random.default_rng(29)
    vol = rng.random(shape, dtype=np.float32)
    psf = np.zeros((3, 3, 3), np.float32)
    psf[1, 1, 1] = 1.0
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]
    angle, ratio = 30.0, 0.4

    theta = np.deg2rad(2.0)
    m = np.eye(4)
    m[1:3, 1:3] = 1.01 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    m[:3, 3] = [0.3, -0.6, 0.9]

    fusedv = np.asarray(
        deconvolve_deskew_warp(
            vol, tf_half, 1e-3, angle, ratio, m, average_window=avg
        )
    )
    decon = deconvolve_zyx(vol, tf_half, regularization_strength=1e-3)
    deskewed = deskew_zyx(
        decon, ls_angle_deg=angle, px_to_scan_ratio=ratio,
        keep_overhang=False, average_window=avg,
    )
    naive = np.asarray(affine_warp_auto(deskewed, m, tuple(deskewed.shape)))
    assert fusedv.shape == naive.shape
    np.testing.assert_allclose(fusedv, naive, atol=1e-4)
    jax.clear_caches()


@pytest.mark.parametrize("avg", [1, 3])
def test_deconvolve_deskew_warp_batched_matches_vmap(avg, monkeypatch):
    """The batched chain entry (manual-DMA deskew stage on the handoff
    route) is bit-identical to vmapping the per-volume chain — the
    contract bench.py and the BatchRunner rely on."""
    import jax

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    jax.clear_caches()

    from biahub_tpu.kernels.chain import (
        deconvolve_deskew_warp,
        deconvolve_deskew_warp_batched,
    )
    from biahub_tpu.kernels.deconvolve import compute_transfer_function
    from biahub_tpu.kernels.pallas_deskew import manual_dma_deskew_supported

    shape = (16, 14, 40)  # Z % 8 == 0 -> the yzx fused path engages
    assert manual_dma_deskew_supported(shape, avg, "xzy")
    rng = np.random.default_rng(41)
    vols = rng.random((3,) + shape, dtype=np.float32)
    psf = np.zeros((3, 3, 3), np.float32)
    psf[1, 1, 1] = 1.0
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]
    angle, ratio = 30.0, 0.4

    theta = np.deg2rad(2.0)
    m = np.eye(4)
    m[1:3, 1:3] = 1.01 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    m[:3, 3] = [0.3, -0.6, 0.9]

    want = np.asarray(
        jax.vmap(
            lambda v: deconvolve_deskew_warp(
                v, tf_half, 1e-3, angle, ratio, m, average_window=avg
            )
        )(vols)
    )
    got = np.asarray(
        deconvolve_deskew_warp_batched(
            vols, tf_half, 1e-3, angle, ratio, m, average_window=avg
        )
    )
    # Interpret-mode tolerance: the manual-DMA warp stage's scratch reads
    # reassociate the bf16-split dots at the ~1e-5 level on CPU (see
    # tests/test_pallas_resample.py::test_batched_manual_dma_t_kernels...);
    # the real-chip chain A/B measured probe-equal outputs.
    np.testing.assert_allclose(got, want, atol=5e-5)
    jax.clear_caches()


@pytest.mark.parametrize("skip_flip", [True, False])
@pytest.mark.parametrize("avg", [1, 3])
def test_deconvolve_then_deskew_batched_matches_vmap(avg, skip_flip,
                                                     monkeypatch):
    """The batched headline-step entry (manual-DMA zyx deskew stage on the
    handoff route) is bit-identical to vmapping the per-volume helper —
    the contract bench.py's headline step, the deconvolve+deskew fuse
    config, and the BatchRunner rely on."""
    import jax

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    jax.clear_caches()

    from biahub_tpu.kernels.chain import (
        deconvolve_then_deskew,
        deconvolve_then_deskew_batched,
    )
    from biahub_tpu.kernels.deconvolve import compute_transfer_function
    from biahub_tpu.kernels.pallas_deskew import manual_dma_deskew_supported

    shape = (16, 14, 40)  # Z % 8 == 0 -> the yzx fused path engages
    assert manual_dma_deskew_supported(shape, avg, "zyx")
    rng = np.random.default_rng(43)
    vols = rng.random((3,) + shape, dtype=np.float32)
    psf = np.zeros((3, 3, 3), np.float32)
    psf[1, 1, 1] = 1.0
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

    want = np.asarray(
        jax.vmap(
            lambda v: deconvolve_then_deskew(
                v, tf_half, 1e-3, 30.0, 0.4, average_window=avg,
                skip_flip=skip_flip,
            )
        )(vols)
    )
    got = np.asarray(
        deconvolve_then_deskew_batched(
            vols, tf_half, 1e-3, 30.0, 0.4, average_window=avg,
            skip_flip=skip_flip,
        )
    )
    np.testing.assert_array_equal(got, want)
    jax.clear_caches()


@pytest.mark.parametrize("avg", [1, 3])
def test_deskew_xzy_layout_matches_transposed_zyx(avg, monkeypatch):
    """deskew_zyx_pallas(out_layout='xzy') == transpose((2,0,1)) of the
    zyx result, including ragged group counts (groups % 8 != 0)."""
    import jax

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    jax.clear_caches()
    from biahub_tpu.kernels.pallas_deskew import deskew_zyx_pallas

    rng = np.random.default_rng(41)
    vol = rng.random((12, 14, 40), dtype=np.float32)
    zyx = np.asarray(
        deskew_zyx_pallas(vol, 30.0, 0.4, False, average_window=avg,
                          skip_flip=True)
    )
    xzy = np.asarray(
        deskew_zyx_pallas(vol, 30.0, 0.4, False, average_window=avg,
                          skip_flip=True, out_layout="xzy")
    )
    assert xzy.shape == (zyx.shape[2], zyx.shape[0], zyx.shape[1])
    np.testing.assert_allclose(
        xzy, np.transpose(zyx, (2, 0, 1)), atol=2e-5
    )
    jax.clear_caches()


def test_deconvolve_then_deskew_matches_naive(monkeypatch):
    """The pass-C layout handoff produces the standard flipped zyx deskew
    output exactly."""
    import jax

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    jax.clear_caches()

    from biahub_tpu.kernels.chain import deconvolve_then_deskew
    from biahub_tpu.kernels.deconvolve import (
        compute_transfer_function,
        deconvolve_zyx,
    )
    from biahub_tpu.kernels.deskew import deskew_zyx

    shape = (16, 14, 40)
    rng = np.random.default_rng(31)
    vol = rng.random(shape, dtype=np.float32)
    psf = np.zeros((3, 3, 3), np.float32)
    psf[1, 1, 1] = 1.0
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

    fusedv = np.asarray(
        deconvolve_then_deskew(vol, tf_half, 1e-3, 30.0, 0.4,
                               average_window=3)
    )
    decon = deconvolve_zyx(vol, tf_half, regularization_strength=1e-3)
    naive = np.asarray(
        deskew_zyx(decon, ls_angle_deg=30.0, px_to_scan_ratio=0.4,
                   keep_overhang=False, average_window=3)
    )
    np.testing.assert_allclose(fusedv, naive, atol=1e-5)

    # skip_flip (the production step configuration: the flip is a free
    # host view at the zarr write) is exactly the Y-reversed output.
    unflipped = np.asarray(
        deconvolve_then_deskew(vol, tf_half, 1e-3, 30.0, 0.4,
                               average_window=3, skip_flip=True)
    )
    np.testing.assert_array_equal(unflipped[:, ::-1], fusedv)
    jax.clear_caches()


@pytest.mark.parametrize("avg,keep_overhang", [(3, False), (2, True)])
def test_deconvolve_deskew_warp_spectral_route(avg, keep_overhang, monkeypatch):
    """On a spectral-supported geometry with an in-plane warp, the chain
    routes through the xzy spectral engine (the deconvolved AND deskewed
    volumes never hit HBM in the standard layout) and matches
    deconvolve -> deskew -> warp through the standard contracts, including
    the padded group slices masked by the warp's logical domain."""
    import jax

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    monkeypatch.setenv("BIAHUB_TPU_SPECTRAL_DESKEW", "1")  # opt-in engine
    jax.clear_caches()

    from biahub_tpu.kernels.affine import affine_warp_auto
    from biahub_tpu.kernels.chain import deconvolve_deskew_warp
    from biahub_tpu.kernels.deconvolve import (
        compute_transfer_function,
        deconvolve_zyx,
    )
    from biahub_tpu.kernels.deskew import deskew_zyx
    from biahub_tpu.kernels.pallas_spectral import spectral_deskew_supported

    shape, angle, ratio = (16, 16, 64), 30.0, 0.4
    assert spectral_deskew_supported(shape, angle, ratio, keep_overhang,
                                     avg, out_layout="xzy")
    rng = np.random.default_rng(37)
    vol = rng.random(shape, dtype=np.float32)
    psf = np.zeros((3, 3, 3), np.float32)
    psf[1, 1, 1] = 1.0
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]
    theta = np.deg2rad(2.0)
    m = np.eye(4)
    m[1:3, 1:3] = 1.01 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    m[:3, 3] = [0.3, -0.6, 0.9]

    fusedv = np.asarray(
        deconvolve_deskew_warp(
            vol, tf_half, 1e-3, angle, ratio, m, average_window=avg,
            keep_overhang=keep_overhang,
        )
    )
    decon = deconvolve_zyx(vol, tf_half, regularization_strength=1e-3)
    deskewed = deskew_zyx(
        decon, ls_angle_deg=angle, px_to_scan_ratio=ratio,
        keep_overhang=keep_overhang, average_window=avg,
    )
    naive = np.asarray(affine_warp_auto(deskewed, m, tuple(deskewed.shape)))
    assert fusedv.shape == naive.shape
    np.testing.assert_allclose(
        fusedv, naive, atol=2e-4 * np.abs(naive).max()
    )
    jax.clear_caches()


def test_deconvolve_then_deskew_spectral_route(monkeypatch):
    """With the opt-in BIAHUB_TPU_SPECTRAL_DESKEW=1, deconvolve_then_deskew
    routes through the fused spectral engine and still matches the
    composition (flipped and skip_flip frames); without the opt-in it falls
    back to the handoff path with the same answer."""
    import jax

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    monkeypatch.setenv("BIAHUB_TPU_SPECTRAL_DESKEW", "1")
    jax.clear_caches()

    from biahub_tpu.kernels.chain import deconvolve_then_deskew
    from biahub_tpu.kernels.deconvolve import (
        compute_transfer_function,
        deconvolve_zyx,
    )
    from biahub_tpu.kernels.deskew import deskew_zyx
    from biahub_tpu.kernels.pallas_spectral import spectral_deskew_supported

    shape = (16, 16, 64)
    assert spectral_deskew_supported(shape, 30.0, 0.4, False, 3)
    rng = np.random.default_rng(33)
    vol = rng.random(shape, dtype=np.float32)
    psf = np.zeros((3, 3, 3), np.float32)
    psf[1, 1, 1] = 1.0
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

    fusedv = np.asarray(
        deconvolve_then_deskew(vol, tf_half, 1e-3, 30.0, 0.4,
                               average_window=3)
    )
    decon = deconvolve_zyx(vol, tf_half, regularization_strength=1e-3)
    naive = np.asarray(
        deskew_zyx(decon, ls_angle_deg=30.0, px_to_scan_ratio=0.4,
                   keep_overhang=False, average_window=3)
    )
    np.testing.assert_allclose(fusedv, naive, atol=2e-4 * np.abs(naive).max())

    unflipped = np.asarray(
        deconvolve_then_deskew(vol, tf_half, 1e-3, 30.0, 0.4,
                               average_window=3, skip_flip=True)
    )
    np.testing.assert_array_equal(unflipped[:, ::-1], fusedv)

    monkeypatch.setenv("BIAHUB_TPU_SPECTRAL_DESKEW", "0")
    jax.clear_caches()
    handoff = np.asarray(
        deconvolve_then_deskew(vol, tf_half, 1e-3, 30.0, 0.4,
                               average_window=3)
    )
    np.testing.assert_allclose(handoff, naive, atol=2e-4 * np.abs(naive).max())
    jax.clear_caches()

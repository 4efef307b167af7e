"""Parity tests for the fused spectral deconvolve+deskew engine.

Runs the B'1/B'2/C' Pallas passes in interpret mode on the CPU mesh against
the production composition ``deconvolve (numpy rfftn reference)`` followed by
``deskew_zyx(..., skip_flip=True)`` — the exact contract
kernels/pallas_spectral.py must honor, including slice averaging with
edge-padded tail groups and zero-padded overhang boundaries.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from biahub_tpu.kernels.deconvolve import compute_transfer_function
from biahub_tpu.kernels.pallas_spectral import (
    deconvolve_deskew_zyx_spectral,
    prepare_spectral_deskew,
    spectral_deskew_supported,
)

LS_ANGLE, PX_TO_SCAN = 36.0, 0.387


@pytest.fixture(autouse=True)
def _opt_in_spectral(monkeypatch):
    """The engine is opt-in (slower than the pass-C handoff on v5e, see
    spectral_deskew_supported); tests pin it on. Tests that assert the
    fallback override this with their own setenv."""
    monkeypatch.setenv("BIAHUB_TPU_SPECTRAL_DESKEW", "1")


def _composed_reference(vol, tf_half, reg, keep_overhang, window):
    """numpy deconvolve + the XLA deskew kernel (CPU backend -> XLA path)."""
    from biahub_tpu.kernels.deskew import deskew_zyx

    data_hat = np.fft.rfftn(vol)
    filt = tf_half / (tf_half**2 + reg)
    decon = np.fft.irfftn(data_hat * filt, s=vol.shape, axes=(0, 1, 2)).astype(
        np.float32
    )
    return np.asarray(
        deskew_zyx(
            jnp.asarray(decon),
            ls_angle_deg=LS_ANGLE,
            px_to_scan_ratio=PX_TO_SCAN,
            keep_overhang=keep_overhang,
            average_window=window,
            skip_flip=True,
        )
    )


def _tf_half(shape, rng):
    psf = np.exp(
        -np.sum(np.square(np.mgrid[-1:2, -1:2, -1:2] / 1.2), axis=0)
    ).astype(np.float32)
    return compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]


@pytest.mark.parametrize(
    "shape,window,keep_overhang",
    [
        ((8, 8, 32), 1, False),     # dense z/y/x, no peel
        ((8, 8, 32), 3, False),     # averaging with an edge-padded tail group
        ((8, 8, 32), 2, True),      # overhang kept: zero-padded boundaries
        ((16, 16, 64), 1, False),   # radix-2 z + y, slab pass A
        ((16, 16, 64), 3, False),   # radix + averaging tail
        ((16, 16, 256), 1, False),  # Nyquist peel + radix-4 X + radix z/y
        ((16, 16, 256), 2, False),  # peel + averaging
        ((8, 16, 256), 1, False),   # peel + radix y with dense z
    ],
)
def test_spectral_matches_composition(shape, window, keep_overhang, monkeypatch):
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    rng = np.random.default_rng(11)
    vol = rng.standard_normal(shape, dtype=np.float32)
    tf_half = _tf_half(shape, rng)
    reg = 1e-3

    assert spectral_deskew_supported(
        shape, LS_ANGLE, PX_TO_SCAN, keep_overhang, window
    )
    got = np.asarray(
        deconvolve_deskew_zyx_spectral(
            jnp.asarray(vol), jnp.asarray(tf_half), reg,
            ls_angle_deg=LS_ANGLE, px_to_scan_ratio=PX_TO_SCAN,
            keep_overhang=keep_overhang, average_window=window,
        )
    )
    want = _composed_reference(vol, tf_half, reg, keep_overhang, window)
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0)


def test_spectral_highest_precision_tightens(monkeypatch):
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    monkeypatch.setenv("BIAHUB_TPU_FFT_PRECISION", "highest")
    shape = (16, 16, 64)
    rng = np.random.default_rng(12)
    vol = rng.standard_normal(shape, dtype=np.float32)
    tf_half = _tf_half(shape, rng)
    got = np.asarray(
        deconvolve_deskew_zyx_spectral(
            jnp.asarray(vol), jnp.asarray(tf_half), 1e-3,
            ls_angle_deg=LS_ANGLE, px_to_scan_ratio=PX_TO_SCAN,
            keep_overhang=False, average_window=3,
        )
    )
    want = _composed_reference(vol, tf_half, 1e-3, False, 3)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=0)


def test_prepared_filter_and_table_paths_agree(monkeypatch):
    """Hoisted per-acquisition artifacts (PreparedFilter + the lerp table)
    reproduce the build-on-the-fly path. Not bit-identical: the Tikhonov
    transform runs eagerly at prepare time vs in-kernel on the fly, and the
    two f32 contractions round differently (~5e-5 abs observed)."""
    from biahub_tpu.kernels.pallas_fft import prepare_fourier_filter

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    shape = (16, 16, 64)
    rng = np.random.default_rng(13)
    vol = rng.standard_normal(shape, dtype=np.float32)
    tf_half = _tf_half(shape, rng)
    kwargs = dict(
        ls_angle_deg=LS_ANGLE, px_to_scan_ratio=PX_TO_SCAN,
        keep_overhang=False, average_window=2,
    )
    base = np.asarray(
        deconvolve_deskew_zyx_spectral(
            jnp.asarray(vol), jnp.asarray(tf_half), 1e-3, **kwargs
        )
    )
    prep = prepare_fourier_filter(shape, (jnp.asarray(tf_half),), 1e-3)
    table = prepare_spectral_deskew(shape, LS_ANGLE, PX_TO_SCAN, False, 2)
    hoisted = np.asarray(
        deconvolve_deskew_zyx_spectral(
            jnp.asarray(vol), None, 1e-3, prepared=prep, deskew_table=table,
            **kwargs
        )
    )
    scale = np.abs(base).max()
    np.testing.assert_allclose(hoisted, base, atol=1e-4 * scale, rtol=0)


@pytest.mark.parametrize(
    "shape,window,keep_overhang",
    [
        ((8, 8, 32), 3, False),     # ragged groups (3 -> padded to 8)
        ((8, 8, 32), 2, True),      # overhang + padded groups
        ((16, 16, 256), 2, False),  # Nyquist peel + radix-4 X, full block
    ],
)
def test_xzy_layout_matches_zyx(shape, window, keep_overhang, monkeypatch):
    """out_layout='xzy' (the chain/warp handoff) is the transposed zyx
    result with the group axis zero-padded to the store-block width."""
    from biahub_tpu.kernels.pallas_spectral import _deskew_geom, _groups_pad

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    rng = np.random.default_rng(17)
    vol = rng.standard_normal(shape, dtype=np.float32)
    tf_half = _tf_half(shape, rng)
    assert spectral_deskew_supported(
        shape, LS_ANGLE, PX_TO_SCAN, keep_overhang, window, out_layout="xzy"
    )
    kwargs = dict(
        ls_angle_deg=LS_ANGLE, px_to_scan_ratio=PX_TO_SCAN,
        keep_overhang=keep_overhang, average_window=window,
    )
    zyx = np.asarray(
        deconvolve_deskew_zyx_spectral(
            jnp.asarray(vol), jnp.asarray(tf_half), 1e-3, **kwargs
        )
    )
    xzy = np.asarray(
        deconvolve_deskew_zyx_spectral(
            jnp.asarray(vol), jnp.asarray(tf_half), 1e-3,
            out_layout="xzy", **kwargs,
        )
    )
    groups = _deskew_geom(shape, LS_ANGLE, PX_TO_SCAN, keep_overhang,
                          window)[2]
    gp = _groups_pad(groups)
    assert xzy.shape == (zyx.shape[2], gp, zyx.shape[1])
    scale = np.abs(zyx).max()
    np.testing.assert_allclose(
        xzy[:, :groups, :], np.transpose(zyx, (2, 0, 1)),
        atol=1e-5 * scale, rtol=0,
    )
    # Pad groups' table rows are zero -> the junk z' slices are defined 0s.
    if gp > groups:
        assert np.abs(xzy[:, groups:, :]).max() == 0.0


def test_gate_rejects_unsupported_geometry(monkeypatch):
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    # z not divisible by 8 -> pass B'2 blocks cannot form
    assert not spectral_deskew_supported((9, 8, 32), LS_ANGLE, PX_TO_SCAN, False, 1)
    # opt-in gate: anything but "1" (including unset/""/"0") disables
    monkeypatch.setenv("BIAHUB_TPU_SPECTRAL_DESKEW", "0")
    assert not spectral_deskew_supported((8, 8, 32), LS_ANGLE, PX_TO_SCAN, False, 1)
    monkeypatch.delenv("BIAHUB_TPU_SPECTRAL_DESKEW")
    assert not spectral_deskew_supported((8, 8, 32), LS_ANGLE, PX_TO_SCAN, False, 1)


def test_table_shape_mismatch_raises(monkeypatch):
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    shape = (8, 8, 32)
    rng = np.random.default_rng(14)
    vol = rng.standard_normal(shape, dtype=np.float32)
    tf_half = _tf_half(shape, rng)
    # avg=3 -> 9 table rows vs the 8 the avg=1 call expects (avg=2 would
    # coincidentally share the padded row count at this tiny geometry).
    bad = prepare_spectral_deskew(shape, LS_ANGLE, PX_TO_SCAN, False, 3)
    with pytest.raises(ValueError, match="PreparedSpectralDeskew"):
        deconvolve_deskew_zyx_spectral(
            jnp.asarray(vol), jnp.asarray(tf_half), 1e-3,
            ls_angle_deg=LS_ANGLE, px_to_scan_ratio=PX_TO_SCAN,
            keep_overhang=False, average_window=1, deskew_table=bad,
        )

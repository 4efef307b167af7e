"""Golden-fixture regression tests for the re-derived reconstruction math.

tests/golden/recon_golden.npz is produced by scripts/make_recon_golden.py
via INDEPENDENT direct-summation derivations of the published optics (no
FFT identities shared with recon/optics.py), so a sign/normalization
regression in the production re-derivation fails here instead of cancelling
consistently across compute-tf and apply-inv-tf (the reference delegates
this math to waveorder: biahub/compute_transfer_function.py:16-34).
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "recon_golden.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def _params(golden):
    zyx = tuple(int(s) for s in golden["zyx_shape"])
    yx_px, z_px, wave, na_det, na_ill, n_media = golden["params"]
    return zyx, float(yx_px), float(z_px), float(wave), float(na_det), float(
        na_ill
    ), float(n_media)


def test_fluorescence_otf_matches_direct_summation(golden):
    from biahub_tpu.recon.optics import fluorescence_otf_3d

    zyx, yx_px, z_px, wave, na_det, _, n_media = _params(golden)
    got = np.asarray(
        fluorescence_otf_3d(zyx, yx_px, z_px, wave, na_det, n_media)
    )
    want = golden["fluorescence_otf"]
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_phase_wotf_matches_direct_summation(golden):
    from biahub_tpu.recon.optics import phase_wotf_3d

    zyx, yx_px, z_px, wave, na_det, na_ill, n_media = _params(golden)
    got = np.asarray(
        phase_wotf_3d(zyx, yx_px, z_px, wave, na_ill, na_det, n_media)
    )
    want = golden["phase_wotf"]
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=5e-6 * scale)


def test_birefringence_inversion_recovers_forward_model(golden):
    """Intensities synthesized through the published recOrder Mueller
    convention invert back to the physical sample parameters."""
    from biahub_tpu.recon.birefringence import (
        birefringence_from_stokes,
        stokes_from_intensities,
    )

    swing = float(golden["biref_swing"])
    stokes = stokes_from_intensities(
        golden["biref_intensities"].astype(np.float32), swing
    )
    wave = 0.532
    out = np.asarray(birefringence_from_stokes(stokes, wave))
    ret_rad = out[0] * 2 * np.pi / wave
    np.testing.assert_allclose(
        ret_rad, golden["biref_retardance_rad"], atol=1e-3
    )
    # Orientation is defined modulo pi.
    dtheta = np.abs(out[1] - golden["biref_orientation"]) % np.pi
    dtheta = np.minimum(dtheta, np.pi - dtheta)
    assert dtheta.max() < 1e-3
    np.testing.assert_allclose(
        out[2], golden["biref_transmittance"], atol=1e-3
    )
    np.testing.assert_allclose(out[3], golden["biref_dop"], atol=1e-3)

"""Tests of ``biahub deconvolve``: kernel math parity and CLI end-to-end."""

import numpy as np
import pytest
from click.testing import CliRunner

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr
from biahub_tpu.kernels.deconvolve import compute_transfer_function, deconvolve_zyx


def _gaussian_psf(shape=(9, 9, 9), sigma=1.5):
    zz, yy, xx = np.meshgrid(
        *[np.arange(s) - (s - 1) / 2 for s in shape], indexing="ij"
    )
    psf = np.exp(-(zz**2 + yy**2 + xx**2) / (2 * sigma**2)).astype(np.float32)
    return psf / psf.sum()


def test_transfer_function_matches_full_spectrum_reference():
    psf = _gaussian_psf()
    tf = compute_transfer_function(psf, (16, 20, 24))
    assert tf.shape == (16, 20, 24)
    assert tf.max() == pytest.approx(1.0)
    # Reference formula: |fftn(padded psf)| / max, computed independently
    pad = [((o - s) // 2, (o - s) // 2 + (o - s) % 2) for s, o in zip(psf.shape, (16, 20, 24))]
    padded = np.pad(psf, pad)
    expected = np.abs(np.fft.fftn(padded))
    expected /= expected.max()
    np.testing.assert_allclose(tf, expected, rtol=1e-5)


def test_deconvolve_zyx_matches_full_fft_reference():
    """rfft half-spectrum kernel equals the full-complex-FFT Tikhonov filter."""
    rng = np.random.default_rng(0)
    data = rng.random((16, 20, 24)).astype(np.float32)
    psf = _gaussian_psf()
    tf = compute_transfer_function(psf, data.shape)
    reg = 1e-3
    expected = np.real(
        np.fft.ifftn(np.fft.fftn(data) * tf / (tf**2 + reg))
    )
    out = np.asarray(deconvolve_zyx(data, tf[..., : data.shape[-1] // 2 + 1], reg))
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_deconvolve_restores_blurred_volume():
    """Deconvolving a blurred volume should move it back toward the original."""
    rng = np.random.default_rng(1)
    truth = np.zeros((16, 24, 24), np.float32)
    pts = rng.integers(4, 12, size=(10, 3))
    truth[pts[:, 0], pts[:, 1], pts[:, 2]] = 100.0
    psf = _gaussian_psf(sigma=1.0)
    tf = compute_transfer_function(psf, truth.shape)
    # Blur via the same OTF model (|FFT| magnitude) used for deconvolution
    blurred = np.real(np.fft.ifftn(np.fft.fftn(truth) * tf)).astype(np.float32)
    decon = np.asarray(deconvolve_zyx(blurred, tf[..., :13], 1e-4))

    def err(a):
        return np.linalg.norm(a - truth) / np.linalg.norm(truth)

    assert err(decon) < err(blurred) * 0.8


@pytest.fixture
def psf_store(tmp_path):
    psf_path = tmp_path / "psf.zarr"
    plate = open_ome_zarr(psf_path, layout="hcs", mode="w", channel_names=["PSF"])
    pos = plate.create_position("0", "0", "0")
    pos.create_image(
        "0",
        _gaussian_psf((3, 5, 5), sigma=1.0)[None, None],
        transform=[TransformationMeta(type="scale", scale=(1, 1, 1.0, 0.116, 0.116))],
    )
    return psf_path


def test_deconvolve_cli(example_plate, psf_store, example_deconvolve_settings, tmp_path):
    plate_path, _ = example_plate
    config_path, _ = example_deconvolve_settings
    output_path = tmp_path / "decon.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "deconvolve",
            "-i", str(plate_path / "A" / "1" / "0"), str(plate_path / "B" / "1" / "0"),
            "-p", str(psf_store),
            "-c", config_path,
            "-o", str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    assert output_path.exists()
    assert (tmp_path / "transfer_function.zarr").exists()
    ds = open_ome_zarr(output_path)
    pos = ds["A/1/0"]
    in_pos = open_ome_zarr(plate_path)["A/1/0"]
    assert pos.data.shape == in_pos.data.shape
    assert not np.allclose(pos.data[0, 0], 0)

"""Tests of estimate-psf and characterize-psf."""

import numpy as np
import yaml
from click.testing import CliRunner
from scipy.ndimage import gaussian_filter

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr
from biahub_tpu.psf.analysis import extract_beads, fit_gaussian_3d


def _beads_plate(tmp_path, shape=(32, 96, 96), n_beads=6, sigma=(1.2, 1.8, 1.8)):
    rng = np.random.default_rng(0)
    vol = np.zeros(shape, np.float32)
    pts = np.stack(
        [rng.integers(10, s - 10, n_beads) for s in shape], axis=1
    )
    for p in pts:
        vol[tuple(p)] = 5000.0
    vol = gaussian_filter(vol, sigma) * 30
    vol += rng.normal(10, 1, shape).astype(np.float32)
    plate_path = tmp_path / "beads.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    pos = plate.create_position("0", "0", "0")
    pos.create_image(
        "0",
        vol[None, None],
        transform=[TransformationMeta(type="scale", scale=(1, 1, 0.2, 0.1, 0.1))],
    )
    return plate_path, vol, pts, sigma


def test_fit_gaussian_3d_recovers_sigma():
    sigma = (1.5, 2.0, 2.5)
    scale = (0.2, 0.1, 0.1)
    patch = np.zeros((21, 25, 25), np.float32)
    patch[10, 12, 12] = 1000.0
    patch = gaussian_filter(patch, sigma) * 100 + 5.0
    out = fit_gaussian_3d(patch, scale)
    assert out is not None
    fwhm = 2 * np.sqrt(2 * np.log(2))
    np.testing.assert_allclose(out["zyx_z_fwhm"], fwhm * sigma[0] * scale[0], rtol=0.1)
    np.testing.assert_allclose(out["zyx_y_fwhm"], fwhm * sigma[1] * scale[1], rtol=0.1)
    np.testing.assert_allclose(out["zyx_x_fwhm"], fwhm * sigma[2] * scale[2], rtol=0.1)


def test_extract_beads_drops_border():
    vol = np.random.default_rng(0).random((20, 30, 30)).astype(np.float32)
    points = [(10, 15, 15), (1, 15, 15)]  # second is too close to the border
    beads, offsets = extract_beads(vol, points, (0.2, 0.1, 0.1), patch_size=(1.0, 0.9, 0.9))
    assert len(beads) == 1
    assert beads[0].shape[0] >= 3


def test_estimate_psf_cli(tmp_path):
    plate_path, vol, pts, sigma = _beads_plate(tmp_path)
    config = {"axis0_patch_size": 15, "axis1_patch_size": 15, "axis2_patch_size": 15}
    config_path = tmp_path / "psf_params.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    out_path = tmp_path / "psf.zarr"
    result = CliRunner().invoke(
        cli,
        ["estimate-psf", "-i", str(plate_path / "0/0/0"), "-c", str(config_path),
         "-o", str(out_path)],
    )
    assert result.exit_code == 0, result.output
    psf = open_ome_zarr(out_path)["0/0/0"].data[0, 0]
    # Averaged PSF is normalized to [0, 1] and peaked near the center
    assert psf.max() == 1.0
    center = np.unravel_index(np.argmax(psf), psf.shape)
    mid = tuple(s // 2 for s in psf.shape)
    assert all(abs(c - m) <= 2 for c, m in zip(center, mid))


def test_characterize_psf_cli(tmp_path):
    plate_path, vol, pts, sigma = _beads_plate(tmp_path)
    config = {
        "block_size": [16, 16, 16],
        "blur_kernel_size": 3,
        "nms_distance": 8,
        "min_distance": 0,
        "threshold_abs": 30.0,
        "max_num_peaks": 100,
        "exclude_border": [5, 5, 5],
        "patch_size": [2.0, 1.0, 1.0],
    }
    config_path = tmp_path / "characterize.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    out_dir = tmp_path / "report"
    result = CliRunner().invoke(
        cli,
        ["characterize-psf", "-i", str(plate_path / "0/0/0"), "-c", str(config_path),
         "-o", str(out_dir)],
    )
    assert result.exit_code == 0, result.output
    assert (out_dir / "psf_analysis_report.html").exists()
    assert (out_dir / "psf_gaussian_fit.csv").exists()
    import pandas as pd

    df = pd.read_csv(out_dir / "psf_gaussian_fit.csv")
    assert len(df) >= 3
    fwhm = 2 * np.sqrt(2 * np.log(2))
    # Mean z FWHM close to the simulated bead size (sigma_z=1.2 px * 0.2 um)
    assert abs(df["zyx_z_fwhm"].mean() - fwhm * 1.2 * 0.2) < 0.15

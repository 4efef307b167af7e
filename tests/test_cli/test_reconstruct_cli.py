"""Tests of the reconstruction chain: compute-tf, apply-inv-tf, reconstruct."""

import numpy as np
import yaml
from click.testing import CliRunner

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.recon.birefringence import (
    birefringence_from_stokes,
    instrument_matrix,
    stokes_from_intensities,
)


def test_instrument_matrix_roundtrip():
    """Stokes → intensities → Stokes round-trips through the pinv."""
    rng = np.random.default_rng(0)
    for n_states in (4, 5):
        A = instrument_matrix(n_states, swing=0.1)
        stokes_true = rng.random((4, 2, 4, 4)).astype(np.float32)
        intensities = np.einsum("sc,c...->s...", A, stokes_true)
        stokes_rec = np.asarray(stokes_from_intensities(intensities, 0.1))
        np.testing.assert_allclose(stokes_rec, stokes_true, atol=1e-4)


def test_birefringence_from_known_retardance():
    """A synthetic sample with known retardance/orientation is recovered."""
    lam = 0.532
    ret_true = 0.05  # um
    ori_true = np.deg2rad(30)
    delta = 2 * np.pi * ret_true / lam
    # Stokes of light through a retarder (slow axis at ori) between the
    # polarization state generator/analyzer, ideal model:
    s0 = np.ones((1, 4, 4), np.float32)
    s1 = (np.sin(delta) * np.sin(2 * ori_true)) * s0
    s2 = (np.sin(delta) * np.cos(2 * ori_true)) * s0
    s3 = np.cos(delta) * s0
    stokes = np.stack([s0, s1, s2, s3])
    out = np.asarray(birefringence_from_stokes(stokes, wavelength_illumination=lam))
    np.testing.assert_allclose(out[0], ret_true, atol=1e-4)  # retardance
    np.testing.assert_allclose(out[1], ori_true, atol=1e-4)  # orientation
    np.testing.assert_allclose(out[3], 1.0, atol=1e-4)  # fully polarized


def _recon_config(tmp_path, **blocks):
    config = {"input_channel_names": blocks.pop("input_channel_names"), **blocks}
    path = tmp_path / "recon.yml"
    with open(path, "w") as f:
        yaml.dump(config, f)
    return path


def test_reconstruct_phase_cli(tmp_path):
    # Brightfield plate: mean background + weak structure
    rng = np.random.default_rng(0)
    plate_path = tmp_path / "bf.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["BF"])
    pos = plate.create_position("A", "1", "0")
    data = 100.0 + rng.normal(0, 1.0, (2, 1, 8, 32, 32)).astype(np.float32)
    pos.create_image("0", data)

    config_path = _recon_config(
        tmp_path,
        input_channel_names=["BF"],
        reconstruction_dimension=3,
        phase={
            "transfer_function": {
                "wavelength_illumination": 0.532,
                "yx_pixel_size": 0.2,
                "z_pixel_size": 0.4,
                "index_of_refraction_media": 1.3,
                "numerical_aperture_detection": 1.2,
                "numerical_aperture_illumination": 0.5,
            },
            "apply_inverse": {"regularization_strength": 0.001},
        },
    )
    output_path = tmp_path / "recon.zarr"
    result = CliRunner().invoke(
        cli,
        [
            "reconstruct",
            "-i", str(plate_path / "A/1/0"),
            "-c", str(config_path),
            "-o", str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    assert (tmp_path / "transfer_function_recon.zarr").exists()
    out = open_ome_zarr(output_path)["A/1/0"]
    assert out.channel_names == ["Phase3D"]
    assert out.data.shape == (2, 1, 8, 32, 32)
    assert np.isfinite(out.data[...]).all()


def test_reconstruct_birefringence_and_fluorescence_cli(tmp_path):
    rng = np.random.default_rng(1)
    channels = ["State0", "State1", "State2", "State3", "State4"]
    plate_path = tmp_path / "pol.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=channels)
    pos = plate.create_position("A", "1", "0")
    data = rng.uniform(50, 100, (1, 5, 4, 16, 16)).astype(np.float32)
    pos.create_image("0", data)

    config_path = _recon_config(
        tmp_path,
        input_channel_names=channels,
        reconstruction_dimension=3,
        birefringence={
            "transfer_function": {"swing": 0.1},
            "apply_inverse": {"wavelength_illumination": 0.532},
        },
    )
    output_path = tmp_path / "biref.zarr"
    result = CliRunner().invoke(
        cli,
        [
            "reconstruct",
            "-i", str(plate_path / "A/1/0"),
            "-c", str(config_path),
            "-o", str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(output_path)["A/1/0"]
    assert out.channel_names == ["Retardance", "Orientation", "BF", "Pol"]
    assert np.isfinite(out.data[...]).all()


def test_apply_inv_tf_init(tmp_path):
    plate_path = tmp_path / "bf.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    pos = plate.create_position("A", "1", "0")
    pos.create_image("0", np.ones((1, 1, 4, 8, 8), np.float32))

    config_path = _recon_config(
        tmp_path,
        input_channel_names=["GFP"],
        fluorescence={
            "transfer_function": {
                "wavelength_emission": 0.507,
                "yx_pixel_size": 0.2,
                "z_pixel_size": 0.4,
                "numerical_aperture_detection": 1.2,
            },
            "apply_inverse": {"regularization_strength": 0.001},
        },
    )
    tf_path = tmp_path / "tf.zarr"
    result = CliRunner().invoke(
        cli,
        ["compute-tf", "-i", str(plate_path / "A/1/0"), "-c", str(config_path),
         "-o", str(tf_path)],
    )
    assert result.exit_code == 0, result.output
    tf_pos = open_ome_zarr(tf_path)["0/0/0"]
    assert "fluor_otf_real" in tf_pos.channel_names

    out_path = tmp_path / "decon.zarr"
    result = CliRunner().invoke(
        cli,
        ["apply-inv-tf", "--init",
         "-i", str(plate_path / "A/1/0"),
         "-t", str(tf_path),
         "-c", str(config_path),
         "-o", str(out_path)],
    )
    assert result.exit_code == 0, result.output
    assert "RESOURCES:" in result.output
    assert open_ome_zarr(out_path)["A/1/0"].channel_names == ["GFP_decon"]

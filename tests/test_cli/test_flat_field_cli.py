"""Tests of ``biahub flat-field`` (kernel parity + CLI end-to-end)."""

import numpy as np
from click.testing import CliRunner

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.kernels.flat_field import flat_field_zyx


def test_flat_field_zyx_matches_numpy_reference():
    rng = np.random.default_rng(0)
    data = rng.uniform(1, 100, (6, 8, 9)).astype(np.float32)
    pattern = np.median(data, axis=0)
    expected = data / pattern * pattern.mean()
    np.testing.assert_allclose(np.asarray(flat_field_zyx(data)), expected, rtol=1e-5)


def test_flat_field_cli(example_plate, example_flat_field_settings, tmp_path):
    plate_path, _ = example_plate
    config_path, settings = example_flat_field_settings
    output_path = tmp_path / "ff.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "flat-field",
            "-i",
            str(plate_path / "A" / "1" / "0"),
            str(plate_path / "B" / "1" / "0"),
            str(plate_path / "B" / "2" / "0"),
            "-c", config_path,
            "-o", str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    assert "RESOURCES:" in result.output

    in_pos = open_ome_zarr(plate_path)["A/1/0"]
    out_pos = open_ome_zarr(output_path)["A/1/0"]
    assert out_pos.data.shape == in_pos.data.shape
    names = in_pos.channel_names
    target = names.index(settings["channel_names"][0])
    other = (target + 1) % len(names)
    # Corrected channel differs; others copied verbatim
    corrected = out_pos.data[0, target]
    raw = in_pos.data[0, target]
    expected = raw / np.median(raw, axis=0) * np.median(raw, axis=0).mean()
    np.testing.assert_allclose(corrected, expected, rtol=1e-4)
    np.testing.assert_allclose(out_pos.data[0, other], in_pos.data[0, other], rtol=1e-6)


def test_flat_field_cli_init(example_plate, example_flat_field_settings, tmp_path):
    plate_path, _ = example_plate
    config_path, _ = example_flat_field_settings
    output_path = tmp_path / "ff.zarr"
    result = CliRunner().invoke(
        cli,
        ["flat-field", "--init", "-i", str(plate_path / "A" / "1" / "0"),
         "-c", config_path, "-o", str(output_path)],
    )
    assert result.exit_code == 0, result.output
    assert "Initialized" in result.output

"""Tests of process-with-config, estimate-crop, estimate-bleaching, estimate-deskew, nf."""

import numpy as np
import yaml
from click.testing import CliRunner

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.process_data import binning_czyx


def test_binning_czyx_mean():
    data = np.arange(2 * 4 * 4 * 4, dtype=np.float32).reshape(2, 4, 4, 4)
    out = binning_czyx(data, [1, 2, 2], mode="mean")
    assert out.shape == (2, 4, 2, 2)
    expected = data.reshape(2, 4, 2, 2, 2, 2).mean(axis=(3, 5))
    np.testing.assert_allclose(out, expected)


def test_process_with_config_cli(example_plate_2, tmp_path):
    plate_path, _ = example_plate_2
    config = {
        "processing_functions": [
            {
                "function": "biahub.process_data.binning_czyx",
                "input_channels": ["GFP"],
                "kwargs": {"binning_factor_zyx": [1, 2, 2], "mode": "mean"},
            }
        ]
    }
    config_path = tmp_path / "proc.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    output_path = tmp_path / "processed.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "process-with-config",
            "-i", str(plate_path / "A/1/0"),
            "-c", str(config_path),
            "-o", str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(output_path)["A/1/0"]
    in_pos = open_ome_zarr(plate_path)["A/1/0"]
    assert out.data.shape == (3, 2, 4, 2, 3)
    # Scale doubled in YX
    assert out.scale[-1] == in_pos.scale[-1] * 2


def test_estimate_crop_cli(tmp_path):
    # Two plates whose first channels are non-zero in a sub-box
    for name in ("lf.zarr", "ls.zarr"):
        plate = open_ome_zarr(tmp_path / name, layout="hcs", mode="w", channel_names=["c0"])
        pos = plate.create_position("A", "1", "0")
        data = np.zeros((2, 1, 6, 16, 16), np.float32)
        data[:, :, 1:5, 2:14, 3:13] = 50.0
        pos.create_image("0", data)

    config = {
        "concat_data_paths": ["lf.zarr/*/*/*", "ls.zarr/*/*/*"],
        "time_indices": "all",
        "channel_names": ["all", "all"],
    }
    config_path = tmp_path / "concat.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    out_yml = tmp_path / "cropped_concat.yml"

    result = CliRunner().invoke(
        cli,
        ["estimate-crop", "-c", str(config_path), "-o", str(out_yml), "--local"],
    )
    assert result.exit_code == 0, result.output
    with open(out_yml) as f:
        cropped = yaml.safe_load(f)
    # Crop must lie within the non-zero box
    z0, z1 = cropped["Z_slice"]
    y0, y1 = cropped["Y_slice"]
    x0, x1 = cropped["X_slice"]
    assert z0 >= 1 and z1 <= 5
    assert y0 >= 2 and y1 <= 14
    assert x0 >= 3 and x1 <= 13
    assert (z1 - z0) >= 2 and (y1 - y0) >= 6


def test_estimate_bleaching_cli(example_plate_2, tmp_path):
    plate_path, _ = example_plate_2
    out_dir = tmp_path / "bleach"
    result = CliRunner().invoke(
        cli,
        ["estimate-bleaching", "-i", str(plate_path / "A/1/0"), "-o", str(out_dir)],
    )
    assert result.exit_code == 0, result.output
    assert (out_dir / "A/1/0/bleaching.svg").exists()


def test_estimate_deskew_cli_headless(example_plate, tmp_path):
    plate_path, _ = example_plate
    out_yml = tmp_path / "deskew_params.yml"
    result = CliRunner().invoke(
        cli,
        [
            "estimate-deskew",
            "-i", str(plate_path / "A/1/0"),
            "-o", str(out_yml),
            "--pixel-size-um", "0.116",
            "--scan-step-um", "0.313",
            "--ls-angle-deg", "36.17",
        ],
    )
    assert result.exit_code == 0, result.output
    with open(out_yml) as f:
        params = yaml.safe_load(f)
    assert params["px_to_scan_ratio"] == 0.371
    assert params["ls_angle_deg"] == 36.17


def test_estimate_deskew_cli_point_files(example_plate, tmp_path):
    """Measurements exported from any viewer feed the same geometry as the
    reference's napari rectangle/line (reference: biahub/estimate_deskew.py:
    44-66)."""
    import numpy as np

    plate_path, _ = example_plate
    # Rectangle spanning 30 scan steps over 81 coverslip px -> ratio 0.370
    rect = np.array(
        [[10.0, 0.0, 19.0], [10.0, 0.0, 100.0], [40.0, 0.0, 100.0], [40.0, 0.0, 19.0]]
    )
    np.savetxt(tmp_path / "rect.csv", rect, delimiter=",")
    # Line with direction r_hat satisfying cos(theta) = rx/ry/ratio
    ratio = 0.37
    theta = np.deg2rad(36.17)
    line = np.array([[0.0, 0.0], [np.cos(theta) * ratio, 1.0]])
    np.savetxt(tmp_path / "line.csv", line, delimiter=",")

    out_yml = tmp_path / "deskew_params.yml"
    result = CliRunner().invoke(
        cli,
        [
            "estimate-deskew",
            "-i", str(plate_path / "A/1/0"),
            "-o", str(out_yml),
            "--pixel-size-um", "0.116",
            "--scan-step-um", "0.313",
            "--rect-points", str(tmp_path / "rect.csv"),
            "--line-points", str(tmp_path / "line.csv"),
        ],
    )
    assert result.exit_code == 0, result.output
    with open(out_yml) as f:
        params = yaml.safe_load(f)
    assert params["px_to_scan_ratio"] == 0.37
    assert abs(params["ls_angle_deg"] - 36.17) < 0.05


def test_nf_list_positions(example_plate_2):
    plate_path, _ = example_plate_2
    result = CliRunner().invoke(cli, ["nf", "list-positions", str(plate_path)])
    assert result.exit_code == 0, result.output
    assert result.output.splitlines() == ["A/1/0", "B/1/0", "B/2/0"]


def test_all_commands_have_help():
    """Every registered command responds to --help (lazy-import check)."""
    runner = CliRunner()
    result = runner.invoke(cli, ["--help"])
    assert result.exit_code == 0
    for line in result.output.splitlines():
        line = line.strip()
        if not line or line.startswith(("Usage", "Options", "Commands", "-", "command-line")):
            continue
        cmd = line.split()[0]
        sub = runner.invoke(cli, [cmd, "--help"])
        assert sub.exit_code == 0, f"{cmd}: {sub.output}"


def test_process_with_config_squaring(example_plate_2, tmp_path):
    """np.* functions from the allow list run per channel (reference:
    tests/test_cli/test_process_with_config.py squaring cases)."""
    plate_path, _ = example_plate_2
    config = {
        "processing_functions": [
            {"function": "np.square", "input_channels": ["GFP"], "kwargs": {}}
        ]
    }
    config_path = tmp_path / "sq.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    output_path = tmp_path / "sq.zarr"
    result = CliRunner().invoke(
        cli,
        ["process-with-config", "-i", str(plate_path / "A/1/0"),
         "-c", str(config_path), "-o", str(output_path)],
    )
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(output_path)["A/1/0"]
    in_pos = open_ome_zarr(plate_path)["A/1/0"]
    gfp = in_pos.channel_names.index("GFP")
    np.testing.assert_allclose(
        out.data[0, gfp], np.square(in_pos.data[0, gfp]), rtol=1e-5
    )


def test_process_with_config_invalid_function(example_plate_2, tmp_path):
    """Arbitrary import strings are rejected by the allow list."""
    plate_path, _ = example_plate_2
    config = {
        "processing_functions": [
            {"function": "os.system", "input_channels": ["GFP"], "kwargs": {}}
        ]
    }
    config_path = tmp_path / "bad.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    result = CliRunner().invoke(
        cli,
        ["process-with-config", "-i", str(plate_path / "A/1/0"),
         "-c", str(config_path), "-o", str(tmp_path / "o.zarr")],
    )
    assert result.exit_code != 0


def test_process_with_config_invalid_channel(example_plate_2, tmp_path):
    plate_path, _ = example_plate_2
    config = {
        "processing_functions": [
            {"function": "np.square", "input_channels": ["NotAChannel"], "kwargs": {}}
        ]
    }
    config_path = tmp_path / "badch.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    result = CliRunner().invoke(
        cli,
        ["process-with-config", "-i", str(plate_path / "A/1/0"),
         "-c", str(config_path), "-o", str(tmp_path / "o.zarr")],
    )
    assert result.exit_code != 0


def test_binning_sum_mode():
    from biahub_tpu.process_data import binning_czyx

    data = np.ones((1, 4, 4, 4), np.float32)
    out = np.asarray(binning_czyx(data, binning_factor_zyx=[2, 2, 2], mode="sum"))
    assert out.shape == (1, 2, 2, 2)
    np.testing.assert_allclose(out, 8.0)
    out = np.asarray(binning_czyx(data, binning_factor_zyx=[2, 2, 2], mode="mean"))
    np.testing.assert_allclose(out, 1.0)


def test_animation_contours_and_contrast():
    """Headless math beneath the napari animation utilities
    (reference: biahub/visualize/animation_utils.py:19-438)."""
    from biahub_tpu.visualize.animation_utils import get_contours, suggest_contrast_limits

    labels = np.zeros((16, 16), np.int32)
    labels[4:10, 4:10] = 1
    labels[11:15, 11:15] = 2
    contours = get_contours(labels, thickness=1)
    # Contours preserve the label ids and sit on the object borders only
    assert set(np.unique(contours)) == {0, 1, 2}
    assert contours[6, 6] == 0  # interior removed
    assert contours[4, 6] == 1  # border kept

    rng = np.random.default_rng(0)
    arr = rng.normal(100.0, 10.0, 10000).astype(np.float32)
    lo, hi = suggest_contrast_limits(arr)
    assert lo < hi
    assert 60 < lo < 100 < hi < 140

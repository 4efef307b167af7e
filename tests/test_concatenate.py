"""Tests of ``biahub concatenate``: channel merge/dedup, crops, resolve mode."""

import numpy as np
import yaml
from click.testing import CliRunner

from biahub_tpu.cli.main import cli
from biahub_tpu.concatenate import get_slice, get_path_slice_param
from biahub_tpu.io.ngff import open_ome_zarr


def _run(config: dict, tmp_path, out_name="concat.zarr", extra_args=()):
    config_path = tmp_path / "concat.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    output_path = tmp_path / out_name
    result = CliRunner().invoke(
        cli, ["concatenate", "-c", str(config_path), "-o", str(output_path), *extra_args]
    )
    return result, output_path


def test_slice_helpers():
    assert get_slice("all", 10) == slice(0, 10)
    assert get_slice([2, 8], 10) == slice(2, 8)
    assert get_path_slice_param("all", 0, 3) == "all"
    assert get_path_slice_param([2, 8], 1, 3) == [2, 8]
    assert get_path_slice_param([[0, 4], [1, 5]], 1, 2) == [1, 5]


def test_concatenate_channels_from_two_plates(example_plate, example_plate_2, tmp_path):
    plate1, _ = example_plate  # 6 channels float32
    plate2, _ = example_plate_2  # GFP,RFP uint16

    config = {
        "concat_data_paths": [str(plate1 / "A/1/0"), str(plate2 / "A/1/0")],
        "time_indices": "all",
        "channel_names": [["Phase3D"], ["RFP"]],
        "output_ome_zarr_version": "0.4",
    }
    result, output_path = _run(config, tmp_path)
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(output_path)["A/1/0"]
    assert out.channel_names == ["Phase3D", "RFP"]
    in1 = open_ome_zarr(plate1)["A/1/0"]
    in2 = open_ome_zarr(plate2)["A/1/0"]
    np.testing.assert_allclose(
        out.data[0, 0], in1.data[0, in1.channel_names.index("Phase3D")], rtol=1e-6
    )
    np.testing.assert_allclose(
        out.data[0, 1],
        in2.data[0, in2.channel_names.index("RFP")].astype(out.data.dtype),
        rtol=1e-6,
    )


def test_concatenate_channel_dedup(example_plate_2, tmp_path):
    plate2, _ = example_plate_2
    config = {
        "concat_data_paths": [str(plate2 / "A/1/0"), str(plate2 / "B/1/0")],
        "time_indices": "all",
        "channel_names": [["GFP", "RFP"], ["GFP", "RFP"]],
        "ensure_unique_positions": False,
        "output_ome_zarr_version": "0.4",
    }
    result, output_path = _run(config, tmp_path)
    assert result.exit_code == 0, result.output
    out_plate = open_ome_zarr(output_path)
    # Duplicate channel names are merged, positions both kept
    assert out_plate["A/1/0"].channel_names == ["GFP", "RFP"]
    assert len(out_plate.position_keys()) == 2


def test_concatenate_crop_and_time_subset(example_plate_2, tmp_path):
    plate2, _ = example_plate_2
    config = {
        "concat_data_paths": [str(plate2 / "A/1/0")],
        "time_indices": [1, 2],
        "channel_names": [["GFP"]],
        "Z_slice": [1, 3],
        "Y_slice": [0, 4],
        "X_slice": [2, 6],
        "output_ome_zarr_version": "0.4",
    }
    result, output_path = _run(config, tmp_path)
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(output_path)["A/1/0"]
    assert out.data.shape == (2, 1, 2, 4, 4)
    in_pos = open_ome_zarr(plate2)["A/1/0"]
    np.testing.assert_allclose(
        out.data[0, 0],
        in_pos.data[1, 0, 1:3, 0:4, 2:6].astype(out.data.dtype),
        rtol=1e-6,
    )


def test_concatenate_duplicate_positions_suffixed(example_plate_2, tmp_path):
    plate2, _ = example_plate_2
    config = {
        "concat_data_paths": [str(plate2 / "A/1/0"), str(plate2 / "A/1/0")],
        "time_indices": "all",
        "channel_names": [["GFP"], ["RFP"]],
        "ensure_unique_positions": True,
        "output_ome_zarr_version": "0.4",
    }
    result, output_path = _run(config, tmp_path)
    assert result.exit_code == 0, result.output
    keys = open_ome_zarr(output_path).position_keys()
    assert ("A", "1", "0") in keys and ("A", "1d1", "0") in keys


def test_concatenate_glob_and_zarr_v3(example_plate_2, tmp_path):
    plate2, _ = example_plate_2
    config = {
        "concat_data_paths": [str(plate2 / "*" / "*" / "*")],
        "time_indices": "all",
        "channel_names": ["all"],
        "shards_ratio": [1, 1, 2, 1, 1],
        # default output version: 0.5 (zarr v3) — the migration path
    }
    result, output_path = _run(config, tmp_path)
    assert result.exit_code == 0, result.output
    out_plate = open_ome_zarr(output_path)
    assert out_plate.version == "0.5"
    assert len(out_plate.position_keys()) == 3
    pos = out_plate["A/1/0"]
    in_pos = open_ome_zarr(plate2)["A/1/0"]
    np.testing.assert_allclose(
        pos.data[...], in_pos.data[...].astype(pos.data.dtype), rtol=1e-6
    )


def test_concatenate_resolve_mode(example_plate_2, tmp_path):
    plate2, _ = example_plate_2
    config = {
        "concat_data_paths": ["placeholder"],
        "time_indices": "all",
        "channel_names": ["all"],
    }
    config_path = tmp_path / "template.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    resolved_path = tmp_path / "resolved.yml"
    result = CliRunner().invoke(
        cli,
        [
            "concatenate", "-c", str(config_path), "-o", str(resolved_path),
            "--concat-data-paths", str(plate2 / "*/*/*"),
        ],
    )
    assert result.exit_code == 0, result.output
    with open(resolved_path) as f:
        resolved = yaml.safe_load(f)
    assert resolved["concat_data_paths"] == [str(plate2 / "*/*/*")]


def test_concatenate_init_and_resume(example_plate_2, tmp_path):
    plate2, _ = example_plate_2
    config = {
        "concat_data_paths": [str(plate2 / "A/1/0")],
        "time_indices": "all",
        "channel_names": ["all"],
        "output_ome_zarr_version": "0.4",
    }
    config_path = tmp_path / "concat.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    output_path = tmp_path / "concat.zarr"

    init = CliRunner().invoke(
        cli, ["concatenate", "--init", "-c", str(config_path), "-o", str(output_path)]
    )
    assert init.exit_code == 0, init.output
    assert "RESOURCES:" in init.output
    assert np.allclose(open_ome_zarr(output_path)["A/1/0"].data[...], 0)

    full = CliRunner().invoke(
        cli, ["concatenate", "--resume", "-c", str(config_path), "-o", str(output_path)]
    )
    assert full.exit_code == 0, full.output
    assert not np.allclose(open_ome_zarr(output_path)["A/1/0"].data[...], 0)

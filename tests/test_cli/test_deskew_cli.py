"""End-to-end tests of ``biahub deskew`` on tiny synthetic plates.

Coverage follows the reference suite (reference:
tests/test_cli/test_deskew_cli.py): shape math units, full-plate CLI run,
--init, --cluster debug single position, --resume, plus numerical parity of
the fast deskew against a scipy affine_transform reference.
"""

import numpy as np
import pytest
from click.testing import CliRunner
from scipy.ndimage import affine_transform

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.kernels.deskew import (
    average_n_slices,
    deskew_zyx,
    get_deskewed_data_shape,
    uncentered_deskew_matrix,
)


def test_get_deskewed_data_shape():
    # Values mirror the reference unit test semantics: shape math only.
    shape, voxel = get_deskewed_data_shape(
        (10, 20, 30), ls_angle_deg=36.17, px_to_scan_ratio=0.371, keep_overhang=True
    )
    assert shape[0] == 20 and shape[1] == 30
    assert shape[2] == int(np.ceil(10 / 0.371 + 20 * np.cos(np.deg2rad(36.17))))
    shape_no, _ = get_deskewed_data_shape(
        (10, 20, 30), ls_angle_deg=36.17, px_to_scan_ratio=0.371, keep_overhang=False
    )
    assert shape_no[2] < shape[2]

    # Averaging shrinks only the leading axis, rounding up.
    shape_avg, voxel_avg = get_deskewed_data_shape(
        (10, 20, 30), 36.17, 0.371, True, average_n_slices=3
    )
    assert shape_avg == (int(np.ceil(shape[0] / 3)), shape[1], shape[2])
    assert voxel_avg[0] == pytest.approx(3 * voxel[0])


def test_average_n_slices():
    data = np.random.default_rng(0).random((7, 4, 5)).astype(np.float32)
    padded = np.pad(data, [(0, 2), (0, 0), (0, 0)], mode="edge")
    expected = padded.reshape(3, 3, 4, 5).mean(1)
    np.testing.assert_allclose(np.asarray(average_n_slices(data, 3)), expected, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(average_n_slices(data, 1)), data)


def test_deskew_parity_with_scipy():
    """Interior voxels match scipy.ndimage.affine_transform to float tolerance."""
    rng = np.random.default_rng(1)
    vol = rng.random((16, 20, 24)).astype(np.float32)
    for keep in (True, False):
        oshape, _ = get_deskewed_data_shape(vol.shape, 36.17, 0.371, keep)
        m = uncentered_deskew_matrix(vol.shape, oshape, 36.17, 0.371)
        ref = affine_transform(
            vol, m[:3, :3], m[:3, 3], output_shape=oshape, order=1, mode="constant"
        )
        fast = np.asarray(deskew_zyx(vol, 36.17, 0.371, keep, 1))
        assert fast.shape == oshape
        interior = ref != 0  # boundary handling conventions differ at fill voxels
        assert np.abs(ref - fast)[interior].max() < 1e-4


def test_deskew_overhang_fill():
    rng = np.random.default_rng(2)
    vol = rng.random((16, 20, 24)).astype(np.float32) + 1.0
    filled = np.asarray(deskew_zyx(vol, 36.17, 0.371, True, 1, overhang_fill="mean"))
    unfilled = np.asarray(deskew_zyx(vol, 36.17, 0.371, True, 1, overhang_fill=0))
    # The overhang of the unfilled volume is zero; filled replaces it with a
    # positive mean.
    assert (unfilled == 0).any()
    assert not (filled == 0).any()


def test_deskew_cli(example_plate, example_deskew_settings, tmp_path):
    plate_path, _ = example_plate
    config_path, settings = example_deskew_settings
    output_path = tmp_path / "output.zarr"

    runner = CliRunner()
    result = runner.invoke(
        cli,
        [
            "deskew",
            "-i",
            str(plate_path / "A" / "1" / "0"),
            str(plate_path / "B" / "1" / "0"),
            str(plate_path / "B" / "2" / "0"),
            "-c",
            config_path,
            "-o",
            str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    assert output_path.exists()
    assert "RESOURCES:" in result.output

    ds = open_ome_zarr(output_path)
    keys = ds.position_keys()
    assert len(keys) == 3
    pos = ds["A/1/0"]
    in_pos = open_ome_zarr(plate_path)["A/1/0"]
    T, C, Z, Y, X = in_pos.data.shape
    expected_shape, voxel = get_deskewed_data_shape(
        (Z, Y, X), settings["ls_angle_deg"], settings["px_to_scan_ratio"],
        settings["keep_overhang"], settings["average_n_slices"],
        settings["pixel_size_um"],
    )
    assert pos.data.shape == (T, C) + expected_shape
    assert not np.allclose(pos.data[0, 0], 0)
    # Voxel size metadata propagates
    np.testing.assert_allclose(pos.scale[2:], voxel, rtol=1e-6)
    # Provenance stamped
    assert "biahub-deskew" in pos.zattrs


def test_deskew_cli_init_only(example_plate, example_deskew_settings, tmp_path):
    plate_path, _ = example_plate
    config_path, _ = example_deskew_settings
    output_path = tmp_path / "output.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "deskew", "--init",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-c", config_path,
            "-o", str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    assert "RESOURCES:" in result.output
    assert "Initialized" in result.output
    # Store initialized but data untouched
    pos = open_ome_zarr(output_path)["A/1/0"]
    assert np.allclose(pos.data[...], 0)


def test_deskew_cli_debug_single_position(example_plate, example_deskew_settings, tmp_path):
    plate_path, _ = example_plate
    config_path, _ = example_deskew_settings
    output_path = tmp_path / "output.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "deskew", "--cluster", "debug",
            "-i", str(plate_path / "B" / "2" / "0"),
            "-c", config_path,
            "-o", str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    assert "Deskew complete" in result.output
    ds = open_ome_zarr(output_path)
    assert ds.position_keys() == [("B", "2", "0")]


def test_deskew_cli_resume(example_plate, example_deskew_settings, tmp_path):
    plate_path, _ = example_plate
    config_path, _ = example_deskew_settings
    output_path = tmp_path / "output.zarr"
    args = [
        "deskew",
        "-i", str(plate_path / "A" / "1" / "0"),
        "-c", config_path,
        "-o", str(output_path),
        "--resume",
    ]
    runner = CliRunner()
    first = runner.invoke(cli, args)
    assert first.exit_code == 0, first.output
    assert "Deskewed 18 (t, c) volumes" in first.output

    second = runner.invoke(cli, args)
    assert second.exit_code == 0, second.output
    assert "skipping 18 finished units" in second.output
    assert "Deskewed 0 (t, c) volumes" in second.output


def test_deskew_xsplit_exact():
    """Input-X slabs assemble bit-exactly into the full deskew (the slab maps
    to a flipped output-Y range; the reference splits X for GPU memory the
    same way, biahub/deskew.py:554-582)."""
    from biahub_tpu.kernels.deskew import deskew_zyx

    rng = np.random.default_rng(0)
    vol = rng.random((12, 32, 48)).astype(np.float32)
    full = np.asarray(deskew_zyx(vol, 36.0, 0.5, True, average_window=2))
    out = np.zeros_like(full)
    X = 48
    for x0 in range(0, X, 16):
        x1 = x0 + 16
        slab = np.asarray(
            deskew_zyx(vol[:, :, x0:x1], 36.0, 0.5, True, average_window=2)
        )
        out[:, X - x1 : X - x0, :] = slab
    np.testing.assert_array_equal(out, full)


def test_deskew_cli_oversized_volume_splits(example_plate, example_deskew_settings,
                                            tmp_path, monkeypatch):
    """Volumes over the batch budget run the X-slab path and match the
    whole-volume result."""
    plate_path, _ = example_plate
    config_path, _ = example_deskew_settings

    out_whole = tmp_path / "whole.zarr"
    r = CliRunner().invoke(
        cli,
        ["deskew", "-i", str(plate_path / "A/1/0"), "-c", config_path,
         "-o", str(out_whole)],
    )
    assert r.exit_code == 0, r.output

    monkeypatch.setenv("BIAHUB_TPU_MAX_BATCH_BYTES", "1024")
    out_split = tmp_path / "split.zarr"
    r = CliRunner().invoke(
        cli,
        ["deskew", "-i", str(plate_path / "A/1/0"), "-c", config_path,
         "-o", str(out_split)],
    )
    assert r.exit_code == 0, r.output
    assert "X-slabs" in r.output
    a = open_ome_zarr(out_whole)["A/1/0"].data[...]
    b = open_ome_zarr(out_split)["A/1/0"].data[...]
    # The mean-fill value differs at f32 summation-order epsilon between the
    # whole-volume and chunked accumulations; the geometry is bit-exact.
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_deskew_xsplit_resume(example_plate, example_deskew_settings, tmp_path,
                              monkeypatch):
    """The X-slab path honors --resume: completed (t, c) units are skipped."""
    plate_path, _ = example_plate
    config_path, _ = example_deskew_settings
    monkeypatch.setenv("BIAHUB_TPU_MAX_BATCH_BYTES", "1024")

    out = tmp_path / "split.zarr"
    args = ["deskew", "-i", str(plate_path / "A/1/0"), "-c", config_path,
            "-o", str(out), "--resume"]
    r = CliRunner().invoke(cli, args)
    assert r.exit_code == 0, r.output
    first = open_ome_zarr(out)["A/1/0"].data[...]

    # Second run with resume skips all units and leaves the data intact
    r = CliRunner().invoke(cli, args)
    assert r.exit_code == 0, r.output
    second = open_ome_zarr(out)["A/1/0"].data[...]
    np.testing.assert_array_equal(first, second)


def test_deskew_cli_monitor(example_plate, example_deskew_settings, tmp_path, monkeypatch):
    """--monitor renders the live per-position job table (reference:
    biahub/cli/monitor.py:91-150); jobs end COMPLETED."""
    monkeypatch.setenv("CI", "false")  # allow cluster=local (CI forces debug)
    plate_path, _ = example_plate
    config_path, _ = example_deskew_settings
    output_path = tmp_path / "output.zarr"

    runner = CliRunner()
    result = runner.invoke(
        cli,
        [
            "deskew",
            "-i",
            str(plate_path / "A" / "1" / "0"),
            str(plate_path / "B" / "1" / "0"),
            "-c",
            config_path,
            "-o",
            str(output_path),
            "--cluster",
            "local",
            "--monitor",
        ],
    )
    assert result.exit_code == 0, result.output
    assert output_path.exists()
    assert "A/1/0" in result.output and "B/1/0" in result.output
    assert "COMPLETED" in result.output

"""Tests of ``biahub flip`` and ``biahub pyramid``."""

import numpy as np
from click.testing import CliRunner

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import open_ome_zarr


def test_flip_cli(example_plate_2):
    plate_path, _ = example_plate_2
    before = open_ome_zarr(plate_path)["A/1/0"].data[...]

    result = CliRunner().invoke(
        cli, ["flip", "-i", str(plate_path / "A" / "1" / "0"), "-x"]
    )
    assert result.exit_code == 0, result.output
    after = open_ome_zarr(plate_path)["A/1/0"].data[...]
    np.testing.assert_array_equal(after, before[..., ::-1])


def test_pyramid_cli(create_custom_plate, tmp_path):
    plate_path, _ = create_custom_plate(tmp_path, y_size=8, x_size=12)
    result = CliRunner().invoke(
        cli,
        ["pyramid", "-i", str(plate_path / "A" / "1" / "0"), "--levels", "3", "--local"],
    )
    assert result.exit_code == 0, result.output
    pos = open_ome_zarr(plate_path)["A/1/0"]
    assert pos["1"].shape == (3, 3, 4, 4, 6)
    assert pos["2"].shape == (3, 3, 4, 2, 3)
    # mean-downsample parity on level 1
    base = pos["0"][0, 0]
    lvl1 = pos["1"][0, 0]
    expected = base.reshape(4, 4, 2, 6, 2).mean(axis=(2, 4)).astype(base.dtype)
    np.testing.assert_allclose(lvl1, expected)
    # scale metadata doubles per level
    ms = pos.zattrs["multiscales"][0]["datasets"]
    s0 = ms[0]["coordinateTransformations"][0]["scale"]
    s1 = ms[1]["coordinateTransformations"][0]["scale"]
    assert s1[-1] == s0[-1] * 2 and s1[-2] == s0[-2] * 2

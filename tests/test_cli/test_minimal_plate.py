"""Degenerate-input robustness: every lightweight verb must handle a minimal
single-timepoint, single-channel plate without special casing."""

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr


@pytest.fixture()
def mini_plate(tmp_path):
    plate_path = tmp_path / "mini.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    pos = plate.create_position("A", "1", "0")
    rng = np.random.default_rng(0)
    pos.create_image(
        "0",
        (rng.random((1, 1, 4, 16, 16)).astype(np.float32) + 0.1),
        transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))],
    )
    return plate_path


def _cfg(tmp_path, name, payload):
    p = tmp_path / f"{name}.yml"
    with open(p, "w") as f:
        yaml.dump(payload, f)
    return str(p)


def test_minimal_plate_verbs(mini_plate, tmp_path):
    runner = CliRunner()
    inp = str(mini_plate / "A/1/0")

    cases = [
        (["flat-field", "-i", inp, "-o", str(tmp_path / "ff.zarr"),
          "-c", _cfg(tmp_path, "ff", {"channel_names": ["GFP"]}), "--cluster", "debug"]),
        (["flip", "-i", inp, "-x"]),
        (["pyramid", "-i", inp, "--levels", "2", "--local"]),
        (["deskew", "-i", inp, "-o", str(tmp_path / "dk.zarr"),
          "-c", _cfg(tmp_path, "dk", {
              "pixel_size_um": 0.1, "ls_angle_deg": 36.0, "px_to_scan_ratio": 0.5,
              "keep_overhang": True, "average_n_slices": 1}), "--cluster", "debug"]),
        (["process-with-config", "-i", inp, "-o", str(tmp_path / "pc.zarr"),
          "-c", _cfg(tmp_path, "pc", {"processing_functions": [
              {"function": "np.square", "input_channels": ["GFP"], "kwargs": {}}]})]),
        (["estimate-bleaching", "-i", inp, "-o", str(tmp_path / "bleach")]),
        (["stabilize", "-i", inp, "-o", str(tmp_path / "st.zarr"),
          "-c", _cfg(tmp_path, "st", {
              "affine_transform_zyx_list": [np.eye(4).tolist()],
              "time_indices": "all",
              "stabilization_estimation_channel": "GFP",
              "stabilization_channels": ["GFP"],
              "stabilization_type": "xyz",
              "stabilization_method": "phase-cross-corr"})]),
        # T=1: the PCC pair loop is empty, output is the identity transform
        (["estimate-stabilization", "-i", inp, "-o", str(tmp_path / "est"),
          "-c", _cfg(tmp_path, "est", {
              "stabilization_estimation_channel": "GFP",
              "stabilization_channels": ["GFP"],
              "stabilization_type": "xyz",
              "stabilization_method": "phase-cross-corr",
              "phase_cross_corr_settings": {"t_reference": "first",
                                            "center_crop_xy": None}}), "--local"]),
    ]
    for argv in cases:
        result = runner.invoke(cli, argv)
        assert result.exit_code == 0, f"{argv[0]}: {result.output}"

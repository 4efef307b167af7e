"""Tests of ``biahub register`` and ``biahub stabilize``."""

import numpy as np
import yaml
from click.testing import CliRunner
from scipy.ndimage import affine_transform

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.register import (
    apply_affine_transform,
    find_lir,
    find_overlapping_volume,
    rescale_voxel_size,
)
from biahub_tpu.transforms.lir import largest_interior_rectangle


def test_apply_affine_transform_matches_scipy():
    rng = np.random.default_rng(0)
    vol = rng.random((8, 10, 12)).astype(np.float32)
    m = np.eye(4)
    m[:3, 3] = [0.5, -1.0, 2.0]
    out = apply_affine_transform(vol, m, (8, 10, 12))
    ref = affine_transform(vol, m[:3, :3], m[:3, 3], order=1, mode="constant")
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_apply_affine_transform_crop_slicing():
    rng = np.random.default_rng(1)
    vol = rng.random((8, 10, 12)).astype(np.float32)
    m = np.eye(4)
    full = apply_affine_transform(vol, m, (8, 10, 12))
    slices = (slice(2, 6), slice(1, 9), slice(3, 11))
    cropped = apply_affine_transform(vol, m, (8, 10, 12), crop_output_slicing=slices)
    np.testing.assert_allclose(cropped, full[slices], atol=1e-6)


def test_largest_interior_rectangle():
    mask = np.zeros((10, 12), dtype=bool)
    mask[2:8, 3:11] = True
    mask[4, 5] = False  # hole splits the rectangle
    x, y, w, h = largest_interior_rectangle(mask)
    assert w * h >= 24
    assert mask[y : y + h, x : x + w].all()


def test_find_lir_and_overlap():
    mask = np.zeros((6, 10, 12), dtype=bool)
    mask[1:5, 2:9, 3:10] = True
    zs, ys, xs = find_lir(mask)
    assert mask[zs, ys, xs].all()

    # Pure translation: overlap is the shifted box
    m = np.eye(4)
    m[:3, 3] = [1, 2, 3]  # output->input: content shifts toward origin
    zs, ys, xs = find_overlapping_volume((6, 10, 12), (6, 10, 12), m)
    assert zs.stop - zs.start <= 5
    assert ys.stop - ys.start <= 8


def test_rescale_voxel_size():
    m = np.diag([2.0, 3.0, 4.0])
    out = rescale_voxel_size(m, np.array([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(out, [2.0, 3.0, 4.0])


def test_register_cli(example_plate, example_plate_2, example_register_settings, tmp_path):
    source_path, _ = example_plate  # has Phase3D etc.
    target_path, _ = example_plate_2  # GFP target
    config_path, settings = example_register_settings
    output_path = tmp_path / "registered.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "register",
            "-s", str(source_path / "A" / "1" / "0"),
            "-t", str(target_path / "A" / "1" / "0"),
            "-c", config_path,
            "-o", str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    out_pos = open_ome_zarr(output_path)["A/1/0"]
    # identity transform + keep_overhang False -> full target shape retained
    out_names = out_pos.channel_names
    # target channels + source channels
    assert "GFP" in out_names and "Phase3D" in out_names
    src = open_ome_zarr(source_path)["A/1/0"]
    tgt = open_ome_zarr(target_path)["A/1/0"]
    c_out = out_names.index("Phase3D")
    c_src = src.channel_names.index("Phase3D")
    # identity warp: registered channel equals source data
    np.testing.assert_allclose(
        out_pos.data[0, c_out], src.data[0, c_src], atol=1e-3
    )
    # copied target channel equals target data
    np.testing.assert_allclose(
        out_pos.data[0, out_names.index("GFP")],
        tgt.data[0, tgt.channel_names.index("GFP")].astype(np.float32),
        atol=1e-3,
    )


def test_stabilize_cli(example_plate_2, tmp_path):
    plate_path, _ = example_plate_2
    # Per-timepoint translations: t0 identity, t1 shift z by 1, t2 shift y by 1
    mats = [np.eye(4) for _ in range(3)]
    mats[1][0, 3] = 1.0
    mats[2][1, 3] = 1.0
    config = {
        "stabilization_estimation_channel": "GFP",
        "stabilization_type": "xyz",
        "stabilization_channels": ["GFP"],
        "affine_transform_zyx_list": [m.tolist() for m in mats],
        "time_indices": "all",
    }
    config_path = tmp_path / "stab.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    output_path = tmp_path / "stabilized.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "stabilize",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-o", str(output_path),
            "-c", str(config_path),
        ],
    )
    assert result.exit_code == 0, result.output
    out_pos = open_ome_zarr(output_path)["A/1/0"]
    in_pos = open_ome_zarr(plate_path)["A/1/0"]
    assert out_pos.data.shape == in_pos.data.shape
    # t0: identity
    np.testing.assert_allclose(
        out_pos.data[0, 0], in_pos.data[0, 0].astype(np.float32), atol=1e-3
    )
    # t1: shifted by +1 in z (output[z] = input[z+1])
    expected = np.zeros_like(in_pos.data[1, 0], dtype=np.float32)
    expected[:-1] = in_pos.data[1, 0][1:]
    np.testing.assert_allclose(out_pos.data[1, 0], expected, atol=1e-3)


def test_register_oversized_volume_chunks(example_plate, tmp_path, monkeypatch):
    """Register over the batch budget runs the chunked multipass path and
    matches the whole-volume result at interpolation tolerance."""
    import yaml

    plate_path, _ = example_plate
    matrix = np.eye(4)
    # Integer translation: both the whole-volume path (linear) and the
    # chunked multipass path (Catmull-Rom) are exact copies, so the outputs
    # must agree exactly on the random-noise fixture
    matrix[:3, 3] = [1.0, -1.0, 1.0]
    config = {
        "source_channel_names": ["GFP"],
        "target_channel_name": "GFP",
        "affine_transform_zyx": matrix.tolist(),
        "keep_overhang": True,
    }
    cfg = tmp_path / "reg.yml"
    with open(cfg, "w") as f:
        yaml.dump(config, f)

    whole = tmp_path / "whole.zarr"
    r = CliRunner().invoke(
        cli,
        ["register", "-s", str(plate_path / "A/1/0"), "-t", str(plate_path / "A/1/0"),
         "-c", str(cfg), "-o", str(whole), "--local"],
    )
    assert r.exit_code == 0, r.output

    monkeypatch.setenv("BIAHUB_TPU_MAX_BATCH_BYTES", "512")
    split = tmp_path / "split.zarr"
    r = CliRunner().invoke(
        cli,
        ["register", "-s", str(plate_path / "A/1/0"), "-t", str(plate_path / "A/1/0"),
         "-c", str(cfg), "-o", str(split), "--local"],
    )
    assert r.exit_code == 0, r.output
    assert "output" in r.output and "chunks" in r.output
    a = open_ome_zarr(whole)["A/1/0"].data[...]
    b = open_ome_zarr(split)["A/1/0"].data[...]
    gfp = open_ome_zarr(whole)["A/1/0"].channel_names.index("GFP")
    np.testing.assert_allclose(b[:, gfp], a[:, gfp], atol=1e-3)

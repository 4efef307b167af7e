"""Tests of ``biahub stitch`` and ``biahub estimate-stitch``."""

import numpy as np
import yaml
from click.testing import CliRunner

from biahub_tpu.cli.main import cli
from biahub_tpu.estimate_stitch import extract_stage_position
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.stitch import get_output_shape, list_of_nd_slices_from_array_shape
from biahub_tpu.stitching.tile import parse_grid_coords, register_translation_nd


def test_chunk_slicing():
    chunks = list_of_nd_slices_from_array_shape((4, 5, 6), (2, 3, 4))
    assert len(chunks) == 8
    assert chunks[0] == (slice(0, 2), slice(0, 3), slice(0, 4))
    assert chunks[-1] == (slice(2, 4), slice(3, 5), slice(4, 6))


def test_get_output_shape():
    shifts = {"a": (0, 0, 0), "b": (0, 10, 20)}
    assert get_output_shape(shifts, (1, 1, 4, 16, 16)) == (4, 26, 36)


def test_parse_grid_coords():
    assert parse_grid_coords("0/2/001000") == (1, 0)
    assert parse_grid_coords("000001") == (0, 1)


def test_register_translation_nd_recovers_shift():
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.random((96, 96)).astype(np.float32), 1.5)
    moved = np.roll(base, (3, -5), axis=(0, 1))
    shift, confidence = register_translation_nd(base, moved)
    np.testing.assert_array_equal(shift, [-3, 5])
    assert confidence > 0


def _tiles_plate(tmp_path, overlap=6, tile=(2, 1, 3, 16, 16)):
    """Two horizontally adjacent tiles cut from one mosaic with overlap."""
    rng = np.random.default_rng(1)
    T, C, Z, Y, X = tile
    mosaic = rng.uniform(10, 100, (T, C, Z, Y, 2 * X - overlap)).astype(np.float32)
    tile_a = mosaic[..., :X]
    tile_b = mosaic[..., X - overlap :]
    plate_path = tmp_path / "tiles.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    plate.create_position("A", "1", "000000").create_image("0", tile_a)
    plate.create_position("A", "1", "000001").create_image("0", tile_b)
    return plate_path, mosaic, overlap


def test_stitch_cli_blends_mosaic(tmp_path):
    plate_path, mosaic, overlap = _tiles_plate(tmp_path)
    X = 16
    config = {
        "channels": ["GFP"],
        "total_translation": {
            "A/1/000000": [0.0, 0.0, 0.0],
            "A/1/000001": [0.0, 0.0, float(X - overlap)],
        },
    }
    config_path = tmp_path / "stitch.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    output_path = tmp_path / "stitched.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "stitch",
            "-i", str(plate_path / "A/1/000000"), str(plate_path / "A/1/000001"),
            "-c", str(config_path),
            "-o", str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(output_path)["A/1/0"]
    assert out.data.shape[-3:] == mosaic.shape[-3:]
    # The blended mosaic matches the original up to float16 + edge effects
    stitched = out.data[0, 0].astype(np.float32)
    expected = mosaic[0, 0]
    err = np.abs(stitched[:, 2:-2, 2:-2] - expected[:, 2:-2, 2:-2])
    rel = err / np.abs(expected[:, 2:-2, 2:-2])
    assert np.median(rel) < 0.01


def test_extract_stage_position(tmp_path):
    plate_path = tmp_path / "p.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    plate.create_position("A", "1", "0")
    plate.update_zattrs(
        {
            "Summary": {
                "StagePositions": [
                    {
                        "Label": "Pos0",
                        "DefaultXYStage": "XY",
                        "DefaultZStage": "Z",
                        "XY": [10.5, -3.25],
                        "Z": 7.0,
                    },
                    {
                        "Label": "Pos1",
                        "DefaultXYStage": "XY",
                        "DevicePositions": [
                            {"Device": "XY", "Position_um": [1.0, 2.0]},
                            {"Device": "ZDrive", "Position_um": [4.5]},
                        ],
                    },
                ]
            }
        }
    )
    plate2 = open_ome_zarr(plate_path)
    assert extract_stage_position(plate2, "Pos0") == (7.0, -3.25, 10.5)
    assert extract_stage_position(plate2, "Pos1") == (4.5, 2.0, 1.0)


def test_estimate_stitch_cli_from_metadata(tmp_path):
    plate_path, _, overlap = _tiles_plate(tmp_path)
    # Stage positions: tile 000001 offset by (16-6)*0.5um (scale=0.5) in x
    plate = open_ome_zarr(plate_path, mode="r")
    # name-based omero labels default to fov names; write Summary metadata
    px = 1.0  # default scale
    plate_rw = open_ome_zarr(plate_path)
    plate_rw.update_zattrs(
        {
            "Summary": {
                "StagePositions": [
                    {"Label": "A/1/000000", "DefaultXYStage": "XY", "XY": [0.0, 0.0]},
                    {"Label": "A/1/000001", "DefaultXYStage": "XY", "XY": [10.0 * px, 0.0]},
                ]
            }
        }
    )
    out_yml = tmp_path / "stitch_est.yml"
    result = CliRunner().invoke(
        cli,
        [
            "estimate-stitch",
            "-i", str(plate_path / "A/1/000000"), str(plate_path / "A/1/000001"),
            "-o", str(out_yml),
        ],
    )
    assert result.exit_code == 0, result.output
    with open(out_yml) as f:
        est = yaml.safe_load(f)
    tt = est["total_translation"]
    assert tt["A/1/000000"] == [0.0, 0.0, 0.0]
    assert tt["A/1/000001"][2] == 10.0


def test_estimate_stitch_cli_with_pcc(tmp_path):
    plate_path, _, overlap = _tiles_plate(tmp_path, overlap=8, tile=(1, 1, 2, 48, 48))
    plate_rw = open_ome_zarr(plate_path)
    # Deliberately wrong stage metadata; PCC should correct toward 40 px
    plate_rw.update_zattrs(
        {
            "Summary": {
                "StagePositions": [
                    {"Label": "A/1/000000", "DefaultXYStage": "XY", "XY": [0.0, 0.0]},
                    {"Label": "A/1/000001", "DefaultXYStage": "XY", "XY": [37.0, 0.0]},
                ]
            }
        }
    )
    out_yml = tmp_path / "stitch_pcc.yml"
    result = CliRunner().invoke(
        cli,
        [
            "estimate-stitch",
            "-i", str(plate_path / "A/1/000000"), str(plate_path / "A/1/000001"),
            "-o", str(out_yml),
            "--pcc-channel-name", "GFP",
        ],
    )
    assert result.exit_code == 0, result.output
    with open(out_yml) as f:
        est = yaml.safe_load(f)
    x_shift = est["total_translation"]["A/1/000001"][2]
    assert abs(x_shift - 40.0) < 1.5, est["total_translation"]


def test_estimate_then_stitch_2x2_grid(tmp_path):
    """Full flow on a 2x2 grid: stage-metadata estimate with PCC refinement →
    stitch; the assembled mosaic matches the ground truth it was cut from."""
    rng = np.random.default_rng(5)
    T, C, Z, tile, overlap = 1, 1, 2, 32, 8
    step = tile - overlap
    H = W = tile + step  # 2x2 grid extent
    mosaic = rng.uniform(10, 100, (T, C, Z, H, W)).astype(np.float32)

    plate_path = tmp_path / "grid.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    names, stage_positions = [], []
    for r in range(2):
        for c in range(2):
            name = f"{r:03d}{c:03d}"
            data = mosaic[..., r * step : r * step + tile, c * step : c * step + tile]
            plate.create_position("A", "1", name).create_image("0", data)
            names.append(f"A/1/{name}")
            # Stage metadata slightly off; PCC refinement should correct it
            jitter = rng.uniform(-1.0, 1.0, 2)
            stage_positions.append(
                {"Label": f"A/1/{name}", "DefaultXYStage": "XY",
                 "XY": [c * step + float(jitter[0]), r * step + float(jitter[1])]}
            )
    open_ome_zarr(plate_path).update_zattrs(
        {"Summary": {"StagePositions": stage_positions}}
    )

    est_yml = tmp_path / "est.yml"
    inputs = [str(plate_path / n) for n in names]
    result = CliRunner().invoke(
        cli,
        ["estimate-stitch", "-i", *inputs, "-o", str(est_yml),
         "--pcc-channel-name", "GFP"],
    )
    assert result.exit_code == 0, result.output
    with open(est_yml) as f:
        est = yaml.safe_load(f)
    # Refined translations recover the exact grid offsets
    base = np.asarray(est["total_translation"][names[0]])
    for i, n in enumerate(names):
        r, c = divmod(i, 2)
        got = np.asarray(est["total_translation"][n]) - base
        np.testing.assert_allclose(got, [0.0, r * step, c * step], atol=0.5)

    out_path = tmp_path / "stitched.zarr"
    result = CliRunner().invoke(
        cli,
        ["stitch", "-i", *inputs, "-c", str(est_yml), "-o", str(out_path)],
    )
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(out_path)["A/1/0"]
    stitched = out.data[0, 0].astype(np.float32)
    expected = mosaic[0, 0]
    assert stitched.shape == expected.shape
    err = np.abs(stitched[:, 2:-2, 2:-2] - expected[:, 2:-2, 2:-2])
    rel = err / np.abs(expected[:, 2:-2, 2:-2])
    assert np.median(rel) < 0.01

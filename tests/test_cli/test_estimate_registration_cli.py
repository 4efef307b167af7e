"""Round-trip: estimate-registration (beads) on two arms related by a known
translation, then register with the estimated YAML realigns the source
(reference: biahub/estimate_registration.py:437-453, biahub/register.py)."""

import numpy as np
import yaml
from click.testing import CliRunner
from scipy.ndimage import gaussian_filter

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr


def _bead_plate(tmp_path, name, data, channel):
    plate_path = tmp_path / name
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=[channel])
    pos = plate.create_position("A", "1", "0")
    pos.create_image(
        "0",
        data[:, None],
        transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))],
    )
    return plate_path


def test_estimate_registration_beads_then_register(tmp_path):
    rng = np.random.default_rng(11)
    shape = (16, 64, 64)
    pts = np.stack([rng.integers(6, s - 6, size=25) for s in shape], axis=1)
    target = np.zeros(shape, np.float32)
    target[pts[:, 0], pts[:, 1], pts[:, 2]] = 5000.0
    target = gaussian_filter(target, 1.0).astype(np.float32)
    drift = (2, -3, 4)
    source = np.roll(target, drift, axis=(0, 1, 2))

    target_plate = _bead_plate(tmp_path, "target.zarr", target[None], "Phase3D")
    source_plate = _bead_plate(tmp_path, "source.zarr", source[None], "GFP")

    config = {
        "target_channel_name": "Phase3D",
        "source_channel_name": "GFP",
        "estimation_method": "beads",
        "beads_match_settings": {
            "algorithm": "hungarian",
            "source_peaks_settings": {
                "threshold_abs": 50.0, "block_size": [8, 8, 8], "nms_distance": 4,
            },
            "target_peaks_settings": {
                "threshold_abs": 50.0, "block_size": [8, 8, 8], "nms_distance": 4,
            },
        },
        "affine_transform_settings": {"transform_type": "euclidean"},
    }
    config_path = tmp_path / "est_reg.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)

    out_yml = tmp_path / "registration.yml"
    result = CliRunner().invoke(
        cli,
        [
            "estimate-registration",
            "-s", str(source_plate / "A" / "1" / "0"),
            "-t", str(target_plate / "A" / "1" / "0"),
            "-c", str(config_path),
            "-o", str(out_yml),
            "--local",
        ],
    )
    assert result.exit_code == 0, result.output
    assert out_yml.exists()
    with open(out_yml) as f:
        reg = yaml.safe_load(f)
    M = np.asarray(reg["affine_transform_zyx"])
    assert M.shape == (4, 4)
    # Warping source by M must realign it onto target: out[q] = source[M q],
    # and source(q) = target(q - drift), so M's translation is +drift.
    np.testing.assert_allclose(M[:3, :3], np.eye(3), atol=0.05)
    np.testing.assert_allclose(M[:3, 3], drift, atol=0.35)

    # Apply with `register` and verify voxel alignment; keep_overhang avoids
    # the overlap crop so the output grid matches the target grid.
    reg["keep_overhang"] = True
    with open(out_yml, "w") as f:
        yaml.dump(reg, f)
    out_store = tmp_path / "registered.zarr"
    result = CliRunner().invoke(
        cli,
        [
            "register",
            "-s", str(source_plate / "A" / "1" / "0"),
            "-t", str(target_plate / "A" / "1" / "0"),
            "-c", str(out_yml),
            "-o", str(out_store),
            "--local",
        ],
    )
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(out_store)["A/1/0"]
    gfp = out.channel_names.index("GFP")
    registered = np.asarray(out.data[0, gfp])
    shp = registered.shape
    interior = tuple(slice(6, s - 6) for s in shp)
    tgt_crop = target[: shp[0], : shp[1], : shp[2]]
    err = np.abs(registered[interior] - tgt_crop[interior]).mean()
    base = np.abs(
        source[: shp[0], : shp[1], : shp[2]][interior] - tgt_crop[interior]
    ).mean()
    assert err < 0.2 * base, f"{err} !< 0.2*{base}"


def test_optimize_registration_refines_transform(tmp_path):
    """A deliberately-off initial transform is refined to the true one by the
    intensity optimizer behind optimize-registration
    (reference: biahub/optimize_registration.py:24-205)."""
    rng = np.random.default_rng(5)
    shape = (16, 48, 48)
    pts = np.stack([rng.integers(6, s - 6, size=30) for s in shape], axis=1)
    target = np.zeros(shape, np.float32)
    target[pts[:, 0], pts[:, 1], pts[:, 2]] = 100.0
    target = gaussian_filter(target, 2.0).astype(np.float32)
    drift = np.array([1.0, -2.0, 1.5])
    true = np.eye(4)
    true[:3, 3] = drift
    from scipy.ndimage import affine_transform as sp_affine

    inv = np.linalg.inv(true)
    source = sp_affine(target, inv[:3, :3], inv[:3, 3], order=1)

    target_plate = _bead_plate(tmp_path, "t.zarr", target[None], "Phase3D")
    source_plate = _bead_plate(tmp_path, "s.zarr", source[None], "GFP")

    initial = np.eye(4)
    initial[:3, 3] = drift + [0.6, 0.8, -0.7]  # off by up to 0.8 px
    config = {
        "source_channel_names": ["GFP"],
        "target_channel_name": "Phase3D",
        "affine_transform_zyx": initial.tolist(),
    }
    config_path = tmp_path / "reg_init.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)

    out_yml = tmp_path / "optimized.yml"
    result = CliRunner().invoke(
        cli,
        [
            "optimize-registration",
            "-s", str(source_plate / "A" / "1" / "0"),
            "-t", str(target_plate / "A" / "1" / "0"),
            "-c", str(config_path),
            "-o", str(out_yml),
        ],
    )
    assert result.exit_code == 0, result.output
    with open(out_yml) as f:
        opt = yaml.safe_load(f)
    M = np.asarray(opt["affine_transform_zyx"])
    init_err = np.abs(initial[:3, 3] - drift).max()
    opt_err = np.abs(M[:3, 3] - drift).max()
    assert opt_err < 0.5 * init_err, f"{opt_err} !< 0.5*{init_err}"
    np.testing.assert_allclose(M[:3, :3], np.eye(3), atol=0.02)


def test_estimate_registration_manual_from_point_files(tmp_path):
    """Manual method, headless: --source-points/--target-points files drive
    the reference's point-pair fit (reference:
    biahub/estimate_registration.py:60-358) and the output YAML registers
    the source onto the target."""
    rng = np.random.default_rng(23)
    shape = (8, 48, 48)
    target = rng.random(shape).astype(np.float32)
    drift = np.array([1.0, -3.0, 4.0])
    # Same voxel size both arms -> compound == identity; content moved by
    # +drift means matching features sit at target = source + drift.
    source = np.roll(target, tuple(int(d) for d in drift), axis=(0, 1, 2))

    target_plate = _bead_plate(tmp_path, "target.zarr", target[None], "Phase3D")
    source_plate = _bead_plate(tmp_path, "source.zarr", source[None], "GFP")

    src_pts = rng.uniform(2, 40, size=(5, 3))
    np.savetxt(tmp_path / "src_pts.csv", src_pts, delimiter=",")
    np.savetxt(tmp_path / "tgt_pts.csv", src_pts + drift, delimiter=",")

    config = {
        "target_channel_name": "Phase3D",
        "source_channel_name": "GFP",
        "estimation_method": "manual",
        "manual_registration_settings": {"time_index": 0},
        "affine_transform_settings": {"transform_type": "euclidean"},
    }
    config_path = tmp_path / "est_reg.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)

    out_yml = tmp_path / "registration.yml"
    result = CliRunner().invoke(
        cli,
        [
            "estimate-registration",
            "-s", str(source_plate / "A" / "1" / "0"),
            "-t", str(target_plate / "A" / "1" / "0"),
            "-c", str(config_path),
            "-o", str(out_yml),
            "--source-points", str(tmp_path / "src_pts.csv"),
            "--target-points", str(tmp_path / "tgt_pts.csv"),
        ],
    )
    assert result.exit_code == 0, result.output
    with open(out_yml) as f:
        loaded = yaml.safe_load(f)
    M = np.asarray(loaded["affine_transform_zyx"])
    expected = np.eye(4)
    expected[:3, 3] = -drift  # output->input warp translation is -motion
    np.testing.assert_allclose(M, expected, atol=1e-6)


def test_estimate_registration_manual_headless_without_points_errors(tmp_path):
    """Without point files and without napari, manual mode fails with an
    actionable message naming the headless flags."""
    target = np.zeros((4, 16, 16), np.float32)
    target_plate = _bead_plate(tmp_path, "t2.zarr", target[None], "Phase3D")
    source_plate = _bead_plate(tmp_path, "s2.zarr", target[None], "GFP")
    config = {
        "target_channel_name": "Phase3D",
        "source_channel_name": "GFP",
        "estimation_method": "manual",
    }
    config_path = tmp_path / "cfg.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    result = CliRunner().invoke(
        cli,
        [
            "estimate-registration",
            "-s", str(source_plate / "A" / "1" / "0"),
            "-t", str(target_plate / "A" / "1" / "0"),
            "-c", str(config_path),
            "-o", str(tmp_path / "out.yml"),
        ],
    )
    assert result.exit_code != 0
    assert "--source-points" in result.output


def test_load_points_handles_napari_export(tmp_path):
    """napari's 'Save Points layer' CSV (header + index column) loads
    identically to a bare numeric file (round-3 review finding)."""
    from biahub_tpu.estimate_registration import _load_points

    pts = np.array([[1.0, 2.5, 3.0], [4.0, 5.0, 6.5], [7.0, 8.0, 9.0]])
    bare = tmp_path / "bare.csv"
    np.savetxt(bare, pts, delimiter=",")
    napari_style = tmp_path / "napari.csv"
    with open(napari_style, "w") as f:
        f.write("index,axis-0,axis-1,axis-2\n")
        for i, p in enumerate(pts):
            f.write(f"{i},{p[0]},{p[1]},{p[2]}\n")
    np.testing.assert_array_equal(_load_points(bare), pts)
    np.testing.assert_array_equal(_load_points(napari_style), pts)


def test_registration_from_point_pairs_default_is_round2_compatible():
    """The default source_points_frame is 'original' (round-2 semantics):
    raw-frame points are composed with the compound pre-alignment."""
    from biahub_tpu.estimate_registration import (
        manual_compound_affine,
        registration_from_point_pairs,
    )

    kwargs = dict(
        source_shape_zyx=(12, 40, 40),
        target_shape_zyx=(12, 40, 40),
        source_voxel_size=(2.0, 0.5, 0.5),
        target_voxel_size=(1.0, 0.5, 0.5),
    )
    compound = manual_compound_affine(
        kwargs["source_shape_zyx"], kwargs["target_shape_zyx"],
        kwargs["source_voxel_size"], kwargs["target_voxel_size"],
    )
    rng = np.random.default_rng(7)
    src_orig = rng.uniform(2, 30, size=(6, 3))
    pre = (compound @ np.hstack([src_orig, np.ones((6, 1))]).T).T[:, :3]
    dst = pre + [0.5, -1.0, 2.0]
    default = registration_from_point_pairs(src_orig, dst, **kwargs)
    explicit = registration_from_point_pairs(
        src_orig, dst, source_points_frame="original", **kwargs
    )
    np.testing.assert_allclose(default, explicit, atol=0)

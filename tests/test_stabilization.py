"""Round-trip tests: estimate drift → apply stabilization → frames align.

This is the strongest correctness check for sign/axis conventions: a
synthetic timelapse with known integer drifts must come back aligned.
"""

import numpy as np
import yaml
from click.testing import CliRunner
from scipy.ndimage import shift as nd_shift

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr
from biahub_tpu.kernels.fft import phase_cross_corr, subpixel_shift_2d
from biahub_tpu.kernels.focus import focus_from_transverse_band
from biahub_tpu.registration.utils import evaluate_transforms


def _blob_volume(shape=(12, 48, 48), seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    pts = np.stack(
        [rng.integers(min(3, s // 2), max(s - 3, s // 2 + 1), size=12) for s in shape],
        axis=1,
    )
    vol[pts[:, 0], pts[:, 1], pts[:, 2]] = 100.0
    # Blur so subpixel interpolation is well-behaved
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(vol, 1.2).astype(np.float32)


def test_phase_cross_corr_recovers_known_shift():
    # Convention: phase_cross_corr(ref, mov) returns MINUS the content motion
    # of mov relative to ref (mov(x) == ref(x + shift)).
    vol = _blob_volume()
    moved = np.roll(vol, (2, -3, 4), axis=(0, 1, 2))
    shift, _ = phase_cross_corr(vol, moved)
    np.testing.assert_array_equal(shift, [-2, 3, -4])


def test_subpixel_shift_2d():
    img = _blob_volume((1, 64, 64))[0]
    moved = nd_shift(img, (1.5, -2.25), order=1)
    est = subpixel_shift_2d(img, moved)
    assert abs(est[0] + 1.5) < 0.3
    assert abs(est[1] - 2.25) < 0.3


def test_focus_from_transverse_band():
    # Sharpest slice (high-frequency content) is the focus
    rng = np.random.default_rng(1)
    Z = 9
    focus_z = 4
    vol = np.zeros((Z, 64, 64), np.float32)
    sharp = rng.random((64, 64)).astype(np.float32)
    from scipy.ndimage import gaussian_filter

    for z in range(Z):
        blur = abs(z - focus_z) * 1.2 + 0.1
        vol[z] = gaussian_filter(sharp, blur)
    assert focus_from_transverse_band(vol, pixel_size=0.1) == focus_z
    # Degenerate volume -> 0
    assert focus_from_transverse_band(np.zeros((5, 16, 16)), pixel_size=0.1) == 0


def test_evaluate_transforms_interpolates_outlier():
    transforms = [np.eye(4).tolist() for _ in range(12)]
    bad = np.eye(4)
    bad[0, 3] = 500.0
    transforms[7] = bad.tolist()
    out = evaluate_transforms(
        transforms,
        shape_zyx=(10, 50, 50),
        validation_window_size=4,
        validation_tolerance=10.0,
        interpolation_window_size=3,
    )
    assert abs(np.asarray(out[7])[0, 3]) < 1.0


def _drifting_plate(tmp_path, drifts):
    """Plate with one position whose frames drift by known integer offsets."""
    base = _blob_volume()
    T = len(drifts)
    data = np.stack(
        [np.roll(base, tuple(d), axis=(0, 1, 2)) for d in drifts]
    )[:, None]  # (T, 1, Z, Y, X)
    plate_path = tmp_path / "drift.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    pos = plate.create_position("A", "1", "0")
    pos.create_image(
        "0", data, transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))]
    )
    return plate_path


def test_estimate_then_stabilize_roundtrip_pcc(tmp_path):
    drifts = [(0, 0, 0), (1, 2, -1), (2, -2, 3), (0, 4, 2)]
    plate_path = _drifting_plate(tmp_path, drifts)

    config = {
        "stabilization_estimation_channel": "GFP",
        "stabilization_channels": ["GFP"],
        "stabilization_type": "xyz",
        "stabilization_method": "phase-cross-corr",
        "phase_cross_corr_settings": {
            "t_reference": "first",
            "center_crop_xy": None,
        },
    }
    config_path = tmp_path / "est.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)

    est_dir = tmp_path / "stab_est"
    result = CliRunner().invoke(
        cli,
        [
            "estimate-stabilization",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-o", str(est_dir),
            "-c", str(config_path),
            "--local",
        ],
    )
    assert result.exit_code == 0, result.output
    settings_yml = est_dir / "xyz_stabilization_settings" / "A_1_0.yml"
    assert settings_yml.exists()
    with open(settings_yml) as f:
        stab = yaml.safe_load(f)
    mats = np.asarray(stab["affine_transform_zyx_list"])
    assert mats.shape == (4, 4, 4)

    # Apply and verify alignment to t=0
    out_path = tmp_path / "stabilized.zarr"
    result = CliRunner().invoke(
        cli,
        [
            "stabilize",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-o", str(out_path),
            "-c", str(settings_yml),
        ],
    )
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(out_path)["A/1/0"].data[...]
    ref = out[0, 0]
    for t in range(1, 4):
        # Interior comparison (edges are fill)
        interior = (slice(3, -3), slice(5, -5), slice(5, -5))
        err = np.abs(out[t, 0][interior] - ref[interior]).mean()
        base_err = np.abs(
            open_ome_zarr(plate_path)["A/1/0"].data[t, 0][interior] - ref[interior]
        ).mean()
        assert err < 0.25 * base_err, f"t={t}: {err} !< 0.25*{base_err}"


def test_estimate_stabilization_focus_finding_z(tmp_path):
    # Frames drift only in z; focus-finding should recover the z offsets
    base = _blob_volume((14, 48, 48))
    drifts = [(0, 0, 0), (2, 0, 0), (3, 0, 0)]
    plate_path = _drifting_plate(tmp_path, drifts)

    config = {
        "stabilization_estimation_channel": "GFP",
        "stabilization_channels": ["GFP"],
        "stabilization_type": "z",
        "stabilization_method": "focus-finding",
        "focus_finding_settings": {"center_crop_xy": [40, 40]},
    }
    config_path = tmp_path / "est_z.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)

    est_dir = tmp_path / "z_est"
    result = CliRunner().invoke(
        cli,
        [
            "estimate-stabilization",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-o", str(est_dir),
            "-c", str(config_path),
            "--local",
        ],
    )
    assert result.exit_code == 0, result.output
    assert (est_dir / "positions_focus.csv").exists()
    assert (est_dir / "z_stabilization_settings" / "A_1_0.yml").exists()


def test_stabilize_general_3d_matrices(tmp_path):
    """General (z-coupled) per-timepoint affines run the batched multipass
    kernel; the output must match scipy's affine_transform per frame."""
    from scipy.ndimage import affine_transform
    from scipy.spatial.transform import Rotation

    base = _blob_volume(shape=(16, 40, 40))
    data = np.stack([base, base])[:, None]  # (T=2, C=1, Z, Y, X)
    plate_path = tmp_path / "general.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    pos = plate.create_position("A", "1", "0")
    pos.create_image(
        "0", data, transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))]
    )

    mats = [np.eye(4), np.eye(4)]
    R3 = Rotation.from_euler("xyz", [5, -3, 7], degrees=True).as_matrix()
    mats[1][:3, :3] = R3
    mats[1][:3, 3] = [0.5, -1.0, 1.5]

    config = {
        "affine_transform_zyx_list": [m.tolist() for m in mats],
        "time_indices": "all",
        "stabilization_estimation_channel": "GFP",
        "stabilization_channels": ["GFP"],
        "stabilization_type": "xyz",
        "stabilization_method": "phase-cross-corr",
    }
    config_path = tmp_path / "stab.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)

    out_path = tmp_path / "stabilized.zarr"
    result = CliRunner().invoke(
        cli,
        [
            "stabilize",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-o", str(out_path),
            "-c", str(config_path),
        ],
    )
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(out_path)["A/1/0"].data[...]
    for t, M in enumerate(mats):
        r1 = affine_transform(base, M[:3, :3], M[:3, 3], order=1, mode="constant")
        r3 = affine_transform(base, M[:3, :3], M[:3, 3], order=3, mode="constant")
        # On bead-like data every interpolator disagrees; the multipass warp
        # must stay within the order-1 <-> order-3 interpolator spread.
        band = max(np.abs(r1 - r3).max(), 1e-6)
        d = np.abs(out[t, 0] - r1)
        assert d.max() <= 1.1 * band, f"t={t}: {d.max()} vs band {band}"
        assert d.mean() <= np.abs(r1).max() * 2e-3


def test_estimate_stabilization_beads_roundtrip(tmp_path):
    """Beads method: frames with drifting bead fields → per-t matrices that
    realign them (reference: biahub/estimate_stabilization.py:1393-1443)."""
    rng = np.random.default_rng(3)
    shape = (16, 64, 64)
    n_beads = 25
    pts = np.stack([rng.integers(4, s - 4, size=n_beads) for s in shape], axis=1)
    base = np.zeros(shape, np.float32)
    base[pts[:, 0], pts[:, 1], pts[:, 2]] = 5000.0
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(base, 1.0).astype(np.float32)

    drifts = [(0, 0, 0), (1, 3, -2), (2, -2, 4)]
    data = np.stack(
        [np.roll(base, tuple(d), axis=(0, 1, 2)) for d in drifts]
    )[:, None]
    plate_path = tmp_path / "beads.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    pos = plate.create_position("A", "1", "0")
    pos.create_image(
        "0", data, transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))]
    )

    config = {
        "stabilization_estimation_channel": "GFP",
        "stabilization_channels": ["GFP"],
        "stabilization_type": "xyz",
        "stabilization_method": "beads",
        "beads_match_settings": {
            "algorithm": "hungarian",
            # nms_distance default (16) is tuned for 2048-px FOVs; the test
            # image is 64 px with ~10 px bead spacing.
            "source_peaks_settings": {
                "threshold_abs": 50.0, "block_size": [8, 8, 8], "nms_distance": 4,
            },
            "target_peaks_settings": {
                "threshold_abs": 50.0, "block_size": [8, 8, 8], "nms_distance": 4,
            },
        },
        "affine_transform_settings": {
            "transform_type": "euclidean",
            "t_reference": "first",
        },
    }
    config_path = tmp_path / "est_beads.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)

    est_dir = tmp_path / "beads_est"
    result = CliRunner().invoke(
        cli,
        [
            "estimate-stabilization",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-o", str(est_dir),
            "-c", str(config_path),
            "--local",
        ],
    )
    assert result.exit_code == 0, result.output
    settings_yml = est_dir / "xyz_stabilization_settings.yml"
    assert settings_yml.exists()
    with open(settings_yml) as f:
        stab = yaml.safe_load(f)
    mats = np.asarray(stab["affine_transform_zyx_list"])
    assert mats.shape == (3, 4, 4)
    # Warping frame t by mats[t] must realign it to t=0: the translation part
    # equals the drift (output->input coords; frame t content moved by +d).
    for t, d in enumerate(drifts):
        np.testing.assert_allclose(mats[t][:3, :3], np.eye(3), atol=0.05)
        np.testing.assert_allclose(mats[t][:3, 3], d, atol=0.35, err_msg=f"t={t}")


def test_stabilize_inplane_matrices(tmp_path, monkeypatch):
    """Z-decoupled per-timepoint affines run the batched in-plane kernel
    (Pallas on TPU; forced interpret here) and match scipy per frame."""
    from scipy.ndimage import affine_transform

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    base = _blob_volume(shape=(8, 40, 40))
    data = np.stack([base, base])[:, None]
    plate_path = tmp_path / "inplane.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    pos = plate.create_position("A", "1", "0")
    pos.create_image(
        "0", data, transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))]
    )

    theta = np.deg2rad(7.0)
    mats = [np.eye(4), np.eye(4)]
    mats[1][1:3, 1:3] = 1.02 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    mats[1][:3, 3] = [0.5, -1.0, 1.5]

    config = {
        "affine_transform_zyx_list": [m.tolist() for m in mats],
        "time_indices": "all",
        "stabilization_estimation_channel": "GFP",
        "stabilization_channels": ["GFP"],
        "stabilization_type": "xyz",
        "stabilization_method": "phase-cross-corr",
    }
    config_path = tmp_path / "stab.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)

    out_path = tmp_path / "stabilized.zarr"
    result = CliRunner().invoke(
        cli,
        [
            "stabilize",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-o", str(out_path),
            "-c", str(config_path),
        ],
    )
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(out_path)["A/1/0"].data[...]
    from biahub_tpu.kernels.affine import inplane_affine_warp_zyx

    for t, M in enumerate(mats):
        # Bit-level agreement with the single-matrix in-plane path
        ref_ip = np.asarray(
            inplane_affine_warp_zyx(base, M.astype(np.float32), base.shape)
        )
        np.testing.assert_allclose(out[t, 0], ref_ip, atol=1e-5)
        # scipy parity within the order-1<->order-3 interpolator spread
        # (shear-factored passes differ at second order on sparse blobs)
        r1 = affine_transform(base, M[:3, :3], M[:3, 3], order=1, mode="constant")
        r3 = affine_transform(base, M[:3, :3], M[:3, 3], order=3, mode="constant")
        band = max(np.abs(r1 - r3).max(), 1e-6)
        assert np.abs(out[t, 0] - r1).max() <= 1.1 * band, f"t={t}"


def test_estimate_stabilization_xy_roundtrip(tmp_path):
    """XY method (the reference's pystackreg role): in-plane drifts recovered
    from focus-slice registration, then stabilize realigns the frames."""
    from scipy.ndimage import gaussian_filter

    # Volume with one clearly sharpest plane so focus finding is stable
    rng = np.random.default_rng(6)
    sharp = gaussian_filter(
        (rng.random((48, 48)) > 0.995).astype(np.float32) * 100.0, 1.0
    )
    base = np.stack(
        [gaussian_filter(sharp, abs(z - 6) * 1.2 + 0.1) for z in range(12)]
    ).astype(np.float32)
    drifts = [(0, 0, 0), (0, 3, -2), (0, -2, 4)]
    data = np.stack(
        [np.roll(base, tuple(d), axis=(0, 1, 2)) for d in drifts]
    )[:, None]
    plate_path = tmp_path / "xydrift.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    pos = plate.create_position("A", "1", "0")
    pos.create_image(
        "0", data, transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))]
    )

    config = {
        "stabilization_estimation_channel": "GFP",
        "stabilization_channels": ["GFP"],
        "stabilization_type": "xy",
        "stabilization_method": "focus-finding",
        "stack_reg_settings": {
            "center_crop_xy": [40, 40],
            "t_reference": "first",
        },
    }
    config_path = tmp_path / "est_xy.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)

    est_dir = tmp_path / "xy_est"
    result = CliRunner().invoke(
        cli,
        [
            "estimate-stabilization",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-o", str(est_dir),
            "-c", str(config_path),
            "--local",
        ],
    )
    assert result.exit_code == 0, result.output
    settings_yml = est_dir / "xy_stabilization_settings" / "A_1_0.yml"
    assert settings_yml.exists()
    with open(settings_yml) as f:
        stab = yaml.safe_load(f)
    mats = np.asarray(stab["affine_transform_zyx_list"])
    assert mats.shape == (3, 4, 4)
    for t, d in enumerate(drifts):
        np.testing.assert_allclose(
            mats[t][1:3, 3], d[1:], atol=0.6, err_msg=f"t={t}"
        )


def test_stabilize_oversized_volume_chunks(tmp_path, monkeypatch):
    """Over-budget volumes run the chunked per-unit warp path; integer
    translations are exact against the batched path."""
    from scipy.ndimage import affine_transform

    base = _blob_volume(shape=(8, 32, 32))
    data = np.stack([base, base])[:, None]
    plate_path = tmp_path / "big.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    pos = plate.create_position("A", "1", "0")
    pos.create_image(
        "0", data, transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))]
    )

    mats = [np.eye(4), np.eye(4)]
    mats[1][:3, 3] = [1.0, -2.0, 1.0]
    config = {
        "affine_transform_zyx_list": [m.tolist() for m in mats],
        "time_indices": "all",
        "stabilization_estimation_channel": "GFP",
        "stabilization_channels": ["GFP"],
        "stabilization_type": "xyz",
        "stabilization_method": "phase-cross-corr",
    }
    config_path = tmp_path / "stab.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)

    monkeypatch.setenv("BIAHUB_TPU_MAX_BATCH_BYTES", "4096")
    out_path = tmp_path / "stabilized.zarr"
    result = CliRunner().invoke(
        cli,
        ["stabilize", "-i", str(plate_path / "A" / "1" / "0"),
         "-o", str(out_path), "-c", str(config_path)],
    )
    assert result.exit_code == 0, result.output
    assert "chunks" in result.output
    out = open_ome_zarr(out_path)["A/1/0"].data[...]
    for t, M in enumerate(mats):
        ref = affine_transform(base, M[:3, :3], M[:3, 3], order=1, mode="constant")
        np.testing.assert_allclose(out[t, 0], ref, atol=1e-4, err_msg=f"t={t}")


def test_estimate_stabilization_xyz_focus_finding_composes(tmp_path):
    """stabilization_type=xyz with focus-finding composes the z (focus) and
    xy (stack-registration) transforms per timepoint
    (reference: biahub/estimate_stabilization.py:1317-1330)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(9)
    sharp = gaussian_filter(
        (rng.random((48, 48)) > 0.995).astype(np.float32) * 100.0, 1.0
    )
    base = np.stack(
        [gaussian_filter(sharp, abs(z - 6) * 1.2 + 0.1) for z in range(12)]
    ).astype(np.float32)
    drifts = [(0, 0, 0), (1, 3, -2), (2, -2, 4)]
    data = np.stack(
        [np.roll(base, tuple(d), axis=(0, 1, 2)) for d in drifts]
    )[:, None]
    plate_path = tmp_path / "xyzdrift.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    pos = plate.create_position("A", "1", "0")
    pos.create_image(
        "0", data, transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))]
    )

    config = {
        "stabilization_estimation_channel": "GFP",
        "stabilization_channels": ["GFP"],
        "stabilization_type": "xyz",
        "stabilization_method": "focus-finding",
        "focus_finding_settings": {"center_crop_xy": [40, 40],
                                   "average_across_wells": False},
        "stack_reg_settings": {"center_crop_xy": [40, 40], "t_reference": "first"},
    }
    config_path = tmp_path / "est.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)

    est_dir = tmp_path / "xyz_ff"
    result = CliRunner().invoke(
        cli,
        ["estimate-stabilization", "-i", str(plate_path / "A" / "1" / "0"),
         "-o", str(est_dir), "-c", str(config_path), "--local"],
    )
    assert result.exit_code == 0, result.output
    settings_yml = est_dir / "xyz_stabilization_settings" / "A_1_0.yml"
    assert settings_yml.exists()
    with open(settings_yml) as f:
        stab = yaml.safe_load(f)
    mats = np.asarray(stab["affine_transform_zyx_list"])
    assert mats.shape == (3, 4, 4)
    # Composed: z from focus finding (integer focus drift), yx from PCC
    for t, d in enumerate(drifts):
        np.testing.assert_allclose(mats[t][0, 3], d[0], atol=0.5, err_msg=f"t={t} z")
        np.testing.assert_allclose(mats[t][1:3, 3], d[1:], atol=0.7, err_msg=f"t={t} yx")

"""End-to-end pipeline composition: flat-field → deskew → estimate-stabilization
→ stabilize, chained through the real CLI on one synthetic light-sheet plate.

This is the timelapse reconstruction order the Nextflow pipeline wires
(reference: nextflow/, biahub/deskew.py, biahub/estimate_stabilization.py);
each step consumes the previous step's store.
"""

import numpy as np
import yaml
from click.testing import CliRunner
from scipy.ndimage import gaussian_filter

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr
from biahub_tpu.kernels.deskew import get_deskewed_data_shape

LS_ANGLE = 36.0
PX_TO_SCAN = 0.5


def _raw_plate(tmp_path):
    """Skewed acquisition: blobs + a smooth flat-field gain, drifting over T."""
    rng = np.random.default_rng(3)
    shape = (12, 32, 48)  # (Z=scan, Y, X)
    base = np.zeros(shape, np.float32)
    pts = np.stack([rng.integers(3, s - 3, size=15) for s in shape], axis=1)
    base[pts[:, 0], pts[:, 1], pts[:, 2]] = 100.0
    base = gaussian_filter(base, 1.2) + 10.0  # nonzero background: the
    # flat-field median pattern needs real signal everywhere

    # Multiplicative shading along Y (what flat-field divides out)
    gain = 0.6 + 0.8 * np.linspace(0, 1, shape[1], dtype=np.float32)[None, :, None]

    # X-only drift: raw X maps to the deskewed Y axis one-to-one, so the
    # estimated stabilization must recover it exactly
    drifts = [(0, 0, 0), (0, 0, -3), (0, 0, 2)]
    data = np.stack(
        [np.roll(base, d, axis=(0, 1, 2)) * gain for d in drifts]
    )[:, None]

    plate_path = tmp_path / "raw.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    pos = plate.create_position("A", "1", "0")
    pos.create_image(
        "0",
        data.astype(np.float32),
        transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))],
    )
    return plate_path


def test_pipeline_flatfield_deskew_stabilize(tmp_path):
    runner = CliRunner()
    raw = _raw_plate(tmp_path)

    # 1. flat-field
    ff_cfg = tmp_path / "ff.yml"
    with open(ff_cfg, "w") as f:
        yaml.dump({"channel_names": ["GFP"]}, f)
    ff_out = tmp_path / "ff.zarr"
    r = runner.invoke(
        cli,
        ["flat-field", "-i", str(raw / "A/1/0"), "-c", str(ff_cfg),
         "-o", str(ff_out), "--cluster", "debug"],
    )
    assert r.exit_code == 0, r.output
    ff = open_ome_zarr(ff_out)["A/1/0"].data[...]
    # Shading removed: Y-profile flat to ~15% (was 2.3x edge-to-edge)
    prof = ff[0, 0].mean(axis=(0, 2))
    assert prof.max() / max(prof.min(), 1e-6) < 1.4

    # 2. deskew
    dk_cfg = tmp_path / "deskew.yml"
    with open(dk_cfg, "w") as f:
        yaml.dump(
            {
                "pixel_size_um": 0.116,
                "ls_angle_deg": LS_ANGLE,
                "px_to_scan_ratio": PX_TO_SCAN,
                "keep_overhang": True,
                "average_n_slices": 1,
            },
            f,
        )
    dk_out = tmp_path / "deskewed.zarr"
    r = runner.invoke(
        cli,
        ["deskew", "-i", str(ff_out / "A/1/0"), "-c", str(dk_cfg),
         "-o", str(dk_out), "--cluster", "debug"],
    )
    assert r.exit_code == 0, r.output
    deskewed = open_ome_zarr(dk_out)["A/1/0"]
    expected_shape, _ = get_deskewed_data_shape(
        (12, 32, 48), LS_ANGLE, PX_TO_SCAN, keep_overhang=True
    )
    assert tuple(deskewed.data.shape[-3:]) == tuple(expected_shape)

    # 3. estimate-stabilization (xyz PCC, reference frame = first)
    est_cfg = tmp_path / "est.yml"
    with open(est_cfg, "w") as f:
        yaml.dump(
            {
                "stabilization_estimation_channel": "GFP",
                "stabilization_channels": ["GFP"],
                "stabilization_type": "xyz",
                "stabilization_method": "phase-cross-corr",
                "phase_cross_corr_settings": {
                    "t_reference": "first",
                    "center_crop_xy": None,
                },
            },
            f,
        )
    est_dir = tmp_path / "est"
    r = runner.invoke(
        cli,
        ["estimate-stabilization", "-i", str(dk_out / "A/1/0"),
         "-o", str(est_dir), "-c", str(est_cfg), "--local"],
    )
    assert r.exit_code == 0, r.output
    stab_yml = est_dir / "xyz_stabilization_settings" / "A_1_0.yml"
    assert stab_yml.exists()

    # 4. stabilize
    stab_out = tmp_path / "stabilized.zarr"
    r = runner.invoke(
        cli,
        ["stabilize", "-i", str(dk_out / "A/1/0"), "-o", str(stab_out),
         "-c", str(stab_yml)],
    )
    assert r.exit_code == 0, r.output
    out = open_ome_zarr(stab_out)["A/1/0"].data[...]

    # Frames align to t=0 much better than the unstabilized deskewed frames
    ref = out[0, 0]
    interior = (slice(2, -2), slice(4, -4), slice(4, -4))
    for t in range(1, 3):
        err = np.abs(out[t, 0][interior] - ref[interior]).mean()
        base_err = np.abs(
            np.asarray(deskewed.data[t, 0])[interior] - ref[interior]
        ).mean()
        assert err < 0.5 * base_err, f"t={t}: {err} !< 0.5*{base_err}"

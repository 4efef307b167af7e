"""Tests of ``biahub fuse``: fused-chain parity with the standalone verbs.

The fused pipeline must be indistinguishable (to warp tolerance) from
running the stages' kernels sequentially; these tests pin that contract on
tiny volumes, plus the CLI surface (--init RESOURCES line, resume records,
PSF requirement).
"""

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr

LS_ANGLE, PX_TO_SCAN = 36.0, 0.387


def _gaussian_psf(shape=(3, 5, 5), sigma=1.0):
    zz, yy, xx = np.meshgrid(
        *[np.arange(s) - (s - 1) / 2 for s in shape], indexing="ij"
    )
    psf = np.exp(-(zz**2 + yy**2 + xx**2) / (2 * sigma**2)).astype(np.float32)
    return psf / psf.sum()


@pytest.fixture
def psf_store(tmp_path):
    psf_path = tmp_path / "psf.zarr"
    plate = open_ome_zarr(psf_path, layout="hcs", mode="w", channel_names=["PSF"])
    pos = plate.create_position("0", "0", "0")
    pos.create_image(
        "0",
        _gaussian_psf()[None, None],
        transform=[TransformationMeta(type="scale", scale=(1, 1, 1.0, 0.116, 0.116))],
    )
    return psf_path


def _fuse_config(tmp_path, name="fuse.yml", **stages):
    cfg = {
        "deskew": {
            "pixel_size_um": 0.116,
            "ls_angle_deg": LS_ANGLE,
            "px_to_scan_ratio": PX_TO_SCAN,
            "keep_overhang": False,
            "average_n_slices": 1,
        },
        **stages,
    }
    path = tmp_path / name
    path.write_text(yaml.safe_dump(cfg))
    return path


def _naive_chain(vol, tf_half=None, reg=1e-3, matrix=None, out_shape=None):
    """Reference composition: standalone verb kernels run sequentially."""
    from biahub_tpu.kernels.affine import affine_warp_auto
    from biahub_tpu.kernels.deconvolve import deconvolve_zyx
    from biahub_tpu.kernels.deskew import deskew_zyx

    d = vol
    if tf_half is not None:
        d = np.asarray(deconvolve_zyx(d, tf_half, regularization_strength=reg))
    d = np.asarray(
        deskew_zyx(
            d, ls_angle_deg=LS_ANGLE, px_to_scan_ratio=PX_TO_SCAN,
            keep_overhang=False, average_window=1,
        )
    )
    if matrix is not None:
        d = np.asarray(
            affine_warp_auto(d, matrix, out_shape if out_shape else d.shape)
        )
    return d


def test_fuse_deconvolve_deskew_register_matches_sequential(
    example_plate, psf_store, tmp_path
):
    plate_path, _ = example_plate
    matrix = np.eye(4)
    matrix[:3, 3] = [0.0, -1.0, 1.5]
    config = _fuse_config(
        tmp_path,
        deconvolve={"regularization_strength": 0.001},
        registration={"affine_transform_zyx": matrix.tolist()},
    )
    output_path = tmp_path / "fused.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "fuse",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-p", str(psf_store),
            "-c", str(config),
            "-o", str(output_path),
            "--cluster", "debug",
        ],
    )
    assert result.exit_code == 0, result.output
    assert (tmp_path / "transfer_function.zarr").exists()

    in_pos = open_ome_zarr(plate_path)["A/1/0"]
    out_pos = open_ome_zarr(output_path)["A/1/0"]
    tf = open_ome_zarr(tmp_path / "transfer_function.zarr").data[0, 0]
    X = in_pos.data.shape[-1]
    expected = _naive_chain(
        np.asarray(in_pos.data[1, 2], np.float32),
        tf_half=tf[..., : X // 2 + 1],
        matrix=matrix,
    )
    np.testing.assert_allclose(
        out_pos.data[1, 2], expected, atol=1e-4, rtol=1e-4
    )
    # Provenance stamp
    assert "biahub-fuse" in out_pos.zattrs


def test_fuse_deskew_stabilize_per_timepoint(example_plate_2, tmp_path):
    plate_path, _ = example_plate_2
    mats = []
    for t in range(3):
        m = np.eye(4)
        m[:3, 3] = [0.0, 0.5 * t, -0.5 * t]
        mats.append(m)
    config = _fuse_config(
        tmp_path,
        stabilization={"affine_transform_zyx_list": [m.tolist() for m in mats]},
    )
    output_path = tmp_path / "fused_stab.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "fuse",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-c", str(config),
            "-o", str(output_path),
            "--cluster", "debug",
        ],
    )
    assert result.exit_code == 0, result.output
    in_pos = open_ome_zarr(plate_path)["A/1/0"]
    out_pos = open_ome_zarr(output_path)["A/1/0"]
    for t in range(3):
        expected = _naive_chain(
            np.asarray(in_pos.data[t, 0], np.float32), matrix=mats[t]
        )
        np.testing.assert_allclose(
            out_pos.data[t, 0], expected, atol=1e-4, rtol=1e-4
        )


def test_fuse_pallas_path_matches_sequential(
    example_plate, psf_store, tmp_path, monkeypatch
):
    """The fused Pallas chain (interpret mode in CI) equals the XLA path."""
    import jax

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    jax.clear_caches()
    plate_path, _ = example_plate
    matrix = np.eye(4)
    matrix[:3, 3] = [0.0, -1.0, 1.5]
    config = _fuse_config(
        tmp_path,
        deconvolve={"regularization_strength": 0.001},
        registration={"affine_transform_zyx": matrix.tolist()},
    )
    output_path = tmp_path / "fused_pallas.zarr"
    result = CliRunner().invoke(
        cli,
        [
            "fuse",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-p", str(psf_store),
            "-c", str(config),
            "-o", str(output_path),
            "--cluster", "debug",
        ],
    )
    assert result.exit_code == 0, result.output
    monkeypatch.delenv("BIAHUB_TPU_FORCE_PALLAS")
    jax.clear_caches()

    in_pos = open_ome_zarr(plate_path)["A/1/0"]
    out_pos = open_ome_zarr(output_path)["A/1/0"]
    tf = open_ome_zarr(tmp_path / "transfer_function.zarr").data[0, 0]
    X = in_pos.data.shape[-1]
    expected = _naive_chain(
        np.asarray(in_pos.data[0, 1], np.float32),
        tf_half=tf[..., : X // 2 + 1],
        matrix=matrix,
    )
    # Pallas-vs-XLA parity: the fused FFT's bf16-split dots carry a ~2e-5
    # relative-to-peak envelope (kernels/pallas_fft.py), and the plate data
    # is 0..255 with deconvolution gain — tolerance scales with the data.
    scale = float(np.abs(expected).max())
    np.testing.assert_allclose(
        out_pos.data[0, 1], expected, atol=1e-4 * scale
    )
    jax.clear_caches()


def test_fuse_flat_field_prefix_and_channel_selection(example_plate_2, tmp_path):
    """flat_field stage: selected channel corrected then deskewed; the other
    channel runs the remaining chain on the RAW data."""
    from biahub_tpu.kernels.deskew import deskew_zyx
    from biahub_tpu.kernels.flat_field import flat_field_zyx

    plate_path, _ = example_plate_2
    config = _fuse_config(
        tmp_path, flat_field={"channel_names": ["GFP"]}
    )
    output_path = tmp_path / "fused_ff.zarr"
    result = CliRunner().invoke(
        cli,
        [
            "fuse",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-c", str(config),
            "-o", str(output_path),
            "--cluster", "debug",
        ],
    )
    assert result.exit_code == 0, result.output
    in_pos = open_ome_zarr(plate_path)["A/1/0"]
    out_pos = open_ome_zarr(output_path)["A/1/0"]

    def deskewed(v):
        return np.asarray(
            deskew_zyx(
                v, ls_angle_deg=LS_ANGLE, px_to_scan_ratio=PX_TO_SCAN,
                keep_overhang=False, average_window=1,
            )
        )

    raw = np.asarray(in_pos.data[0, 0], np.float32)
    np.testing.assert_allclose(
        out_pos.data[0, 0],
        deskewed(np.asarray(flat_field_zyx(raw))),
        atol=1e-4, rtol=1e-4,
    )
    raw_other = np.asarray(in_pos.data[0, 1], np.float32)
    np.testing.assert_allclose(
        out_pos.data[0, 1], deskewed(raw_other), atol=1e-4, rtol=1e-4
    )


def test_fuse_flat_field_only_copies_other_channels(example_plate_2, tmp_path):
    """flat_field as the only stage: non-selected channels are copied."""
    from biahub_tpu.kernels.flat_field import flat_field_zyx

    plate_path, _ = example_plate_2
    config = tmp_path / "ff_only.yml"
    config.write_text(yaml.safe_dump({"flat_field": {"channel_names": ["RFP"]}}))
    output_path = tmp_path / "ff_only.zarr"
    result = CliRunner().invoke(
        cli,
        [
            "fuse",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-c", str(config),
            "-o", str(output_path),
            "--cluster", "debug",
        ],
    )
    assert result.exit_code == 0, result.output
    in_pos = open_ome_zarr(plate_path)["A/1/0"]
    out_pos = open_ome_zarr(output_path)["A/1/0"]
    raw = np.asarray(in_pos.data[1, 1], np.float32)
    np.testing.assert_allclose(
        out_pos.data[1, 1], np.asarray(flat_field_zyx(raw)), atol=1e-5
    )
    np.testing.assert_allclose(  # untouched channel copied verbatim
        out_pos.data[1, 0], np.asarray(in_pos.data[1, 0], np.float32)
    )


def test_fuse_init_prints_resources(example_plate, psf_store, tmp_path):
    plate_path, _ = example_plate
    config = _fuse_config(
        tmp_path, deconvolve={"regularization_strength": 0.001}
    )
    result = CliRunner().invoke(
        cli,
        [
            "fuse", "--init",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-p", str(psf_store),
            "-c", str(config),
            "-o", str(tmp_path / "init.zarr"),
        ],
    )
    assert result.exit_code == 0, result.output
    assert "RESOURCES:" in result.output
    assert (tmp_path / "init.zarr").exists()


def test_fuse_requires_psf_for_deconvolve(example_plate, tmp_path):
    plate_path, _ = example_plate
    config = _fuse_config(
        tmp_path, deconvolve={"regularization_strength": 0.001}
    )
    result = CliRunner().invoke(
        cli,
        [
            "fuse",
            "-i", str(plate_path / "A" / "1" / "0"),
            "-c", str(config),
            "-o", str(tmp_path / "nopsf.zarr"),
            "--cluster", "debug",
        ],
    )
    assert result.exit_code != 0
    assert "psf-dirpath" in result.output


def test_fuse_resume_skips_finished_units(example_plate_2, tmp_path):
    plate_path, _ = example_plate_2
    config = _fuse_config(tmp_path)
    output_path = tmp_path / "resumed.zarr"
    args = [
        "fuse",
        "-i", str(plate_path / "A" / "1" / "0"),
        "-c", str(config),
        "-o", str(output_path),
        "--cluster", "debug",
        "--resume",
    ]
    first = CliRunner().invoke(cli, args)
    assert first.exit_code == 0, first.output
    second = CliRunner().invoke(cli, args)
    assert second.exit_code == 0, second.output
    assert "Resume: skipping" in second.output


def test_fuse_over_budget_degrades_to_chunked_verbs(
    example_plate, tmp_path, monkeypatch
):
    """A (t, c) volume whose fused footprint exceeds the device batch budget
    auto-composes the standalone verbs' chunked kernels in the SAME
    invocation and matches the in-budget run bit-for-bit (reference analog:
    every verb self-splits, biahub/deskew.py:554-582)."""
    plate_path, _ = example_plate
    matrix = np.eye(4)
    matrix[:3, 3] = [0.0, -1.0, 1.5]
    config = _fuse_config(
        tmp_path, registration={"affine_transform_zyx": matrix.tolist()}
    )

    big = CliRunner().invoke(
        cli,
        [
            "fuse", "-i", str(plate_path / "A" / "1" / "0"),
            "-c", str(config), "-o", str(tmp_path / "inbudget.zarr"),
            "--cluster", "debug",
        ],
    )
    assert big.exit_code == 0, big.output

    monkeypatch.setenv("BIAHUB_TPU_MAX_BATCH_BYTES", "1024")
    small = CliRunner().invoke(
        cli,
        [
            "fuse", "-i", str(plate_path / "A" / "1" / "0"),
            "-c", str(config), "-o", str(tmp_path / "overbudget.zarr"),
            "--cluster", "debug",
        ],
    )
    assert small.exit_code == 0, small.output
    assert "composing the standalone verbs' chunked kernels" in small.output

    want = open_ome_zarr(tmp_path / "inbudget.zarr")["A/1/0"].data[:]
    got = open_ome_zarr(tmp_path / "overbudget.zarr")["A/1/0"].data[:]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fuse_over_budget_resume_skips_finished_units(
    example_plate, tmp_path, monkeypatch
):
    plate_path, _ = example_plate
    config = _fuse_config(tmp_path)
    monkeypatch.setenv("BIAHUB_TPU_MAX_BATCH_BYTES", "1024")
    args = [
        "fuse", "-i", str(plate_path / "A" / "1" / "0"),
        "-c", str(config), "-o", str(tmp_path / "ob_resume.zarr"),
        "--cluster", "debug", "--resume",
    ]
    first = CliRunner().invoke(cli, args)
    assert first.exit_code == 0, first.output
    second = CliRunner().invoke(cli, args)
    assert second.exit_code == 0, second.output
    # Every unit was recorded: the second run re-processes none of them.
    assert "Fused (chunked fallback): 18 (t, c) volumes" in second.output


def test_fuse_impossible_deconvolve_budget_is_an_actionable_error(
    example_plate, psf_store, tmp_path, monkeypatch
):
    """Only a deconvolve stage whose own FFT volume cannot fit keeps the
    fail-fast (an FFT has no exact spatial split on one chip)."""
    plate_path, _ = example_plate
    config = _fuse_config(tmp_path, deconvolve={"regularization_strength": 0.001})
    monkeypatch.setenv("BIAHUB_TPU_MAX_BATCH_BYTES", "1024")
    result = CliRunner().invoke(
        cli,
        [
            "fuse", "-i", str(plate_path / "A" / "1" / "0"),
            "-p", str(psf_store),
            "-c", str(config), "-o", str(tmp_path / "impossible.zarr"),
            "--cluster", "debug",
        ],
    )
    assert result.exit_code != 0
    assert "batch budget" in result.output
    assert "BIAHUB_TPU_SHARDED_FFT" in result.output

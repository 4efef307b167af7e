"""``biahub estimate-stabilization``: per-position drift estimation.

Three methods x three axes, as in the reference (reference:
biahub/estimate_stabilization.py:1222-1603):

- focus-finding: per-timepoint in-focus z-index from transverse mid-band
  spectral power (z drift), plus 2D translation registration of the focus
  slices (xy drift; the pystackreg call is replaced by subpixel phase
  cross-correlation).
- phase-cross-corr: volumetric 3D PCC per timepoint.
- beads: delegated to the beads registration pipeline.

The per-position Slurm fan-out collapses into on-device batches: all
timepoints of a position are processed as one vmapped FFT stack. Outputs
match the reference layout: ``positions_focus.csv``, per-FOV
``{z,xy,xyz}_stabilization_settings/<fov>.yml``, drift plots when verbose.
"""

from __future__ import annotations

import os
from pathlib import Path

import click
import numpy as np
import pandas as pd

from biahub_tpu.cli.parsing import (
    config_filepath,
    input_position_dirpaths,
    local,
    output_dirpath,
    sbatch_filepath,
)
from biahub_tpu.cli.utils import yaml_to_model
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.kernels.fft import subpixel_shift_2d
from biahub_tpu.registration.utils import evaluate_transforms, save_transforms
from biahub_tpu.runtime import resolve_cluster
from biahub_tpu.settings import (
    EstimateStabilizationSettings,
    FocusFindingSettings,
    PhaseCrossCorrSettings,
    StabilizationSettings,
    StackRegSettings,
)

__all__ = [
    "estimate_stabilization",
    "estimate_stabilization_cli",
    "estimate_z_stabilization",
    "estimate_xy_stabilization",
    "estimate_xyz_stabilization_pcc",
]

NA_DET = 1.35
LAMBDA_ILL = 0.500


def remove_beads_fov_from_path_list(
    position_dirpaths: list[Path], skip_beads_fov: str
) -> list[Path]:
    """Drop the beads FOV from the estimation inputs (reference:
    biahub/estimate_stabilization.py:49-73)."""
    if skip_beads_fov != "0":
        click.echo(f"Removing beads FOV {skip_beads_fov} from input data paths")
        position_dirpaths = [
            path for path in position_dirpaths if skip_beads_fov not in str(path)
        ]
    return position_dirpaths


def _fov_name(path: Path) -> str:
    return "_".join(Path(path).parts[-3:])


def _center_crop_slices(Y: int, X: int, center_crop_xy) -> tuple[slice, slice]:
    if not center_crop_xy:
        return slice(0, Y), slice(0, X)
    cx, cy = center_crop_xy[0], center_crop_xy[1]
    cx, cy = min(cx, X), min(cy, Y)
    return (
        slice(Y // 2 - cy // 2, Y // 2 + cy // 2),
        slice(X // 2 - cx // 2, X // 2 + cx // 2),
    )


# ---------------------------------------------------------------------------
# Z: focus finding
# ---------------------------------------------------------------------------


def estimate_z_focus_per_position(
    position,
    fov: str,
    channel_index: int,
    center_crop_xy,
    verbose: bool = False,
) -> pd.DataFrame:
    """In-focus z-index per timepoint for one position."""
    T, C, Z, Y, X = position.data.shape
    pixel_size = position.scale[-1]
    y_idx, x_idx = _center_crop_slices(Y, X, center_crop_xy)
    channel_names = position.channel_names

    # All timepoints as ONE batched device sweep (the reference loops a
    # Slurm job per (t, c); the north-star design vectorizes over T),
    # chunked to the executor's memory budget.
    from biahub_tpu.kernels.focus import focus_from_transverse_band_tzyx
    from biahub_tpu.runtime.executor import DEFAULT_MAX_BATCH_BYTES

    budget = int(os.environ.get("BIAHUB_TPU_MAX_BATCH_BYTES", DEFAULT_MAX_BATCH_BYTES))
    crop_bytes = 4 * Z * (y_idx.stop - y_idx.start) * (x_idx.stop - x_idx.start)
    t_chunk = max(1, budget // max(crop_bytes * 2, 1))
    focus_indices = np.zeros(T, dtype=int)
    for t0 in range(0, T, t_chunk):
        t1 = min(t0 + t_chunk, T)
        stack = np.asarray(
            position.data[t0:t1, channel_index, :, y_idx, x_idx], dtype=np.float32
        )
        focus_indices[t0:t1] = focus_from_transverse_band_tzyx(
            stack, NA_det=NA_DET, lambda_ill=LAMBDA_ILL, pixel_size=pixel_size
        )

    rows = []
    for t in range(T):
        z_idx = int(focus_indices[t])
        if verbose:
            click.echo(f"Estimating focus for timepoint {t}: {z_idx}")
        rows.append(
            {
                "position": fov.replace("_", "/"),
                "time_idx": t,
                "channel": channel_names[channel_index],
                "focus_idx": z_idx,
            }
        )
    return pd.DataFrame(rows)


def _z_transforms_from_focus(focus_idx: list[float]) -> np.ndarray:
    """Per-timepoint z-translation transforms from a focus-index series.

    The first valid (non-zero) focus index is the reference; each transform
    samples at z + (focus_t - focus_ref) (reference:
    biahub/estimate_stabilization.py:979-996).
    """
    z_val = next((v for v in focus_idx if v != 0 and not np.isnan(v)), None)
    if z_val is None:
        raise ValueError("Z index of focus reference is None, focus_idx contains only zeros")
    transforms = [np.eye(4)]
    for z_next in focus_idx[1:]:
        shift = np.eye(4)
        shift[0, 3] = z_next - z_val
        transforms.append(shift)
    return np.asarray(transforms)


def estimate_z_stabilization(
    input_position_dirpaths: list[Path],
    output_folder_path: Path,
    focus_finding_settings: FocusFindingSettings,
    channel_index: int,
    sbatch_filepath=None,
    cluster: str = "local",
    verbose: bool = False,
    estimate_z_index: bool = False,
):
    """Focus-based z-drift transforms per FOV; writes positions_focus.csv."""
    input_position_dirpaths = remove_beads_fov_from_path_list(
        input_position_dirpaths, focus_finding_settings.skip_beads_fov
    )
    output_folder_path = Path(output_folder_path)
    output_folder_path.mkdir(parents=True, exist_ok=True)

    frames = []
    fov_focus: dict[str, list[float]] = {}
    for path in input_position_dirpaths:
        fov = _fov_name(path)
        position = open_ome_zarr(path, mode="r")
        df = estimate_z_focus_per_position(
            position, fov, channel_index, focus_finding_settings.center_crop_xy, verbose
        )
        frames.append(df)
        fov_focus[fov] = df["focus_idx"].tolist()

    df = pd.concat(frames)
    focus_csv = output_folder_path / "positions_focus.csv"
    if focus_csv.exists():
        click.echo("Using existing focus CSV file.")
        df_old = pd.read_csv(focus_csv)
        df = pd.concat([df, df_old]).drop_duplicates(subset=["position", "time_idx"])
    df = df.sort_values(["position", "time_idx"])
    df.to_csv(focus_csv, index=False)

    if estimate_z_index:
        return None

    if focus_finding_settings.average_across_wells:
        z_offsets = get_mean_z_positions(
            focus_csv,
            method=focus_finding_settings.average_across_wells_method,
            verbose=verbose,
        )
        transform = {"average": _z_transforms_from_focus(list(z_offsets)).tolist()}
        if verbose:
            click.echo(f"Saving z focus shift matrices to {output_folder_path}")
            np.save(output_folder_path / "z_focus_shift.npy", transform["average"])
        return transform

    return {fov: _z_transforms_from_focus(vals).tolist() for fov, vals in fov_focus.items()}


def get_mean_z_positions(
    dataframe_path: Path, verbose: bool = False, method: str = "mean"
) -> np.ndarray:
    """Well-averaged focus index per timepoint (reference:
    biahub/estimate_stabilization.py:1002-1048)."""
    df = pd.read_csv(dataframe_path).sort_values("time_idx")
    # Failed focus finding returns 0 -> NaN before averaging
    df["focus_idx"] = df["focus_idx"].replace(0, np.nan)
    grouped = df.groupby("time_idx")["focus_idx"]
    avg = grouped.mean() if method == "mean" else grouped.median()
    avg = avg.reset_index()
    if verbose:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.plot(avg["focus_idx"], linestyle="--", label="mean of all positions")
        plt.xlabel("Time index")
        plt.ylabel("Focus index")
        plt.legend()
        plt.savefig(Path(dataframe_path).parent / "z_drift.png")
        plt.close()
    return avg["focus_idx"].values


# ---------------------------------------------------------------------------
# XY: translation registration of focus slices
# ---------------------------------------------------------------------------


def estimate_xy_stabilization_per_position(
    position,
    focus_idx: list[int],
    channel_index: int,
    center_crop_xy,
    t_reference: str = "previous",
    verbose: bool = False,
) -> np.ndarray:
    """Per-timepoint (T, 4, 4) xy transforms from focus-slice registration."""
    T, C, Z, Y, X = position.data.shape
    y_idx, x_idx = _center_crop_slices(Y, X, center_crop_xy)

    z_idx = (
        pd.Series(focus_idx).replace(0, np.nan).ffill().fillna(pd.Series(focus_idx).mean())
    )
    z_idx = z_idx.astype(int).to_list()

    tyx = np.stack(
        [position.data[t, channel_index, z, y_idx, x_idx] for t, z in zip(range(T), z_idx)]
    )
    tyx = np.clip(tyx, a_min=0, a_max=None).astype(np.float32)

    shifts = np.zeros((T, 2))
    if t_reference == "first":
        for t in range(1, T):
            shifts[t] = subpixel_shift_2d(tyx[0], tyx[t])
    else:  # previous: accumulate pairwise shifts into the first frame's coords
        for t in range(1, T):
            pair = subpixel_shift_2d(tyx[t - 1], tyx[t])
            shifts[t] = shifts[t - 1] + pair

    transforms = np.zeros((T, 4, 4))
    transforms[:] = np.eye(4)
    # PCC peak d of (ref, mov) satisfies mov(x) ≈ ref(x + d); the aligning warp
    # out[o] = mov[o + delta] needs delta = -d.
    transforms[:, 1, 3] = -shifts[:, 0]
    transforms[:, 2, 3] = -shifts[:, 1]
    return transforms


def estimate_xy_stabilization(
    input_position_dirpaths: list[Path],
    output_folder_path: Path,
    stack_reg_settings: StackRegSettings,
    channel_index: int = 0,
    sbatch_filepath=None,
    cluster: str = "local",
    verbose: bool = False,
) -> dict[str, list]:
    """XY drift transforms per FOV from focus-slice translation registration."""
    input_position_dirpaths = remove_beads_fov_from_path_list(
        input_position_dirpaths, stack_reg_settings.skip_beads_fov
    )
    output_folder_path = Path(output_folder_path)
    output_folder_path.mkdir(parents=True, exist_ok=True)

    df_focus_path = output_folder_path / "positions_focus.csv"
    if df_focus_path.exists():
        click.echo("Using existing Z focus index file.")
    else:
        click.echo("Estimating Z focus positions...")
        estimate_z_stabilization(
            input_position_dirpaths=input_position_dirpaths,
            output_folder_path=output_folder_path,
            channel_index=channel_index,
            cluster=cluster,
            verbose=verbose,
            estimate_z_index=True,
            focus_finding_settings=stack_reg_settings.focus_finding_settings,
        )

    df = pd.read_csv(df_focus_path)
    fov_transforms = {}
    for path in input_position_dirpaths:
        fov = _fov_name(path)
        pos_key = str(Path(*Path(path).parts[-3:]))
        focus_idx = df[df["position"] == pos_key]["focus_idx"].tolist()
        position = open_ome_zarr(path, mode="r")
        transforms = estimate_xy_stabilization_per_position(
            position,
            focus_idx,
            channel_index,
            stack_reg_settings.center_crop_xy,
            t_reference=stack_reg_settings.t_reference,
            verbose=verbose,
        )
        fov_transforms[fov] = transforms.tolist()
    return fov_transforms


# ---------------------------------------------------------------------------
# XYZ: volumetric phase cross-correlation
# ---------------------------------------------------------------------------


def _pcc_crop_slices(shape_zyx, settings: PhaseCrossCorrSettings):
    Z, Y, X = shape_zyx
    y_idx, x_idx = _center_crop_slices(Y, X, settings.center_crop_xy)
    z_idx = slice(0, Z)
    if settings.X_slice != "all":
        x_idx = slice(settings.X_slice[0], settings.X_slice[1])
    if settings.Y_slice != "all":
        y_idx = slice(settings.Y_slice[0], settings.Y_slice[1])
    if settings.Z_slice != "all":
        z_idx = slice(settings.Z_slice[0], settings.Z_slice[1])
    return z_idx, y_idx, x_idx


def estimate_xyz_stabilization_pcc_per_position(
    position,
    fov: str,
    channel_index: int,
    phase_cross_corr_settings: PhaseCrossCorrSettings,
    output_folder_path: Path | None = None,
    verbose: bool = False,
) -> list:
    """Per-timepoint transforms from volumetric PCC against the reference frame."""
    T = position.data.shape[0]
    z_idx, y_idx, x_idx = _pcc_crop_slices(
        position.data.shape[2:], phase_cross_corr_settings
    )

    settings = phase_cross_corr_settings

    # All timepoint pairs run as BATCHED device programs (the north-star
    # design: PCC vectorized over timepoints instead of one Slurm job per
    # pair), chunked to the memory budget. With t_reference="first" the
    # reference FFT is hoisted out of the vmap, so a chunk of K pairs costs
    # K+1 forward FFTs.
    from biahub_tpu.kernels.fft import (
        _pcc_peak_indices_pairwise,
        _pcc_peak_indices_vs_first,
        match_shape,
        pcc_shifts_pairwise,
        pcc_shifts_vs_first,
    )
    from biahub_tpu.runtime.executor import DEFAULT_MAX_BATCH_BYTES
    from scipy.fft import next_fast_len

    def load(t0, t1):
        return np.asarray(
            position.data[t0:t1, channel_index, z_idx, y_idx, x_idx], dtype=np.float32
        )

    crop_shape = load(0, 1).shape[1:]
    if settings.function_type == "custom_padding":
        fft_shape = tuple(
            int(next_fast_len(int(s * settings.maximum_shift))) for s in crop_shape
        )
    else:
        fft_shape = crop_shape
    budget = int(os.environ.get("BIAHUB_TPU_MAX_BATCH_BYTES", DEFAULT_MAX_BATCH_BYTES))
    vol_bytes = 4 * int(np.prod(fft_shape))
    t_chunk = max(1, budget // max(vol_bytes * 8, 1))

    def prep(stack):
        if settings.function_type == "custom_padding":
            return np.stack([match_shape(v, fft_shape) for v in stack])
        return stack

    ref_stack = prep(load(0, 1))
    all_shifts = np.zeros((T, 3))
    for t0 in range(1, T, t_chunk):
        t1 = min(t0 + t_chunk, T)
        movs = prep(load(t0, t1))
        if settings.t_reference == "first":
            refs = ref_stack[0]
            if settings.function_type == "custom_padding":
                p0 = np.asarray(
                    _pcc_peak_indices_vs_first(refs, movs, settings.normalization)
                ).astype(np.int64)
            else:
                chunk_shifts = np.asarray(
                    pcc_shifts_vs_first(refs, movs, settings.normalization)
                )
        else:  # previous: pair each frame with its predecessor
            prevs = prep(load(t0 - 1, t1 - 1))
            if settings.function_type == "custom_padding":
                p0 = np.asarray(
                    _pcc_peak_indices_pairwise(prevs, movs, settings.normalization)
                ).astype(np.int64)
            else:
                chunk_shifts = np.asarray(
                    pcc_shifts_pairwise(prevs, movs, settings.normalization)
                )
        if settings.function_type == "custom_padding":
            chunk_shifts = np.stack(
                [
                    [s // 2 - ((q + s // 2) % s) for s, q in zip(fft_shape, row)]
                    for row in p0
                ]
            ).astype(np.float64)
        all_shifts[t0:t1] = chunk_shifts

    transforms = [np.eye(4).tolist()]
    shifts = [(0, 0.0, 0.0, 0.0)]
    cumulative = np.zeros(3)
    for t in range(1, T):
        shift = all_shifts[t]
        if settings.t_reference == "previous":
            cumulative = cumulative + shift
            total = cumulative.copy()
        else:
            total = shift
        # Aligning warp samples at o - shift (see estimate_xy note on signs)
        transform = np.eye(4)
        transform[:3, 3] = -total
        transforms.append(transform.tolist())
        shifts.append((t, *shift))
        if verbose:
            click.echo(f"Time {t}: shift (dz,dy,dx) = {tuple(np.round(shift, 2))}")

    if verbose and output_folder_path is not None:
        shifts_df = pd.DataFrame(shifts, columns=["TimepointID", "ShiftZ", "ShiftY", "ShiftX"])
        out_csv = Path(output_folder_path) / "shifts_per_position"
        out_csv.mkdir(parents=True, exist_ok=True)
        shifts_df.to_csv(out_csv / f"{fov}.csv", index=False)
    return transforms


def estimate_xyz_stabilization_pcc(
    input_position_dirpaths: list[Path],
    output_folder_path: Path,
    phase_cross_corr_settings: PhaseCrossCorrSettings,
    channel_index: int = 0,
    sbatch_filepath=None,
    cluster: str = "local",
    verbose: bool = False,
) -> dict[str, list]:
    input_position_dirpaths = remove_beads_fov_from_path_list(
        input_position_dirpaths, phase_cross_corr_settings.skip_beads_fov
    )
    Path(output_folder_path).mkdir(parents=True, exist_ok=True)
    fov_transforms = {}
    for path in input_position_dirpaths:
        fov = _fov_name(path)
        position = open_ome_zarr(path, mode="r")
        fov_transforms[fov] = estimate_xyz_stabilization_pcc_per_position(
            position,
            fov,
            channel_index,
            phase_cross_corr_settings,
            output_folder_path=output_folder_path,
            verbose=verbose,
        )
    return fov_transforms


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def estimate_stabilization(
    input_position_dirpaths: list[Path],
    output_dirpath: Path,
    config_filepath: Path,
    sbatch_filepath=None,
    local: bool = False,
) -> None:
    settings = yaml_to_model(Path(config_filepath), EstimateStabilizationSettings)
    click.echo(f"Settings: {settings}")

    verbose = settings.verbose
    stabilization_type = settings.stabilization_type
    stabilization_method = settings.stabilization_method

    output_dirpath = Path(output_dirpath)
    output_dirpath.mkdir(parents=True, exist_ok=True)

    dataset = open_ome_zarr(input_position_dirpaths[0])
    channel_names = dataset.channel_names
    voxel_size = dataset.scale
    channel_index = channel_names.index(settings.stabilization_estimation_channel)
    T, C, Z, Y, X = dataset.data.shape

    cluster = resolve_cluster(None, local)
    eval_settings = settings.eval_transform_settings

    def _evaluate(transforms):
        if not eval_settings:
            return transforms
        return evaluate_transforms(
            transforms=transforms,
            shape_zyx=(Z, Y, X),
            validation_window_size=eval_settings.validation_window_size,
            validation_tolerance=eval_settings.validation_tolerance,
            interpolation_window_size=eval_settings.interpolation_window_size,
            interpolation_type=eval_settings.interpolation_type,
            verbose=verbose,
        )

    def _model():
        return StabilizationSettings(
            stabilization_type=settings.stabilization_type,
            stabilization_method=settings.stabilization_method,
            stabilization_estimation_channel=settings.stabilization_estimation_channel,
            stabilization_channels=settings.stabilization_channels,
            affine_transform_zyx_list=[],
            time_indices="all",
            output_voxel_size=voxel_size,
        )

    def _save(fov_transforms: dict, kind: str):
        for fov, transforms in fov_transforms.items():
            save_transforms(
                model=_model(),
                transforms=_evaluate(transforms),
                output_filepath_settings=output_dirpath
                / f"{kind}_stabilization_settings"
                / f"{fov}.yml",
                output_filepath_plot=output_dirpath / "translation_plots" / f"{fov}.png",
                verbose=verbose,
            )

    if stabilization_type == "xyz":
        if stabilization_method == "focus-finding":
            click.echo(
                "Estimating xyz stabilization parameters with focus finding and "
                "stack registration"
            )
            z_dict = estimate_z_stabilization(
                input_position_dirpaths=input_position_dirpaths,
                output_folder_path=output_dirpath,
                channel_index=channel_index,
                focus_finding_settings=settings.focus_finding_settings,
                cluster=cluster,
                verbose=verbose,
            )
            xy_dict = estimate_xy_stabilization(
                input_position_dirpaths=input_position_dirpaths,
                output_folder_path=output_dirpath,
                channel_index=channel_index,
                stack_reg_settings=settings.stack_reg_settings,
                cluster=cluster,
                verbose=verbose,
            )
            xyz_dict = {}
            for fov, xy_transforms in xy_dict.items():
                z_key = fov if fov in z_dict else "average"
                z_transforms = np.asarray(z_dict[z_key])
                xy_transforms = np.asarray(xy_transforms)
                if xy_transforms.shape[0] != z_transforms.shape[0]:
                    raise ValueError(
                        "The number of translation matrices and z drift matrices "
                        "must be the same"
                    )
                xyz_dict[fov] = np.asarray(
                    [a @ b for a, b in zip(xy_transforms, z_transforms)]
                ).tolist()
            _save(xyz_dict, "xyz")
            _save({f: np.asarray(z_dict[f if f in z_dict else 'average']).tolist()
                   for f in xy_dict}, "z")
            _save(xy_dict, "xy")

        elif stabilization_method == "beads":
            from biahub_tpu.registration.beads import estimate_tczyx

            click.echo("Estimating xyz stabilization parameters with beads")
            beads_position = open_ome_zarr(input_position_dirpaths[0], mode="r")
            source_channels = beads_position.channel_names
            source_channel_index = source_channels.index(
                settings.stabilization_estimation_channel
            )
            data = beads_position.data

            xyz_transforms = estimate_tczyx(
                mov_tczyx=data,
                ref_tczyx=data,
                mov_channel_index=source_channel_index,
                ref_channel_index=source_channel_index,
                beads_match_settings=settings.beads_match_settings,
                affine_transform_settings=settings.affine_transform_settings,
                verbose=verbose,
                output_folder_path=output_dirpath,
                mode="stabilization",
            )
            save_transforms(
                model=_model(),
                transforms=_evaluate(xyz_transforms),
                output_filepath_settings=output_dirpath / "xyz_stabilization_settings.yml",
                output_filepath_plot=output_dirpath / "translation_plots" / "beads.png",
                verbose=verbose,
            )

        elif stabilization_method == "phase-cross-corr":
            click.echo("Estimating xyz stabilization parameters with phase cross correlation")
            xyz_dict = estimate_xyz_stabilization_pcc(
                input_position_dirpaths=input_position_dirpaths,
                output_folder_path=output_dirpath,
                channel_index=channel_index,
                phase_cross_corr_settings=settings.phase_cross_corr_settings,
                cluster=cluster,
                verbose=verbose,
            )
            _save(xyz_dict, "xyz")

    if stabilization_type == "z" and stabilization_method == "focus-finding":
        click.echo("Estimating z stabilization parameters with focus finding")
        z_dict = estimate_z_stabilization(
            input_position_dirpaths=input_position_dirpaths,
            output_folder_path=output_dirpath,
            channel_index=channel_index,
            focus_finding_settings=settings.focus_finding_settings,
            cluster=cluster,
            verbose=verbose,
        )
        _save(z_dict, "z")

    if stabilization_type == "xy":
        if stabilization_method == "focus-finding":
            click.echo(
                "Estimating xy stabilization parameters with focus finding and "
                "stack registration"
            )
            xy_dict = estimate_xy_stabilization(
                input_position_dirpaths=input_position_dirpaths,
                output_folder_path=output_dirpath,
                channel_index=channel_index,
                stack_reg_settings=settings.stack_reg_settings,
                cluster=cluster,
                verbose=verbose,
            )
            _save(xy_dict, "xy")


@click.command("estimate-stabilization")
@input_position_dirpaths()
@output_dirpath()
@config_filepath()
@sbatch_filepath()
@local()
def estimate_stabilization_cli(
    input_position_dirpaths: list[Path],
    output_dirpath: Path,
    config_filepath: Path,
    sbatch_filepath: str | None = None,
    local: bool = False,
):
    """Estimate translation matrices for XYZ stabilization of a timelapse dataset.

    Stabilization parameters may be computed for the XY, Z, or XYZ dimensions using
    focus finding, beads, or phase cross correlation methods.

    >>> biahub estimate-stabilization \\
        -i ./timelapse.zarr/0/0/0 \\
        -o ./stabilization_output \\
        -c ./config.yml \\
        --local
    """
    estimate_stabilization(
        input_position_dirpaths=input_position_dirpaths,
        output_dirpath=output_dirpath,
        config_filepath=config_filepath,
        sbatch_filepath=sbatch_filepath,
        local=local,
    )


if __name__ == "__main__":
    estimate_stabilization_cli()


# ---------------------------------------------------------------------------
# Reference-name compatibility helpers
# (reference: biahub/estimate_stabilization.py:76-125, 258-311, 312-440)
# ---------------------------------------------------------------------------


def get_tform_from_pcc(shift) -> list:
    """4x4 aligning transform from a PCC shift: out[o] = mov[o - shift]."""
    transform = np.eye(4)
    transform[:3, 3] = -np.asarray(shift, dtype=np.float64)
    return transform.tolist()


def plot_cross_correlation(corr, title: str = "Cross-Correlation", output_path=None):
    """Mid-plane heatmap of a correlation volume (reference name)."""
    from biahub_tpu.kernels.fft import _plot_corr

    if output_path is None:
        raise ValueError("output_path is required")
    _plot_corr(np.asarray(corr), output_path)


def plot_pcc_drifts(shifts_df, output_path) -> None:
    """Per-axis drift curves over time from a shifts dataframe."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, sharex=True, figsize=(8, 6))
    for ax, col in zip(axes, ["ShiftZ", "ShiftY", "ShiftX"]):
        ax.plot(shifts_df["TimepointID"], shifts_df[col], marker="o", ms=2)
        ax.set_ylabel(col)
    axes[-1].set_xlabel("timepoint")
    fig.tight_layout()
    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=120)
    plt.close(fig)


def plot_corr_max_min_sum(corr_stats_df, output_path) -> None:
    """Correlation max/min/sum curves over time (reference name)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    for col in ("corr_max", "corr_min", "corr_sum"):
        if col in corr_stats_df:
            ax.plot(corr_stats_df["TimepointID"], corr_stats_df[col], label=col)
    ax.set_xlabel("timepoint")
    ax.legend()
    fig.tight_layout()
    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=120)
    plt.close(fig)


# Reference-name compatibility (reference: biahub/estimate_stabilization.py:
# 128-255): the PCC kernels live in kernels/fft here.
from biahub_tpu.kernels.fft import (  # noqa: E402,F401
    phase_cross_corr,
    phase_cross_corr_padding,
)

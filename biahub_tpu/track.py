"""``biahub track``: 2D/3D object tracking over time-lapse plates.

Mirrors the reference's flow (reference: biahub/track.py:337-1179): z-plane
selection (all/central/range/focus), a configurable preprocessing pipeline,
blank-frame filling from CSV, foreground+contour or cellpose segmentation,
then tracking. The ultrack solver is replaced by the native engine in
:mod:`biahub_tpu.tracking` (marker/Voronoi instance segmentation + Hungarian
frame linking); cellpose is used when installed, otherwise that mode raises a
clear error.
"""

from __future__ import annotations

import ast
import os
from pathlib import Path

import click
import numpy as np
import pandas as pd

from biahub_tpu.cli.parsing import (
    cluster,
    config_filepath,
    init_only,
    input_position_dirpaths,
    monitor,
    output_dirpath,
    sbatch_filepath,
)
from biahub_tpu.cli.resolve_function import resolve_function
from biahub_tpu.cli.utils import PROVENANCE_METADATA_KEYS, yaml_to_model
from biahub_tpu.io.ngff import create_empty_plate, get_ome_zarr_version, open_ome_zarr
from biahub_tpu.kernels.focus import focus_from_transverse_band
from biahub_tpu.runtime import echo_resources, estimate_resources, resolve_cluster
from biahub_tpu.settings import CellposeConfig, ProcessingInputChannel, TrackingSettings, ZSlicing
from biahub_tpu.tracking.engine import track_from_foreground_contour, track_from_labels

__all__ = ["track", "track_cli", "track_one_position", "resolve_z_slice", "fill_empty_frames"]

NA_DET = 1.35
LAMBDA_ILL = 0.500


def mem_nuc_contour(nuclei_prediction, membrane_prediction):
    """Contour map at the nuclei/membrane interface (reference: biahub/track.py:94-127)."""
    return (np.asarray(membrane_prediction) + (1 - np.asarray(nuclei_prediction))) / 2


def normalize(image, lower_q: float = 0.01, upper_q: float = 0.999):
    """Quantile-normalize to [0, 1] (native stand-in for ultrack.imgproc.normalize)."""
    image = np.asarray(image, dtype=np.float32)
    lo, hi = np.quantile(image, [lower_q, upper_q])
    return np.clip((image - lo) / max(hi - lo, 1e-8), 0, 1)


def detect_foreground(image, sigma: float = 15.0, threshold: float = 0.5):
    """Foreground mask via background subtraction + Otsu-scaled threshold
    (native stand-in for ultrack.imgproc.detect_foreground)."""
    from scipy.ndimage import gaussian_filter

    from biahub_tpu.segment import otsu_threshold

    image = np.asarray(image, dtype=np.float32)
    background = gaussian_filter(image, sigma)
    corrected = image - background
    return (corrected > threshold * otsu_threshold(corrected)).astype(np.float32)


def robust_invert(image, sigma: float = 1.0):
    """Smoothed, inverted, quantile-normalized intensity — a contour/edges map
    (native stand-in for ultrack.imgproc.robust_invert)."""
    from scipy.ndimage import gaussian_filter

    image = np.asarray(image, dtype=np.float32)
    smooth = gaussian_filter(image, sigma)
    inverted = smooth.max() - smooth
    return normalize(inverted)


CUSTOM_FUNCTIONS = {
    "biahub.track.mem_nuc_contour": mem_nuc_contour,
    "biahub_tpu.track.mem_nuc_contour": mem_nuc_contour,
    "ultrack.imgproc.normalize": normalize,
    "ultrack.imgproc.detect_foreground": detect_foreground,
    "ultrack.imgproc.robust_invert": robust_invert,
    "biahub_tpu.track.normalize": normalize,
    "biahub_tpu.track.detect_foreground": detect_foreground,
    "biahub_tpu.track.robust_invert": robust_invert,
}


def fill_empty_frames(arr, empty_frames_idx: list[int] | None):
    """Replace listed empty frames with the nearest valid frame (in-place)."""
    if not empty_frames_idx or not isinstance(empty_frames_idx, list):
        return arr
    num_frames = arr.shape[0]
    for idx in empty_frames_idx:
        prev_valid = next(
            (i for i in range(idx - 1, -1, -1) if i not in empty_frames_idx), None
        )
        next_valid = next(
            (i for i in range(idx + 1, num_frames) if i not in empty_frames_idx), None
        )
        source = prev_valid if prev_valid is not None else next_valid
        if idx == 0 and next_valid is not None:
            source = next_valid
        if source is not None:
            arr[idx] = arr[source]
    return arr


def get_empty_frames_idx_from_csv(blank_frame_df: pd.DataFrame, fov: str) -> list[int] | None:
    """Empty-timepoint indices for one FOV from the blank-frames CSV."""
    empty = blank_frame_df[blank_frame_df["FOV"] == fov]["t"]
    if not empty.empty:
        t_value = empty.iloc[0]
        if isinstance(t_value, str) and t_value.startswith("["):
            t_value = ast.literal_eval(t_value)
        if isinstance(t_value, list):
            return [int(i) for i in t_value]
        if t_value == 0:
            return None
    return None


def central_z_slice(z_shape: int) -> slice:
    """Centered odd-sized Z window of at least 3 planes."""
    n_slices = max(3, z_shape // 2)
    if n_slices % 2 == 0:
        n_slices += 1
    z_center = z_shape // 2
    half = n_slices // 2
    return slice(z_center - half, z_center + half + 1)


def _median_focus_plane(stack, pixel_size: float) -> int:
    """Median in-focus z-plane over timepoints of a (T, Z, Y, X) stack."""
    z_shape = stack.shape[1]
    z_focus = []
    for t in range(stack.shape[0]):
        zyx = np.asarray(stack[t])
        if zyx.sum() == 0:
            z_focus.append(z_shape // 2)
            continue
        z_f = focus_from_transverse_band(
            zyx, NA_det=NA_DET, lambda_ill=LAMBDA_ILL, pixel_size=pixel_size
        )
        z_focus.append(z_shape // 2 if z_f is None else int(np.clip(z_f, 0, z_shape - 1)))
    return int(np.median(z_focus))


def _focus_window(center: int, window_size: int, z_shape: int, frac_below: float):
    """Fixed-size window around the focus, shifted (not clipped) into range."""
    size = min(window_size, z_shape)
    start = center - int(round(frac_below * window_size))
    stop = start + size
    if start < 0:
        start, stop = 0, size
    elif stop > z_shape:
        start, stop = z_shape - size, z_shape
    return slice(start, stop), size


def resolve_z_slice(z: ZSlicing, z_shape: int) -> tuple[slice, int]:
    """Read-time z-slice and plane count for a ZSlicing config."""
    if z.method == "all":
        return slice(None), z_shape
    if z.method == "central":
        z_slices = central_z_slice(z_shape)
        return z_slices, z_slices.stop - z_slices.start
    if z.method == "range":
        if z.range is None:
            return slice(None), z_shape
        start, stop = z.range
        if stop <= start:
            raise ValueError(
                f"Invalid z_slicing.range {z.range}: must contain at least one slice "
                "(stop > start)."
            )
        return slice(start, stop), stop - start
    if z.method == "focus":
        return slice(None), min(z.window_size, z_shape)
    raise ValueError(f"Unknown z_slicing.method: {z.method!r}")


def apply_focus_slicing(data_dict, z_slicing: ZSlicing, pixel_size: float):
    """Slice every channel to the per-FOV focus window (method='focus')."""
    focus_channel = z_slicing.focus_channel or next(iter(data_dict))
    if focus_channel not in data_dict:
        raise ValueError(
            f"focus_channel '{focus_channel}' not in loaded channels {list(data_dict)}."
        )
    stack = data_dict[focus_channel]
    center = _median_focus_plane(stack, pixel_size)
    z_slices, _ = _focus_window(
        center, z_slicing.window_size, stack.shape[1], z_slicing.frac_below
    )
    click.echo(f"Focus-resolved z-slice: {z_slices}")
    return {name: arr[:, z_slices] for name, arr in data_dict.items()}


def run_preprocessing_pipeline(data_dict, input_images: list[ProcessingInputChannel]):
    """Apply each channel's configured function chain (optionally per timepoint)."""
    for image in input_images:
        for channel_name, pipeline in image.channels.items():
            for step in pipeline:
                click.echo(f"Processing {channel_name} with {step.function}")
                run_function = resolve_function(
                    step.function, custom_functions=CUSTOM_FUNCTIONS
                )
                f_channel_names = step.input_channels or [channel_name]
                f_data = [np.asarray(data_dict[name]) for name in f_channel_names]
                if step.per_timepoint:
                    T = f_data[0].shape[0]
                    result = np.stack(
                        [
                            run_function(*[d[t] for d in f_data], **step.kwargs)
                            for t in range(T)
                        ]
                    )
                else:
                    result = run_function(*f_data, **step.kwargs)
                data_dict[channel_name] = np.asarray(result)
    return data_dict


def load_data(position_key, input_images: list[ProcessingInputChannel], z_slices: slice):
    """Load the configured channels of one position as (T, Z, Y, X) arrays."""
    data_dict = {}
    for image in input_images:
        if image.path is not None:
            image_path = Path(image.path) / Path(*position_key)
            dataset = open_ome_zarr(image_path)
            names = dataset.channel_names
            for channel_name in image.channels:
                click.echo(f"Loading data for channel {channel_name} from {image.path}")
                data_dict[channel_name] = dataset.data[
                    :, names.index(channel_name), z_slices
                ]
    return data_dict


def fill_empty_frames_from_csv(fov, data_dict, blank_frame_csv_path):
    if blank_frame_csv_path:
        blank_frame_df = pd.read_csv(blank_frame_csv_path)
        empty_frames_idx = get_empty_frames_idx_from_csv(blank_frame_df, fov)
        for channel_name, channel_data in data_dict.items():
            data_dict[channel_name] = fill_empty_frames(
                np.asarray(channel_data), empty_frames_idx
            )
    return data_dict


def _load_and_preprocess(
    position_key, input_images, z_slices, blank_frames_path, z_slicing, pixel_size
):
    fov = "/".join(position_key)
    data_dict = load_data(position_key, input_images, z_slices)
    if z_slicing is not None and z_slicing.method == "focus":
        data_dict = apply_focus_slicing(data_dict, z_slicing, pixel_size)
    data_dict = run_preprocessing_pipeline(data_dict, input_images)
    return fill_empty_frames_from_csv(fov, data_dict, blank_frames_path)


def detect_foreground_segmentation(data_dict):
    """Pull the foreground mask and contour map out of the preprocessed channels."""
    if "foreground" in data_dict and "contour" in data_dict:
        return data_dict["foreground"], data_dict["contour"]
    if "foreground_contour" in data_dict:
        return data_dict["foreground_contour"]
    raise ValueError("Foreground and contour channels are required for tracking.")


def cellpose_segmentation(data_dict, cellpose_config: CellposeConfig) -> np.ndarray:
    """Per-frame cellpose instance labels (requires the cellpose package)."""
    try:
        from cellpose import models as cp_models
    except ImportError:
        raise click.ClickException(
            "cellpose is not installed; use segmentation_method "
            "'foreground_contour' (native) or install cellpose."
        ) from None
    channel_name = cellpose_config.input_channel
    if channel_name not in data_dict:
        raise ValueError(
            f"Cellpose input channel '{channel_name}' not found in data. "
            f"Available: {list(data_dict.keys())}"
        )
    images = np.asarray(data_dict[channel_name])
    if images.ndim == 4:
        images = images.mean(axis=1)
    model = cp_models.CellposeModel(
        model_type=cellpose_config.model_type, gpu=cellpose_config.gpu
    )
    labels = np.zeros_like(images, dtype=np.int32)
    for t in range(images.shape[0]):
        mask, _, _ = model.eval(
            images[t],
            diameter=cellpose_config.diameter,
            channels=[0, 0],
            cellprob_threshold=cellpose_config.cellprob_threshold,
            flow_threshold=cellpose_config.flow_threshold,
            min_size=cellpose_config.min_size,
        )
        labels[t] = np.asarray(mask)
    return labels


def track_one_position(
    position_key,
    input_images,
    output_dirpath: Path,
    tracking_config: dict,
    blank_frames_path=None,
    z_slices=None,
    scale=(1, 1, 1, 1, 1),
    cellpose_config: CellposeConfig | None = None,
    z_slicing: ZSlicing | None = None,
    output_mode: str = "2D",
):
    """Run segmentation + tracking on one FOV and write labels/CSV."""
    if z_slicing is None:
        z_slicing = ZSlicing()
    fov = "_".join(position_key)
    click.echo(f"Processing FOV: {fov.replace('_', '/')}")

    pixel_size = scale[-1]
    data_dict = _load_and_preprocess(
        position_key, input_images, z_slices, blank_frames_path, z_slicing, pixel_size
    )

    linking_config = tracking_config.get("linking_config", {})
    max_distance = float(linking_config.get("max_distance", 50.0))
    # Extension over ultrack's schema: gap closing across blank frames
    # (ultrack gets this from its windowed ILP; the native engine runs a
    # global segment-linking pass, tracking/engine.py::close_track_gaps).
    max_gap = int(linking_config.get("max_gap", 0))
    segmentation_config = tracking_config.get("segmentation_config", {})
    min_size = int(segmentation_config.get("min_area", 4))
    # Extension over ultrack's schema: temporally consistent 2-level
    # hierarchy selection (ultrack's over/under-segmentation repair
    # equivalent, tracking/engine.py::select_hierarchy_labels).
    hierarchy = bool(segmentation_config.get("hierarchy_selection", False))

    if cellpose_config is not None:
        labels = cellpose_segmentation(data_dict, cellpose_config)
        tracking_labels, tracks_df = track_from_labels(
            labels, scale=scale, max_distance=max_distance, max_gap=max_gap
        )
    else:
        foreground, contour = detect_foreground_segmentation(data_dict)
        foreground = np.asarray(foreground)
        contour = np.asarray(contour)
        if output_mode == "2D" and foreground.ndim == 4:
            foreground = foreground.mean(axis=1)
            contour = contour.mean(axis=1)
        tracking_labels, tracks_df = track_from_foreground_contour(
            foreground, contour, scale=scale, max_distance=max_distance,
            min_size=min_size, max_gap=max_gap, hierarchy=hierarchy,
        )

    csv_path = Path(output_dirpath) / Path(*position_key) / f"tracks_{fov}.csv"
    os.makedirs(csv_path.parent, exist_ok=True)
    tracks_df.to_csv(csv_path, index=False)
    click.echo(f"Saved tracks to: {Path(output_dirpath) / Path(*position_key)}")

    labels = np.asarray(tracking_labels, dtype=np.uint32)
    output_dataset = open_ome_zarr(Path(output_dirpath) / Path(*position_key), mode="r+")
    if output_mode == "2D":
        if labels.ndim != 3:
            raise ValueError(
                f"output_mode='2D' expects (T, Y, X) labels but tracking produced "
                f"shape {labels.shape}. Ensure input_images projects Z (e.g. np.mean)."
            )
        output_dataset["0"][:, 0, 0] = labels
    else:
        if labels.ndim != 4:
            raise ValueError(
                f"output_mode='3D' expects (T, Z, Y, X) labels but tracking produced "
                f"shape {labels.shape}."
            )
        output_dataset["0"][:, 0] = labels
    return tracking_labels, tracks_df


def _init_output_plate(input_position_dirpaths, output_dirpath, settings: TrackingSettings):
    dataset = open_ome_zarr(str(input_position_dirpaths[0]), mode="r")
    T, C, Z, Y, X = dataset.data.shape
    scale = dataset.scale

    _, z_win = resolve_z_slice(settings.z_slicing, Z)
    if settings.output_mode == "2D":
        output_shape = (T, 1, 1, Y, X)
    else:
        output_shape = (T, 1, z_win, Y, X)

    position_keys = [Path(p).parts[-3:] for p in input_position_dirpaths]
    input_plate = Path(input_position_dirpaths[0]).parents[2]
    version = settings.output_ome_zarr_version or get_ome_zarr_version(input_plate)
    create_empty_plate(
        store_path=output_dirpath,
        position_keys=position_keys,
        channel_names=[f"{settings.target_channel}_labels"],
        shape=output_shape,
        scale=scale,
        version=version,
        dtype=np.uint32,
        metadata_sources=input_plate,
        metadata_keys=PROVENANCE_METADATA_KEYS,
    )
    output_plate = open_ome_zarr(output_dirpath, mode="r+")
    for _, output_position in output_plate.positions():
        output_position.update_zattrs({"biahub-track": settings.model_dump(mode="json")})
    click.echo(f"Created {output_dirpath} ({len(position_keys)} positions)")
    return (T, C, output_shape[2], Y, X)


def track(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = True,
    init_only: bool = False,
    input_images_path: str | None = None,
):
    output_dirpath = Path(output_dirpath)
    settings = yaml_to_model(config_filepath, TrackingSettings)

    input_plate = Path(input_position_dirpaths[0]).parents[2]
    primary_path = Path(input_images_path) if input_images_path is not None else input_plate
    for image in settings.input_images:
        if image.path is None:
            image.path = primary_path
            break

    output_shape = _init_output_plate(input_position_dirpaths, output_dirpath, settings)
    T, C, Z_out, Y, X = output_shape

    _, num_cpus, gb_ram_per_cpu = estimate_resources(
        shape=(T, C, Z_out, Y, X), ram_multiplier=16, max_num_cpus=16
    )
    echo_resources(num_cpus, num_cpus * gb_ram_per_cpu, 60)

    if init_only:
        click.echo(
            f"Initialized {output_dirpath} ({len(input_position_dirpaths)} positions)"
        )
        return

    dataset = open_ome_zarr(str(input_position_dirpaths[0]), mode="r")
    T, C, Z, Y, X = dataset.data.shape
    scale = dataset.scale

    z_slices, _ = resolve_z_slice(settings.z_slicing, Z)
    track_scale = scale[-2:] if settings.output_mode == "2D" else scale[-3:]

    cellpose_cfg = (
        settings.cellpose_config if settings.segmentation_method == "cellpose" else None
    )

    resolve_cluster(cluster=cluster)
    position_keys = [Path(p).parts[-3:] for p in input_position_dirpaths]
    for position_key in position_keys:
        track_one_position(
            position_key=position_key,
            output_dirpath=output_dirpath,
            tracking_config=settings.tracking_config,
            input_images=settings.input_images,
            blank_frames_path=settings.blank_frames_path,
            z_slices=z_slices,
            scale=track_scale,
            cellpose_config=cellpose_cfg,
            z_slicing=settings.z_slicing,
            output_mode=settings.output_mode,
        )
        click.echo(f"Tracking complete: {'/'.join(position_key)}")


@click.command("track")
@input_position_dirpaths()
@config_filepath()
@output_dirpath()
@sbatch_filepath()
@cluster()
@monitor()
@init_only()
@click.option(
    "--input-images-path",
    default=None,
    type=click.Path(exists=True),
    help="Pixel-data source filling the first null input_images path (used by "
    "pipelines). If omitted, that null path falls back to the -i input plate.",
)
def track_cli(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = False,
    init_only: bool = False,
    input_images_path: str | None = None,
):
    """Track objects in 2D or 3D time-lapse microscopy data using configurable preprocessing.

    \b
    Batch a whole plate's positions:
    >>> biahub track -i ./reconstruct.zarr/*/*/* -o ./track.zarr -c config.yml

    \b
    Initialize the output plate only:
    >>> biahub track --init -i ./reconstruct.zarr/*/*/* -o ./track.zarr -c config.yml

    \b
    In-process run of a single position:
    >>> biahub track --cluster debug -i ./reconstruct.zarr/B/3/000000 \\
        -o ./track.zarr -c config.yml --input-images-path ./virtual-stain.zarr
    """  # noqa: D301
    track(
        input_position_dirpaths=input_position_dirpaths,
        output_dirpath=output_dirpath,
        config_filepath=config_filepath,
        sbatch_filepath=sbatch_filepath,
        cluster=cluster,
        monitor=monitor,
        init_only=init_only,
        input_images_path=input_images_path,
    )


if __name__ == "__main__":
    track_cli()


def run_ultrack(tracking_config, foreground, contour, scale, databaset_path=None):
    """Reference-name API (reference: biahub/track.py:406-477): track from
    foreground/contour maps. Uses the ultrack solver when the package is
    installed, otherwise the native engine (seeded instance split + Hungarian
    linking with divisions)."""
    try:  # pragma: no cover - optional heavyweight dependency
        from ultrack import track as _ultrack_track  # type: ignore

        return _ultrack_track(
            tracking_config, foreground=foreground, contours=contour, scale=scale
        )
    except ImportError:
        max_distance = 50.0
        if tracking_config is not None:
            linking = getattr(tracking_config, "linking_config", None) or (
                tracking_config.get("linking_config", {})
                if isinstance(tracking_config, dict)
                else {}
            )
            max_distance = float(
                getattr(linking, "max_distance", None)
                or (linking.get("max_distance", 50.0) if isinstance(linking, dict) else 50.0)
            )
            max_gap = int(
                getattr(linking, "max_gap", 0)
                or (linking.get("max_gap", 0) if isinstance(linking, dict) else 0)
            )
            seg = getattr(tracking_config, "segmentation_config", None) or (
                tracking_config.get("segmentation_config", {})
                if isinstance(tracking_config, dict)
                else {}
            )
            hierarchy = bool(
                getattr(seg, "hierarchy_selection", False)
                or (seg.get("hierarchy_selection", False) if isinstance(seg, dict) else False)
            )
        else:
            max_gap = 0
            hierarchy = False
        labels, tracks_df = track_from_foreground_contour(
            np.asarray(foreground), np.asarray(contour),
            scale=scale, max_distance=max_distance, max_gap=max_gap,
            hierarchy=hierarchy,
        )
        return tracks_df, labels


def run_cellpose_per_frame(data_dict, cellpose_config) -> np.ndarray:
    """Reference-name wrapper for per-frame cellpose segmentation."""
    return cellpose_segmentation(data_dict, cellpose_config)

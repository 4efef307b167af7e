"""``biahub segment``: multi-model segmentation of a plate.

Mirrors the reference verb (reference: biahub/segment.py:31-262): a dict of
named segmentation models, each with a preprocessing chain, optional 2D
z-slice mode, and eval args, produces one output channel per model.

Model dispatch: ``path_to_model`` values understood natively are
``"threshold_otsu"`` (Otsu foreground + distance-based instance splitting,
implemented in numpy/scipy and usable without any ML dependency); anything
else is treated as a cellpose model and requires the optional cellpose
package.
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np
from scipy import ndimage

from biahub_tpu.cli.parsing import (
    config_filepath,
    input_position_dirpaths,
    local,
    monitor,
    output_dirpath,
    sbatch_filepath,
)
from biahub_tpu.cli.resolve_function import resolve_function
from biahub_tpu.cli.utils import get_output_paths, yaml_to_model
from biahub_tpu.io.ngff import create_empty_plate, get_ome_zarr_version, open_ome_zarr
from biahub_tpu.runtime import estimate_resources, resolve_cluster
from biahub_tpu.settings import SegmentationSettings

__all__ = ["segment_data", "segment_cli", "otsu_threshold", "threshold_instance_labels"]


def otsu_threshold(data: np.ndarray) -> float:
    """Otsu's threshold (replaces skimage.filters.threshold_otsu)."""
    data = np.asarray(data).ravel()
    hist, bin_edges = np.histogram(data, bins=256)
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2
    weight1 = np.cumsum(hist)
    weight2 = np.cumsum(hist[::-1])[::-1]
    with np.errstate(invalid="ignore", divide="ignore"):
        mean1 = np.cumsum(hist * centers) / weight1
        mean2 = (np.cumsum((hist * centers)[::-1]) / weight2[::-1])[::-1]
    variance = weight1[:-1] * weight2[1:] * (mean1[:-1] - mean2[1:]) ** 2
    if not np.isfinite(variance).any():
        return float(np.mean(data))
    return float(centers[:-1][np.nanargmax(variance)])


def threshold_instance_labels(
    zyx: np.ndarray, min_size: int = 20, split: bool = True
) -> np.ndarray:
    """Instance labels via Otsu foreground + distance-peak Voronoi splitting."""
    zyx = np.asarray(zyx, dtype=np.float32)
    foreground = zyx > otsu_threshold(zyx)
    if not foreground.any():
        return np.zeros(zyx.shape, np.uint32)
    if split:
        distance = ndimage.distance_transform_edt(foreground)
        # Seeds: local maxima of the distance map
        footprint = np.ones((3,) * zyx.ndim)
        local_max = (distance == ndimage.maximum_filter(distance, footprint=footprint)) & (
            distance > 1
        )
        markers, n = ndimage.label(local_max)
        if n > 0:
            _, nearest = ndimage.distance_transform_edt(markers == 0, return_indices=True)
            labels = markers[tuple(nearest)]
            labels[~foreground] = 0
        else:
            labels, _ = ndimage.label(foreground)
    else:
        labels, _ = ndimage.label(foreground)
    counts = np.bincount(labels.ravel())
    small = np.where(counts < min_size)[0]
    if len(small):
        labels[np.isin(labels, small)] = 0
    return labels.astype(np.uint32)


#: cellpose eval args the native CPnet engine understands (everything else in
#: ``eval_args`` is either harmless plumbing that is ignored, or unsupported
#: and raises — see :func:`_cpnet_eval`).
_CPNET_EVAL_KEYS = (
    "channels",
    "diameter",
    "diam_mean",
    "cellprob_threshold",
    "flow_threshold",
    "min_size",
    "niter",
    "normalize",
    "stitch_threshold",
)
_CPNET_IGNORED_KEYS = ("batch_size", "channel_axis", "z_axis", "gpu", "progress")


def _cpnet_eval(czyx: np.ndarray, checkpoint: str, eval_args: dict) -> np.ndarray:
    """Map cellpose-style ``eval_args`` onto the native CPnet engine."""
    from biahub_tpu.segmentation import cpnet_segment_czyx

    kwargs = {}
    for key, value in dict(eval_args).items():
        if key in _CPNET_EVAL_KEYS:
            kwargs[key] = tuple(value) if key == "channels" else value
        elif key in _CPNET_IGNORED_KEYS:
            continue
        elif key == "do_3D" and value:
            raise click.ClickException(
                "do_3D=True (orthogonal-view 3D flows) is not supported by the "
                "native CPnet engine; use stitch_threshold for 3D objects, or "
                "install cellpose."
            )
        elif key != "do_3D":
            raise click.ClickException(
                f"eval arg '{key}' is not understood by the native CPnet "
                f"engine (supported: {', '.join(_CPNET_EVAL_KEYS)})."
            )
    return cpnet_segment_czyx(czyx, checkpoint, **kwargs)


def segment_data(
    czyx_data: np.ndarray,
    segmentation_models: dict,
    gpu: bool = True,
) -> np.ndarray:
    """Segment one CZYX volume with each configured model; stacks results."""
    czyx_data = np.asarray(czyx_data, dtype=np.float32)
    czyx_segmentation = []
    for model_name, model_args in segmentation_models.items():
        click.echo(f"Segmenting with model {model_name}")
        z_slice_2d = model_args.z_slice_2D
        czyx_to_segment = (
            czyx_data[:, z_slice_2d : z_slice_2d + 1]
            if z_slice_2d is not None
            else czyx_data
        )

        for preproc in model_args.preprocessing:
            func = resolve_function(preproc.function)
            kwargs = dict(preproc.kwargs)
            if "out_range" in kwargs and isinstance(kwargs["out_range"], list):
                kwargs["out_range"] = tuple(kwargs["out_range"])
            c_idx = preproc.channel
            click.echo(
                f"Processing with {func.__name__} with kwargs {kwargs} to channel {c_idx}"
            )
            czyx_data[int(c_idx)] = func(czyx_data[int(c_idx)], **kwargs)

        if model_args.path_to_model == "threshold_otsu":
            min_size = int(model_args.eval_args.get("min_size", 20))
            segmentation = np.stack(
                [threshold_instance_labels(z, min_size=min_size) for z in czyx_to_segment]
            ).max(axis=0)
        elif Path(model_args.path_to_model).is_file():
            # A checkpoint file on disk: run it through the TPU-native CPnet
            # engine (flax network + flow-dynamics mask reconstruction).
            segmentation = _cpnet_eval(
                czyx_to_segment, model_args.path_to_model, model_args.eval_args
            )
        else:
            try:
                from cellpose import models as cp_models
            except ImportError:
                raise click.ClickException(
                    f"Model '{model_args.path_to_model}' requires the cellpose "
                    "package, which is not installed (built-in model names like "
                    "'cyto' are download-backed). Native alternatives: "
                    "'threshold_otsu' (no checkpoint needed), or a path to a "
                    "cellpose-schema CPnet .pt checkpoint, which runs on the "
                    "TPU-native flax engine."
                ) from None
            model = cp_models.CellposeModel(model_type=model_args.path_to_model, gpu=gpu)
            segmentation, _, _ = model.eval(
                czyx_to_segment, channel_axis=0, z_axis=1, **model_args.eval_args
            )
        if z_slice_2d is not None and isinstance(z_slice_2d, int):
            if np.asarray(segmentation).ndim == 2:
                segmentation = np.asarray(segmentation)[np.newaxis, ...]
        czyx_segmentation.append(np.asarray(segmentation))
    return np.stack(czyx_segmentation, axis=0)


@click.command("segment")
@input_position_dirpaths()
@config_filepath()
@output_dirpath()
@sbatch_filepath()
@local()
@monitor()
def segment_cli(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    local: bool = False,
    monitor: bool = True,
):
    """Segment a single position across T axes using the configuration file.

    >>> biahub segment \\
        -i ./input.zarr/*/*/* \\
        -c ./segment_params.yml \\
        -o ./output.zarr
    """
    output_dirpath = Path(output_dirpath)
    output_position_paths = get_output_paths(input_position_dirpaths, output_dirpath)

    settings = yaml_to_model(config_filepath, SegmentationSettings)

    input_dataset = open_ome_zarr(input_position_dirpaths[0])
    T, C, Z, Y, X = input_dataset.data.shape
    scale = input_dataset.scale

    # One output channel per model; 2D models collapse Z to 1 only if every
    # model is 2D.
    model_names = list(settings.models.keys())
    all_2d = all(m.z_slice_2D is not None for m in settings.models.values())
    z_out = 1 if all_2d else Z

    version = settings.output_ome_zarr_version or get_ome_zarr_version(
        Path(input_position_dirpaths[0]).parents[2]
    )
    create_empty_plate(
        store_path=output_dirpath,
        position_keys=[Path(p).parts[-3:] for p in input_position_dirpaths],
        channel_names=[f"{name}_labels" for name in model_names],
        shape=(T, len(model_names), z_out, Y, X),
        scale=scale,
        dtype=np.uint32,
        version=version,
    )

    estimate_resources(shape=(T, C, Z, Y, X), ram_multiplier=8, max_num_cpus=16)
    resolve_cluster(None, local)

    for in_path, out_path in zip(input_position_dirpaths, output_position_paths):
        in_pos = open_ome_zarr(in_path, mode="r")
        out_pos = open_ome_zarr(out_path, mode="r+")
        out_pos.update_zattrs({"biahub-segment": settings.model_dump(mode="json")})
        out_arr = out_pos["0"]
        for t in range(T):
            segmentation = segment_data(in_pos.data[t], settings.models, gpu=False)
            out_arr[t] = segmentation.astype(np.uint32)
        click.echo(f"Segmentation complete: {in_path}")


if __name__ == "__main__":
    segment_cli()

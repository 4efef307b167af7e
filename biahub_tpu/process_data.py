"""``biahub process-with-config``: YAML-driven per-volume processing.

Generic escape hatch mirroring the reference (reference:
biahub/process_data.py:33-357): allow-listed functions (numpy, the built-in
binning, optional ultrack.imgproc) applied per CZYX timepoint. Functions are
arbitrary host callables, so this verb runs on the host with async zarr I/O;
the structured verbs (deskew, deconvolve, ...) are the device path.
"""

from __future__ import annotations

from collections.abc import Sequence
from pathlib import Path
from typing import Literal

import click
import numpy as np

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
from biahub_tpu.settings import ProcessingFunctions, ProcessingImportFuncSettings

__all__ = ["binning_czyx", "process_czyx", "process_with_config", "process_with_config_cli"]


def binning_czyx(
    czyx_data: np.ndarray,
    binning_factor_zyx: Sequence[int] = (1, 2, 2),
    mode: Literal["sum", "mean"] = "sum",
) -> np.ndarray:
    """Bin ZYX by summing or averaging windows (reference: biahub/process_data.py:33-106).

    Sum mode rescales each channel to span the dtype's range; mean mode
    averages (and rescales integer outputs to the dtype range).
    """
    C = czyx_data.shape[0]
    bz, by, bx = binning_factor_zyx
    new_z = czyx_data.shape[1] // bz
    new_y = czyx_data.shape[2] // by
    new_x = czyx_data.shape[3] // bx

    output = np.zeros((C, new_z, new_y, new_x), dtype=np.float32)
    for c in range(C):
        reshaped = (
            czyx_data[c, : new_z * bz, : new_y * by, : new_x * bx]
            .astype(np.float32)
            .reshape(new_z, bz, new_y, by, new_x, bx)
        )
        if mode == "sum":
            output[c] = reshaped.sum(axis=(1, 3, 5))
            if output[c].max() > 0:
                if np.issubdtype(czyx_data.dtype, np.integer):
                    max_val = np.iinfo(czyx_data.dtype).max
                else:
                    max_val = np.iinfo(np.uint16).max
                rng = output[c].max() - output[c].min()
                if rng > 0:
                    output[c] = (output[c] - output[c].min()) * max_val / rng
        elif mode == "mean":
            output[c] = reshaped.mean(axis=(1, 3, 5))
        else:
            raise ValueError(f"Invalid mode: {mode}. Must be 'sum' or 'mean'.")

    if mode == "mean" and np.issubdtype(czyx_data.dtype, np.integer):
        if output.max() > 0:
            output = output * np.iinfo(czyx_data.dtype).max / output.max()
    return output.astype(czyx_data.dtype)


CUSTOM_FUNCTIONS = {
    "biahub.process_data.binning_czyx": binning_czyx,
    "biahub_tpu.process_data.binning_czyx": binning_czyx,
}


def process_czyx(
    czyx_data: np.ndarray,
    processing_functions: list[ProcessingFunctions],
) -> np.ndarray:
    """Apply the configured processing chain to one CZYX volume."""
    for proc in processing_functions:
        func = resolve_function(proc.function, custom_functions=CUSTOM_FUNCTIONS)
        kwargs = proc.kwargs
        if len(proc.input_channels) == 1:
            c_idx = proc.input_channels[0]
        else:
            raise ValueError("Only one input channel is supported for now")
        click.echo(f"Processing with {func.__name__} with kwargs {kwargs} to channel {c_idx}")
        czyx_data = func(czyx_data, **kwargs)
    return czyx_data


def process_with_config(
    input_position_dirpaths: Sequence[Path],
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: Path | None = None,
    local: bool = False,
    block: bool = False,
    monitor: bool = True,
) -> None:
    """Process data with functions specified in the config file."""
    output_dirpath = Path(output_dirpath)
    output_position_paths = get_output_paths(input_position_dirpaths, output_dirpath)

    dataset = open_ome_zarr(input_position_dirpaths[0])
    T, C, Z, Y, X = dataset.data.shape
    channel_names = dataset.channel_names
    scale_dataset = dataset.scale

    settings = yaml_to_model(config_filepath, ProcessingImportFuncSettings)
    if not settings.processing_functions:
        raise ValueError("Processing functions must be specified")
    for proc in settings.processing_functions:
        if proc.input_channels is not None and len(proc.input_channels) == 1:
            proc.input_channels[0] = channel_names.index(proc.input_channels[0])
        else:
            raise ValueError("Channel must be specified for preprocessing functions")
        resolved = resolve_function(proc.function, custom_functions=CUSTOM_FUNCTIONS)
        if not callable(resolved):
            raise ValueError(f"Function {proc.function} is not callable")

    # Binning changes shape/scale; other functions are assumed shape-preserving
    binning_functions = (
        "biahub.process_data.binning_czyx",
        "biahub_tpu.process_data.binning_czyx",
    )
    output_shape = (T, C, Z, Y, X)
    new_scale = scale_dataset
    for proc in settings.processing_functions:
        if proc.function in binning_functions:
            binning_factor = proc.kwargs.get("binning_factor_zyx", (1, 4, 4))
            click.echo(f"Binning factor: {binning_factor}")
            output_shape = (
                T,
                C,
                Z // binning_factor[0],
                Y // binning_factor[1],
                X // binning_factor[2],
            )
            new_scale = [
                scale_dataset[0],
                scale_dataset[1],
                scale_dataset[2] * binning_factor[0],
                scale_dataset[3] * binning_factor[1],
                scale_dataset[4] * binning_factor[2],
            ]
            break

    version = settings.output_ome_zarr_version or get_ome_zarr_version(
        Path(input_position_dirpaths[0]).parents[2]
    )
    create_empty_plate(
        store_path=output_dirpath,
        position_keys=[Path(p).parts[-3:] for p in input_position_dirpaths],
        channel_names=channel_names,
        shape=output_shape,
        scale=new_scale,
        dtype=np.float32,
        version=version,
    )

    estimate_resources(shape=output_shape, dtype=np.float32, ram_multiplier=4, max_num_cpus=16)
    resolve_cluster(None, local)

    for input_position_path, output_position_path in zip(
        input_position_dirpaths, output_position_paths
    ):
        in_pos = open_ome_zarr(input_position_path, mode="r")
        out_pos = open_ome_zarr(output_position_path, mode="r+")
        out_pos.update_zattrs(
            {"biahub-process_with_config": settings.model_dump()}
        )
        out_arr = out_pos["0"]
        futures = []
        for t in range(T):
            result = process_czyx(in_pos.data[t], settings.processing_functions)
            futures.append(out_arr.write_async((t,), result.astype(np.float32)))
        for f in futures:
            f.result()
        click.echo(f"Processed {input_position_path}")


@click.command("process-with-config")
@input_position_dirpaths()
@config_filepath()
@output_dirpath()
@sbatch_filepath()
@local()
@monitor()
def process_with_config_cli(
    input_position_dirpaths: Sequence[Path],
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: Path | None = None,
    local: bool = False,
    monitor: bool = True,
) -> None:
    """Process data with functions specified in the config file.

    >>> biahub process-with-config \\
        -i ./timelapse.zarr/0/0/0 \\
        -c ./process_params.yml \\
        -o ./processed_timelapse.zarr
    """
    process_with_config(
        input_position_dirpaths=input_position_dirpaths,
        config_filepath=config_filepath,
        output_dirpath=output_dirpath,
        sbatch_filepath=sbatch_filepath,
        local=local,
        monitor=monitor,
    )


if __name__ == "__main__":
    process_with_config_cli()

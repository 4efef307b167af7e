"""``biahub concatenate``: merge N stores into one plate, with optional crops.

Mirrors the reference semantics (reference: biahub/concatenate.py:40-644):
per-path channel selection with dedup, per-path Z/Y/X crop windows, shape/
dtype/voxel-size reconciliation, chunk/shard control, unique-position
suffixing, resolve mode (--concat-data-paths), --init, and --resume with a
settings fingerprint. Concatenation is pure data movement, so it runs as
overlapped tensorstore async reads/writes on the host — no device time.
"""

from __future__ import annotations

import glob
from pathlib import Path

import click
import numpy as np
import yaml

from biahub_tpu.cli.parsing import (
    cluster,
    config_filepath,
    init_only,
    monitor,
    natsorted,
    output_dirpath,
    resume,
    sbatch_filepath,
    num_processes,
)
from biahub_tpu.cli.utils import (
    PROVENANCE_METADATA_KEYS,
    get_output_paths,
    model_to_yaml,
    yaml_to_model,
)
from biahub_tpu.io.ngff import create_empty_plate, get_ome_zarr_version, open_ome_zarr
from biahub_tpu.io.progress import ProgressStore
from biahub_tpu.runtime import (
    echo_resources,
    estimate_resources,
    resolve_cluster,
    settings_fingerprint,
)
from biahub_tpu.settings import ConcatenateSettings

__all__ = ["concatenate", "concatenate_cli"]


def get_path_slice_param(slice_param, path_index, total_paths):
    """Pick the slice spec for one path: 'all', shared [start, end], or per-path."""
    if slice_param == "all":
        return "all"
    if isinstance(slice_param, list):
        if len(slice_param) == 2 and all(isinstance(i, int) for i in slice_param):
            return slice_param
        return slice_param[path_index] if path_index < len(slice_param) else slice_param[-1]
    return slice_param


def get_slice(slice_param, max_value: int) -> slice:
    if slice_param == "all":
        return slice(0, max_value)
    if (
        isinstance(slice_param, list)
        and len(slice_param) == 2
        and all(isinstance(i, int) for i in slice_param)
    ):
        return slice(*slice_param)
    raise ValueError(f"Invalid slice parameter: {slice_param}")


def create_path_slicing_params(path_z_slice, path_y_slice, path_x_slice, dataset_shape):
    return [
        get_slice(path_z_slice, dataset_shape[2]),
        get_slice(path_y_slice, dataset_shape[3]),
        get_slice(path_x_slice, dataset_shape[4]),
    ]


def calculate_cropped_size(slice_params_zyx) -> tuple[int, int, int]:
    sizes = tuple(abs(s.stop - s.start) for s in slice_params_zyx)
    click.echo(f"Output ZYX shape after cropping: {sizes}")
    return sizes


def validate_slicing_params_zyx(slicing_params_list) -> None:
    first = calculate_cropped_size(slicing_params_list[0])
    for i, params in enumerate(slicing_params_list[1:], 1):
        size = calculate_cropped_size(params)
        if size != first:
            raise ValueError(
                f"Inconsistent slice sizes detected. Path 0 has size {first}, "
                f"but path {i} has size {size}. All paths must have the same slice size."
            )


def get_channel_combiner_metadata(
    data_paths_list: list[str],
    processing_channel_names: list,
    slicing_params: list,
):
    """Expand path globs; derive merged channel list + per-path channel/slice maps."""
    z_slice_param, y_slice_param, x_slice_param = slicing_params

    expanded_paths = []
    for paths in data_paths_list:
        expanded_paths.append(
            [Path(p) for p in natsorted(glob.glob(str(paths))) if Path(p).is_dir()]
        )
    all_data_paths = [p for group in expanded_paths for p in group]

    all_channel_names: list[str] = []
    input_channel_idx: list[list[int]] = []
    output_channel_idx: list[list[int]] = []
    all_slicing_params: list[list[slice]] = []
    counter = 0

    for i, (paths, per_datapath_channels) in enumerate(
        zip(expanded_paths, processing_channel_names)
    ):
        dataset = open_ome_zarr(paths[0])
        channel_names = dataset.channel_names

        path_z = get_path_slice_param(z_slice_param, i, len(data_paths_list))
        path_y = get_path_slice_param(y_slice_param, i, len(data_paths_list))
        path_x = get_path_slice_param(x_slice_param, i, len(data_paths_list))
        for _ in paths:
            all_slicing_params.append(
                create_path_slicing_params(path_z, path_y, path_x, dataset.data.shape)
            )

        if per_datapath_channels == "all":
            per_datapath_channels = channel_names

        out_indices: list[int] = []
        in_indices: list[int] = []
        for channel in per_datapath_channels:
            if channel in channel_names:
                if channel not in all_channel_names:
                    all_channel_names.append(channel)
                    out_indices.append(counter)
                    counter += 1
                else:
                    click.echo(
                        f"Warning: Channel {channel} already exists. Skipping and "
                        f"using index from the first entry."
                    )
                    counter = all_channel_names.index(channel)
                    out_indices.append(counter)
                in_indices.append(channel_names.index(channel))

        input_channel_idx.extend([in_indices for _ in paths])
        output_channel_idx.extend([out_indices for _ in paths])

    if len(all_slicing_params) > 1:
        validate_slicing_params_zyx(all_slicing_params)

    click.echo(f"Channel names: {all_channel_names}")
    click.echo(f"Input channel indices: {input_channel_idx}")
    click.echo(f"Output channel indices: {output_channel_idx}")
    return (
        all_data_paths,
        all_channel_names,
        input_channel_idx,
        output_channel_idx,
        all_slicing_params,
    )


def _unique_source_plates(data_paths: list[Path]) -> list[Path]:
    seen = set()
    plates = []
    for p in data_paths:
        plate = Path(p).parents[2]
        if plate not in seen:
            seen.add(plate)
            plates.append(plate)
    return plates


def _resolve_time_indices(settings: ConcatenateSettings, all_shapes) -> list[int]:
    T = all_shapes[0][0]
    if settings.time_indices == "all":
        if not all(s[0] == T for s in all_shapes):
            click.echo(
                "Warning: Datasets have different number of time points. "
                "Taking the smallest number of time points."
            )
        return list(range(min(s[0] for s in all_shapes)))
    if isinstance(settings.time_indices, list):
        return settings.time_indices
    if isinstance(settings.time_indices, int):
        return [settings.time_indices]
    return list(range(T))


def _prepare_concatenate(settings: ConcatenateSettings, output_dirpath: Path) -> dict:
    """Resolve metadata, create the output plate idempotently."""
    slicing_params = [settings.Z_slice, settings.Y_slice, settings.X_slice]
    (
        all_data_paths,
        all_channel_names,
        input_channel_idx_list,
        output_channel_idx_list,
        all_slicing_params,
    ) = get_channel_combiner_metadata(
        settings.concat_data_paths, settings.channel_names, slicing_params
    )

    output_position_paths = get_output_paths(
        all_data_paths,
        output_dirpath,
        ensure_unique_positions=settings.ensure_unique_positions,
    )

    all_shapes, all_dtypes, all_voxel_sizes = [], [], []
    for path in all_data_paths:
        dataset = open_ome_zarr(path)
        if len(dataset.array_names()) > 1:
            raise ValueError(
                "Concatenation of datasets with multiple arrays (pyramid levels) "
                "is not supported."
            )
        all_shapes.append(dataset.data.shape)
        all_dtypes.append(dataset.data.dtype)
        all_voxel_sizes.append(dataset.scale[-3:])

    if (
        settings.Z_slice == "all"
        and settings.Y_slice == "all"
        and settings.X_slice == "all"
        and not all(s[-3:] == all_shapes[0][-3:] for s in all_shapes)
    ):
        raise ValueError(
            "Datasets have different shapes. All ZYX shapes must match to "
            "concatenate when using 'all' for slicing."
        )
    if not all(v == all_voxel_sizes[0] for v in all_voxel_sizes):
        click.echo("Warning: Datasets have different voxel sizes. Taking the first voxel size.")

    T, C, Z, Y, X = all_shapes[0]
    output_voxel_size = all_voxel_sizes[0]
    if all(d == all_dtypes[0] for d in all_dtypes):
        dtype = all_dtypes[0]
    else:
        click.echo("Warning: not all dtypes match. Casting data at float32.")
        dtype = np.float32

    input_time_indices = _resolve_time_indices(settings, all_shapes)

    if not all(s[-3:] == all_shapes[0][-3:] for s in all_shapes):
        click.echo(
            "Warning: Datasets have different shapes, but slicing parameters are "
            "specified. Will validate output shapes after cropping."
        )

    cropped_shape_zyx = calculate_cropped_size(all_slicing_params[0])
    if cropped_shape_zyx[0] > Z or cropped_shape_zyx[1] > Y or cropped_shape_zyx[2] > X:
        raise ValueError("The cropped shape is larger than the original shape.")

    chunk_size = [1] + list(settings.chunks_czyx) if settings.chunks_czyx else None
    version = settings.output_ome_zarr_version or get_ome_zarr_version(
        Path(all_data_paths[0]).parents[2]
    )

    create_empty_plate(
        store_path=output_dirpath,
        position_keys=[Path(p).parts[-3:] for p in output_position_paths],
        channel_names=all_channel_names,
        shape=(len(input_time_indices), len(all_channel_names)) + tuple(cropped_shape_zyx),
        chunks=chunk_size,
        shards_ratio=settings.shards_ratio,
        scale=(1,) * 2 + tuple(output_voxel_size),
        dtype=dtype,
        version=version,
        metadata_sources=_unique_source_plates(all_data_paths)[-1],
        metadata_keys=PROVENANCE_METADATA_KEYS,
    )
    click.echo(f"Created {output_dirpath} ({len(output_position_paths)} positions)")

    return {
        "all_data_paths": all_data_paths,
        "output_position_paths": output_position_paths,
        "input_channel_idx_list": input_channel_idx_list,
        "output_channel_idx_list": output_channel_idx_list,
        "all_slicing_params": all_slicing_params,
        "input_time_indices": input_time_indices,
        "shape": (T, C, Z, Y, X),
    }


def _resolve_concatenate_config(config_path, output_config, concat_data_paths) -> None:
    """Inject concat_data_paths into a placeholder config and write it out."""
    with open(config_path) as f:
        raw = yaml.safe_load(f)
    raw["concat_data_paths"] = list(concat_data_paths)
    settings = ConcatenateSettings(**raw)
    model_to_yaml(settings, output_config)
    click.echo(f"Resolved config written to {output_config}")


def concatenate(
    settings: ConcatenateSettings,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    block: bool = False,
    monitor: bool = True,
    init_only: bool = False,
    resume: bool = False,
):
    """Concatenate datasets (with optional cropping)."""
    prep = _prepare_concatenate(settings, output_dirpath)
    input_time_indices = prep["input_time_indices"]

    T, C, Z, Y, X = prep["shape"]
    batch_size = settings.shards_ratio[0] if settings.shards_ratio else 1
    time_minutes = 360
    _, num_cpus, gb_ram_per_cpu = estimate_resources(
        shape=(max(T // batch_size, 1), C, Z, Y, X),
        ram_multiplier=8 * batch_size,
        max_num_cpus=16,
    )
    echo_resources(num_cpus, num_cpus * gb_ram_per_cpu, time_minutes)

    if init_only:
        return

    resolve_cluster(cluster=cluster)
    token = settings_fingerprint(settings)

    for (
        input_position_path,
        output_position_path,
        input_channel_idx,
        output_channel_idx,
        zyx_slicing,
    ) in zip(
        prep["all_data_paths"],
        prep["output_position_paths"],
        prep["input_channel_idx_list"],
        prep["output_channel_idx_list"],
        prep["all_slicing_params"],
    ):
        in_pos = open_ome_zarr(input_position_path, mode="r")
        out_pos = open_ome_zarr(output_position_path, mode="r+")
        out_pos.update_zattrs({"biahub-concatenate": settings.model_dump()})
        progress = ProgressStore(out_pos.path, token) if resume else None

        in_arr = in_pos["0"]
        out_arr = out_pos["0"]
        z_slice, y_slice, x_slice = zyx_slicing
        # Pipeline reads AND writes through tensorstore in bounded windows:
        # each window's reads are in flight while the previous window's
        # writes drain, without buffering the whole position in RAM.
        units = [
            (t_out, t_in, c_in, c_out)
            for t_out, t_in in enumerate(input_time_indices)
            for c_in, c_out in zip(input_channel_idx, output_channel_idx)
            if progress is None or not progress.is_done(t_out, c_out)
        ]
        window = 8
        writes = []
        for w0 in range(0, len(units), window):
            chunk = units[w0 : w0 + window]
            reads = [
                (
                    in_arr.read_async(
                        (int(t_in), int(c_in), z_slice, y_slice, x_slice)
                    ),
                    t_out,
                    c_out,
                )
                for t_out, t_in, c_in, c_out in chunk
            ]
            for future, t_out, c_out in writes:
                future.result()
                if progress is not None:
                    progress.mark_done(t_out, c_out)
            writes = []
            for read_future, t_out, c_out in reads:
                data = np.nan_to_num(np.asarray(read_future.result()), nan=0)
                writes.append(
                    (out_arr.write_async((t_out, c_out), data.astype(out_arr.dtype)),
                     t_out, c_out)
                )
        for future, t_out, c_out in writes:
            future.result()
            if progress is not None:
                progress.mark_done(t_out, c_out)
        click.echo(f"Concatenated {input_position_path} -> {output_position_path}")


@click.command("concatenate")
@config_filepath()
@output_dirpath()
@sbatch_filepath()
@cluster()
@monitor()
@init_only()
@resume()
@num_processes()
@click.option(
    "--concat-data-paths",
    multiple=True,
    type=str,
    help=(
        "Resolve mode: inject these concat_data_paths into the config and write "
        "the resolved config to -o (a YAML file), then exit. Repeat the flag once "
        "per source store."
    ),
)
def concatenate_cli(
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = False,
    init_only: bool = False,
    resume: bool = False,
    concat_data_paths: tuple[str, ...] = (),
    num_processes: int = 1,
):
    r"""Concatenate datasets (with optional cropping).

    \b
    Full end-to-end run:
    >>> biahub concatenate -c ./concat.yml -o ./output.zarr

    \b
    Resolve placeholder paths (pipeline config prep):
    >>> biahub concatenate \
        -c concat.yml -o resolved.yml \
        --concat-data-paths "deskew.zarr/*/*/*" \
        --concat-data-paths "reconstruct.zarr/*/*/*"

    \b
    Emit RESOURCES + create the output plate only:
    >>> biahub concatenate --init -c resolved.yml -o output.zarr

    \b
    Single-shot in-process run:
    >>> biahub concatenate --cluster debug -c resolved.yml -o output.zarr
    """
    if concat_data_paths:
        _resolve_concatenate_config(config_filepath, output_dirpath, concat_data_paths)
        return

    settings = yaml_to_model(config_filepath, ConcatenateSettings)
    concatenate(
        settings=settings,
        output_dirpath=output_dirpath,
        sbatch_filepath=sbatch_filepath,
        cluster=cluster,
        block=cluster in ("debug", "local"),
        monitor=monitor,
        init_only=init_only,
        resume=resume,
    )


if __name__ == "__main__":
    concatenate_cli()

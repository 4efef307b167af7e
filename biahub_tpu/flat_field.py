"""``biahub flat-field``: per-channel flat-field correction across a plate.

Verb layering mirrors the reference (reference: biahub/flat_field.py:160-324):
selected channels are corrected, all others copied; full --init/--resume
template. Corrected units run as device batches of the median-divide kernel.
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from biahub_tpu.cli.parsing import (
    cluster,
    config_filepath,
    init_only,
    input_position_dirpaths,
    monitor,
    output_dirpath,
    resume,
    sbatch_filepath,
    num_processes,
)
from biahub_tpu.cli.utils import (
    PROVENANCE_METADATA_KEYS,
    get_output_paths,
    yaml_to_model,
)
from biahub_tpu.io.ngff import create_empty_plate, get_ome_zarr_version, open_ome_zarr
from biahub_tpu.kernels.flat_field import flat_field_zyx
from biahub_tpu.runtime import (
    BatchRunner,
    echo_resources,
    estimate_resources,
    resolve_cluster,
    settings_fingerprint,
)
from biahub_tpu.settings import FlatFieldCorrectionSettings

__all__ = ["flat_field", "flat_field_cli"]


def _resolve_target_indices(
    settings: FlatFieldCorrectionSettings,
    all_channel_names: list[str],
    others_note: str = "Other channels will be copied as-is",
) -> list[int]:
    """Channel-name -> index resolution; ``others_note`` lets callers whose
    non-selected channels are NOT copies (the fuse verb runs the rest of the
    chain on them) echo the truth."""
    if settings.channel_names is None:
        click.echo(f"Flat fielding ALL channels: {all_channel_names}")
        target = all_channel_names
    elif settings.channel_names:
        for name in settings.channel_names:
            if name not in all_channel_names:
                raise click.ClickException(
                    f"Channel '{name}' not found in input dataset. "
                    f"Available channels: {all_channel_names}"
                )
        target = settings.channel_names
        click.echo(f"Input channels: {all_channel_names}")
        click.echo(f"Flat field channels: {target}")
        click.echo(others_note)
    else:
        raise click.ClickException(
            "Must specify either 'channel_names' or set channel_names to null in config."
        )
    return [all_channel_names.index(name) for name in target]


def flat_field(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = True,
    init_only: bool = False,
    resume: bool = False,
):
    output_dirpath = Path(output_dirpath)
    settings = yaml_to_model(config_filepath, FlatFieldCorrectionSettings)

    input_dataset = open_ome_zarr(str(input_position_dirpaths[0]), mode="r")
    all_channel_names = input_dataset.channel_names
    input_shape = input_dataset.data.shape
    scale = input_dataset.scale

    input_plate = Path(input_position_dirpaths[0]).parents[2]
    version = settings.output_ome_zarr_version or get_ome_zarr_version(input_plate)
    create_empty_plate(
        store_path=output_dirpath,
        position_keys=[Path(p).parts[-3:] for p in input_position_dirpaths],
        channel_names=all_channel_names,
        shape=input_shape,
        scale=scale,
        dtype=np.float32,
        version=version,
        metadata_sources=input_plate,
        metadata_keys=PROVENANCE_METADATA_KEYS,
    )

    # time_multiplier calibration matches the reference (worst observed 0.34
    # min/volume on CPU; reference: biahub/flat_field.py:202-209).
    time_minutes, num_cpus, gb_ram_per_cpu = estimate_resources(
        shape=input_shape, ram_multiplier=8, time_multiplier=0.7, max_num_cpus=16
    )
    echo_resources(num_cpus, num_cpus * gb_ram_per_cpu, time_minutes)

    if init_only:
        click.echo(
            f"Initialized {output_dirpath} ({len(input_position_dirpaths)} positions)"
        )
        return

    output_position_paths = get_output_paths(input_position_dirpaths, output_dirpath)
    target_indices = _resolve_target_indices(settings, all_channel_names)
    other_indices = [c for c in range(len(all_channel_names)) if c not in target_indices]

    resolved = resolve_cluster(cluster=cluster)
    click.echo(f"Running on-device batches (mode='{resolved}')")

    input_positions = [open_ome_zarr(p, mode="r") for p in input_position_dirpaths]
    output_positions = [open_ome_zarr(p, mode="r+") for p in output_position_paths]
    for out_pos in output_positions:
        out_pos.update_zattrs({"biahub-flat_field": settings.model_dump()})

    runner = BatchRunner(cluster=resolved)
    n = runner.run_zyx(
        flat_field_zyx,
        input_positions,
        output_positions,
        channel_pairs=[(c, c) for c in target_indices],
        resume=resume,
        resume_token=settings_fingerprint(settings),
        monitor=monitor and resolved != "debug",
    )
    if other_indices:
        runner.copy_channels(
            input_positions, output_positions, [(c, c) for c in other_indices]
        )
    click.echo(f"Flat-fielded {n} (t, c) volumes")
    for path in input_position_dirpaths:
        click.echo(f"Flat-field complete: {path}")


@click.command("flat-field")
@input_position_dirpaths()
@config_filepath()
@output_dirpath()
@sbatch_filepath()
@cluster()
@monitor()
@init_only()
@resume()
@num_processes()
def flat_field_cli(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = False,
    init_only: bool = False,
    resume: bool = False,
    num_processes: int = 1,
):
    """Apply flat field correction across T and selected C axes.

    \b
    Batch a whole plate's positions on device:
    >>> biahub flat-field -i ./input.zarr/*/*/* -c ./flat_field_params.yml -o ./output.zarr

    \b
    Initialize the output plate only:
    >>> biahub flat-field --init -i ./input.zarr/*/*/* -c ./flat_field_params.yml -o ./output.zarr

    \b
    In-process run of a single position:
    >>> biahub flat-field --cluster debug -i ./input.zarr/A/1/0 -c ./flat_field_params.yml -o ./output.zarr
    """  # noqa: D301
    flat_field(
        input_position_dirpaths=input_position_dirpaths,
        config_filepath=config_filepath,
        output_dirpath=output_dirpath,
        sbatch_filepath=sbatch_filepath,
        cluster=cluster,
        monitor=monitor,
        init_only=init_only,
        resume=resume,
    )


if __name__ == "__main__":
    flat_field_cli()


# Reference-name compatibility (reference: biahub/flat_field.py).
flat_field_correction = flat_field_zyx

"""``biahub pyramid``: multiscale pyramid levels per FOV.

Cascade downsampling per position (reference: biahub/pyramid.py:19-136);
each level is computed from the previous one.
"""

from __future__ import annotations

from pathlib import Path

import click

from biahub_tpu.cli.parsing import input_position_dirpaths, local, sbatch_filepath
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.runtime import estimate_resources, resolve_cluster

__all__ = ["pyramid", "pyramid_cli"]


def pyramid(fov_path: Path, levels: int, method: str) -> None:
    """Create pyramid levels for a single field of view."""
    click.echo(f"Computing pyramid for FOV: {fov_path}")
    dataset = open_ome_zarr(fov_path, mode="r+")
    dataset.compute_pyramid(levels=levels, method=method)


@click.command("pyramid")
@input_position_dirpaths()
@sbatch_filepath()
@local()
@click.option(
    "--levels",
    "-lv",
    type=int,
    default=4,
    show_default=True,
    help="Total number of resolution levels including level 0. E.g., levels=4 creates 0, 1, 2, 3.",
)
@click.option(
    "--method",
    "-m",
    type=click.Choice(["stride", "median", "mode", "mean", "min", "max"]),
    default="mean",
    show_default=True,
    help="Downsampling method to use.",
)
def pyramid_cli(
    input_position_dirpaths: list[Path],
    levels: int = 4,
    method: str = "mean",
    sbatch_filepath: Path | None = None,
    local: bool = False,
) -> None:
    """Create multi-scale pyramids for OME-Zarr datasets.

    Uses cascade downsampling to generate progressively downscaled pyramid levels.

    >>> biahub pyramid -i ./data.zarr/*/*/* --levels 4 --local
    """
    if levels <= 1:
        click.echo("No pyramid levels to create (levels must be > 1).")
        return

    input_dataset = open_ome_zarr(input_position_dirpaths[0], mode="r")
    estimate_resources(shape=input_dataset.data.shape, ram_multiplier=5)
    resolve_cluster(None, local)

    for fov_path in input_position_dirpaths:
        pyramid(fov_path=fov_path, levels=levels, method=method)


if __name__ == "__main__":
    pyramid_cli()

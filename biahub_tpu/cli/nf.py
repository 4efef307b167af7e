"""Nextflow helper utilities (reference: biahub/cli/nf.py:15-21)."""

import click

from biahub_tpu.io.ngff import open_ome_zarr


@click.group(name="nf")
def nf_cli():
    """Nextflow utilities."""


@nf_cli.command(name="list-positions")
@click.argument("plate_path", type=click.Path(exists=True, file_okay=False))
def list_positions(plate_path):
    """Print one row/col/fov position key per line for Nextflow fan-out."""
    dataset = open_ome_zarr(plate_path, mode="r")
    for name, _ in dataset.positions():
        click.echo(name)

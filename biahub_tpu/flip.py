"""``biahub flip``: in-place X/Y flip of positions (reference: biahub/flip.py:12-32)."""

from __future__ import annotations

import click

from biahub_tpu.cli.parsing import input_position_dirpaths
from biahub_tpu.io.ngff import open_ome_zarr

__all__ = ["flip_cli"]


@click.command("flip")
@input_position_dirpaths()
@click.option("-x", is_flag=True, help="Enable the x flag.")
@click.option("-y", is_flag=True, help="Enable the y flag.")
def flip_cli(input_position_dirpaths: list[str], x: bool, y: bool):
    """Flip the input position files in the specified direction.

    >>> biahub flip -i ./input.zarr/*/*/* --x
    """
    for input_position_filepath in input_position_dirpaths:
        print(f"Flipping {input_position_filepath}")
        dataset = open_ome_zarr(input_position_filepath, mode="r+")
        array = dataset["0"]
        T, C = array.shape[:2]
        for t in range(T):
            for c in range(C):
                print(f"\tFlipping {t=}, {c=}")
                temp = array[t, c]
                if x:
                    temp = temp[:, :, ::-1]
                if y:
                    temp = temp[:, ::-1, :]
                array[t, c] = temp


if __name__ == "__main__":
    flip_cli()

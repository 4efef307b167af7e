"""``biahub reconstruct``: compute-tf followed by apply-inv-tf.

Convenience chain mirroring the reference (reference:
biahub/reconstruct.py:27-74): the transfer function is computed from the
first position's shape, then applied to all positions.
"""

from __future__ import annotations

from pathlib import Path

import click

from biahub_tpu.apply_inverse_transfer_function import apply_inverse_transfer_function
from biahub_tpu.cli.parsing import (
    cluster,
    config_filepath,
    input_position_dirpaths,
    monitor,
    output_dirpath,
    sbatch_filepath,
)
from biahub_tpu.compute_transfer_function import compute_transfer_function

__all__ = ["reconstruct_cli"]


@click.command("reconstruct")
@input_position_dirpaths()
@config_filepath()
@output_dirpath()
@sbatch_filepath()
@cluster()
@monitor()
def reconstruct_cli(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = False,
):
    """Reconstruct a dataset using a configuration file.

    This is a convenience function for a `compute-tf` call followed by an
    `apply-inv-tf` call. All positions must share one TCZYX shape.

    \b
    >>> biahub reconstruct -i ./input.zarr/*/*/* -c ./phase.yml -o ./output.zarr
    """  # noqa: D301
    transfer_function_path = Path(output_dirpath).parent / Path(
        "transfer_function_" + Path(config_filepath).stem + ".zarr"
    )
    compute_transfer_function(
        input_position_dirpaths[0], config_filepath, transfer_function_path
    )
    apply_inverse_transfer_function(
        input_position_dirpaths,
        transfer_function_path,
        config_filepath,
        output_dirpath,
        sbatch_filepath,
        cluster,
        monitor,
    )


if __name__ == "__main__":
    reconstruct_cli()

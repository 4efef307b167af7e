"""Disk-space preflight (reference: biahub/cli/disk.py:15-134)."""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

import click

__all__ = ["get_size_bytes", "check_disk_space_with_du", "check_disk_space_cli"]


def get_size_bytes(path: str | Path) -> int:
    """Total size of a file/directory in bytes via ``du -sb``."""
    try:
        out = subprocess.run(
            ["du", "-sb", str(path)], capture_output=True, text=True, check=True
        )
        return int(out.stdout.split()[0])
    except (subprocess.CalledProcessError, FileNotFoundError, ValueError, IndexError):
        # Portable fallback
        p = Path(path)
        if p.is_file():
            return p.stat().st_size
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def check_disk_space_with_du(
    input_path: str | Path,
    output_path: str | Path,
    margin: float = 1.1,
    verbose: bool = False,
) -> bool:
    """True when the output filesystem has margin x input-size free space."""
    input_size = get_size_bytes(input_path)
    required = int(input_size * margin)
    out_parent = Path(output_path).resolve()
    while not out_parent.exists():
        out_parent = out_parent.parent
    free = shutil.disk_usage(out_parent).free
    if verbose:
        click.echo(
            f"Disk preflight: input={input_size / 2**30:.2f} GiB, "
            f"required={required / 2**30:.2f} GiB, free={free / 2**30:.2f} GiB"
        )
    return free >= required


@click.command("check-disk-space")
@click.option(
    "--input-path", "-i", type=str, required=True,
    help="Path whose size determines the space the output will need.",
)
@click.option(
    "--output-path", "-o", type=str, required=True,
    help="Destination whose filesystem is checked for free space.",
)
@click.option(
    "--margin", type=float, default=1.1, show_default=True,
    help="Safety margin for the disk space check (1.1 = 10% extra).",
)
@click.option("--verbose", is_flag=True, default=True,
              help="Print detailed diagnostics.")
def check_disk_space_cli(input_path: str, output_path: str, margin: float, verbose: bool):
    """Check disk space using `du -sb` (reference: biahub/cli/disk.py:93-134).

    >>> biahub check-disk-space -i ./input.zarr -o ./output.zarr
    """
    ok = check_disk_space_with_du(
        input_path=input_path, output_path=output_path, margin=margin, verbose=verbose
    )
    if ok:
        click.echo("Disk space check passed. Good to go!")
    else:
        click.echo("Disk space check failed. Not enough space available.")


def get_dir_size_du(path) -> int:
    """Reference-name alias of :func:`get_size_bytes`
    (reference: biahub/cli/disk.py:15-38)."""
    return get_size_bytes(path)

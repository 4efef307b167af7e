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
@click.argument("input_path", type=click.Path(exists=True))
@click.argument("output_path", type=click.Path())
@click.option("--margin", default=1.1, show_default=True, type=float)
def check_disk_space_cli(input_path, output_path, margin):
    """Check there is enough free space to derive OUTPUT_PATH from INPUT_PATH."""
    ok = check_disk_space_with_du(input_path, output_path, margin=margin, verbose=True)
    if not ok:
        raise click.ClickException("Not enough disk space")
    click.echo("OK")

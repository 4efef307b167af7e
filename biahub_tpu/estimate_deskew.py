"""``biahub estimate-deskew``: derive deskew parameters from calibration data.

The reference is napari-interactive (reference: biahub/estimate_deskew.py:
17-82): the user draws a rectangle to measure ``px_to_scan_ratio`` and a line
to measure the light-sheet angle. Headless here, the same geometry is exposed
as pure functions (:func:`px_to_scan_ratio_from_rectangle`,
:func:`ls_angle_from_line`) and the CLI accepts the measured coordinates as
options; invoked without them, it explains what to provide.
"""

from __future__ import annotations

import click
import numpy as np

from biahub_tpu.cli.parsing import input_position_dirpaths, output_filepath
from biahub_tpu.cli.utils import model_to_yaml
from biahub_tpu.settings import DeskewSettings

__all__ = [
    "estimate_deskew_cli",
    "px_to_scan_ratio_from_rectangle",
    "ls_angle_from_line",
]


def px_to_scan_ratio_from_rectangle(rect: np.ndarray) -> float:
    """px_to_scan_ratio from a rectangle drawn around a known-square object.

    ``rect`` is the (4, 3) corner array in (scan, tilt, coverslip) order; the
    ratio is the scan-extent over the coverslip-extent
    (reference: biahub/estimate_deskew.py:44-46).
    """
    rect = np.asarray(rect, dtype=np.float64)
    return float((rect[2, 0] - rect[0, 0]) / (rect[2, 2] - rect[0, 2]))


def ls_angle_from_line(line: np.ndarray, px_to_scan_ratio: float) -> float:
    """Light-sheet angle (degrees) from a line along a coverslip-normal object.

    ``line`` is a (2, 2) point pair on the X-projection
    (reference: biahub/estimate_deskew.py:60-66).
    """
    line = np.asarray(line, dtype=np.float64)
    r = line[1] - line[0]
    r_hat = r / np.linalg.norm(r)
    theta = np.arccos(r_hat[0] / r_hat[1] / px_to_scan_ratio)
    return float((theta % np.pi) * 180 / np.pi)


@click.command("estimate-deskew")
@input_position_dirpaths()
@output_filepath()
@click.option("--pixel-size-um", type=float, default=None, help="Image pixel size (um).")
@click.option(
    "--scan-step-um", type=float, default=None, help="Estimated galvo scan step (um)."
)
@click.option(
    "--px-to-scan-ratio",
    type=float,
    default=None,
    help="Measured px_to_scan_ratio (skip the rectangle measurement).",
)
@click.option(
    "--ls-angle-deg",
    type=float,
    default=None,
    help="Measured light-sheet angle in degrees (skip the line measurement).",
)
def estimate_deskew_cli(
    input_position_dirpaths,
    output_filepath,
    pixel_size_um,
    scan_step_um,
    px_to_scan_ratio,
    ls_angle_deg,
):
    """Routine for estimating deskewing parameters from calibration data.

    The reference workflow measures px_to_scan_ratio and the light-sheet angle
    interactively in napari; headless, pass the measured values directly:

    >>> biahub estimate-deskew -i ./input.zarr/0/0/0 -o ./deskew_params.yml \\
        --pixel-size-um 0.116 --scan-step-um 0.313 --ls-angle-deg 36.17
    """
    if not str(output_filepath).endswith((".yaml", ".yml")):
        raise ValueError("Output file must be a YAML file.")

    if pixel_size_um is None or scan_step_um is None:
        raise click.ClickException(
            "Headless estimate-deskew needs --pixel-size-um and --scan-step-um "
            "(plus --ls-angle-deg, or --px-to-scan-ratio from a napari "
            "measurement made elsewhere)."
        )
    if px_to_scan_ratio is None:
        px_to_scan_ratio = round(pixel_size_um / scan_step_um, 3)
        click.echo(f"Using px_to_scan_ratio = pixel_size/scan_step = {px_to_scan_ratio}")
    if ls_angle_deg is None:
        raise click.ClickException(
            "Provide --ls-angle-deg (the interactive napari line measurement is "
            "unavailable headless; see ls_angle_from_line for the math)."
        )

    settings = DeskewSettings(
        pixel_size_um=pixel_size_um,
        ls_angle_deg=ls_angle_deg,
        px_to_scan_ratio=px_to_scan_ratio,
        scan_step_um=scan_step_um,
    )
    print(f"Writing deskewing parameters to {output_filepath}")
    model_to_yaml(settings, output_filepath)


if __name__ == "__main__":
    estimate_deskew_cli()

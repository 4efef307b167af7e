"""``biahub estimate-deskew``: derive deskew parameters from calibration data.

The reference is napari-interactive (reference: biahub/estimate_deskew.py:
17-82): the user draws a rectangle to measure ``px_to_scan_ratio`` and a line
to measure the light-sheet angle. The same geometry is exposed here as pure
functions (:func:`px_to_scan_ratio_from_rectangle`,
:func:`ls_angle_from_line`) reachable three ways:

- headless with measured values (``--px-to-scan-ratio``/``--ls-angle-deg``),
- headless with point files (``--rect-points``/``--line-points`` CSVs
  exported from any viewer — napari, Fiji, etc.),
- interactively (``--interactive``) when napari is installed, mirroring the
  reference's draw-and-measure flow.
"""

from __future__ import annotations

from pathlib import Path

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


def _load_points(path: str | Path) -> np.ndarray:
    """Load a points array from a .npy or a headerless CSV/TSV file."""
    path = Path(path)
    if path.suffix == ".npy":
        return np.load(path)
    return np.loadtxt(path, delimiter="," if path.suffix == ".csv" else None)


def _interactive_measurements(position_path, px_to_scan_ratio_estimate: float):
    """Reference napari flow: draw a rectangle, then a coverslip-normal line
    (reference: biahub/estimate_deskew.py:36-68)."""
    try:
        import napari  # type: ignore
    except ImportError:
        raise click.ClickException(
            "--interactive requires napari; headless, pass --rect-points/"
            "--line-points files or the measured values directly."
        ) from None
    from biahub_tpu.io.ngff import open_ome_zarr

    with open_ome_zarr(position_path) as reader:
        data = np.asarray(reader["0"][0, 0])
    viewer = napari.Viewer()
    viewer.add_image(data)
    viewer.add_shapes(ndim=3, name="rect")
    viewer.layers[-1].mode = "add_rectangle"
    viewer.dims.order = (1, 2, 0)
    input(
        "\nDraw a rectangle around an object that you expect to be square "
        "after deskewing, then press <enter>..."
    )
    rect = viewer.layers["rect"].data[0]
    ratio = px_to_scan_ratio_from_rectangle(rect)
    click.echo(f"Measured px_to_scan_ratio : {ratio:.3f}")
    # Sanity feedback against pixel_size/scan_step, matching the reference
    # (reference: biahub/estimate_deskew.py:48-49) — a wildly-off percentage
    # means the rectangle was drawn in the wrong plane.
    factor = abs(1 - px_to_scan_ratio_estimate / ratio) * 100
    click.echo(
        f"The measured px_to_scan_ratio is within {round(factor)}% "
        "from your estimate"
    )

    viewer.layers.remove("data")
    viewer.layers.remove("rect")
    viewer.add_image(np.sum(data, axis=2, dtype=np.float32), name="x_proj")
    viewer.add_shapes(ndim=2, name="coverslip-normal")
    viewer.layers[-1].mode = "add_line"
    input(
        "Draw a line parallel to an object perpendicular to the coverslip, "
        "then press <enter>..."
    )
    line = viewer.layers[-1].data[0]
    angle = ls_angle_from_line(line, ratio)
    click.echo(f"Measured light-sheet angle : {angle:.2f}")
    return ratio, angle


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
@click.option(
    "--rect-points",
    type=click.Path(exists=True),
    default=None,
    help="(4, 3) rectangle-corner file (.csv/.npy) in (scan, tilt, coverslip) "
    "order, exported from any viewer; measures px_to_scan_ratio.",
)
@click.option(
    "--line-points",
    type=click.Path(exists=True),
    default=None,
    help="(2, 2) coverslip-normal line file (.csv/.npy) on the X projection; "
    "measures the light-sheet angle.",
)
@click.option(
    "--interactive",
    is_flag=True,
    help="Measure in napari exactly as the reference does (requires napari).",
)
def estimate_deskew_cli(
    input_position_dirpaths,
    output_filepath,
    pixel_size_um,
    scan_step_um,
    px_to_scan_ratio,
    ls_angle_deg,
    rect_points,
    line_points,
    interactive,
):
    """Routine for estimating deskewing parameters from calibration data.

    The reference workflow measures px_to_scan_ratio and the light-sheet angle
    interactively in napari (--interactive here); headless, pass the measured
    values or exported point files:

    >>> biahub estimate-deskew -i ./input.zarr/0/0/0 -o ./deskew_params.yml \\
        --pixel-size-um 0.116 --scan-step-um 0.313 --ls-angle-deg 36.17
    """
    if not str(output_filepath).endswith((".yaml", ".yml")):
        raise ValueError("Output file must be a YAML file.")

    if pixel_size_um is None or scan_step_um is None:
        raise click.ClickException(
            "estimate-deskew needs --pixel-size-um and --scan-step-um."
        )
    if interactive:
        estimate = pixel_size_um / scan_step_um
        px_to_scan_ratio, ls_angle_deg = _interactive_measurements(
            input_position_dirpaths[0], estimate
        )
    if px_to_scan_ratio is None and rect_points is not None:
        px_to_scan_ratio = round(
            px_to_scan_ratio_from_rectangle(_load_points(rect_points)), 3
        )
        click.echo(f"Measured px_to_scan_ratio : {px_to_scan_ratio:.3f}")
    if px_to_scan_ratio is None:
        px_to_scan_ratio = round(pixel_size_um / scan_step_um, 3)
        click.echo(f"Using px_to_scan_ratio = pixel_size/scan_step = {px_to_scan_ratio}")
    if ls_angle_deg is None and line_points is not None:
        ls_angle_deg = ls_angle_from_line(_load_points(line_points), px_to_scan_ratio)
        click.echo(f"Measured light-sheet angle : {ls_angle_deg:.2f}")
    if ls_angle_deg is None:
        raise click.ClickException(
            "Provide --ls-angle-deg, a --line-points file, or --interactive "
            "(see ls_angle_from_line for the math)."
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

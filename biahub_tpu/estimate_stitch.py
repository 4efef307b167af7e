"""``biahub estimate-stitch``: per-FOV pixel shifts from stage metadata.

Behavioral parity with the reference (reference: biahub/estimate_stitch.py:
16-217): micromanager ``Summary/StagePositions`` metadata becomes per-well
pixel shifts, optionally refined by phase cross-correlation on overlap strips
plus a global position solve (the reference README's "optimize-stitch" lives
here behind ``--pcc-channel-name``), and is written as a StitchSettings YAML.

Pipeline here: read each FOV's stage coordinates once → bucket FOVs by well →
normalize each well to its origin in pixel units → optionally refine YX with
the PCC solver → apply axis flips → clamp to non-negative and round.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import click
import numpy as np

from biahub_tpu.cli.parsing import input_position_dirpaths, local, monitor, output_filepath
from biahub_tpu.cli.utils import model_to_yaml
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.settings import StitchSettings
from biahub_tpu.stitching.tile import optimal_positions, pairwise_shifts

__all__ = ["estimate_stitch_cli", "extract_stage_position"]


def _stage_entry(plate_dataset, position_name: str) -> dict | None:
    """The last StagePositions entry labeled ``position_name`` (micromanager
    appends on re-acquisition, so the most recent entry wins)."""
    entry = None
    for candidate in plate_dataset.zattrs["Summary"]["StagePositions"]:
        if candidate.get("Label") == position_name:
            entry = candidate
    return entry


def extract_stage_position(plate_dataset, position_name: str) -> tuple:
    """(z, y, x) stage coordinates in um for a named micromanager position.

    Two metadata dialects exist (reference: biahub/estimate_stitch.py:16-64):

    - ``DevicePositions``: a device list; the ``DefaultXYStage`` device
      carries (x, y) and every OTHER device's first coordinate contributes
      additively to z (split z-stages sum).
    - direct keys: the ``DefaultXYStage`` / ``DefaultZStage`` names index
      top-level entries holding [x, y] and z.

    Missing devices/keys default to 0 for that axis.
    """
    entry = _stage_entry(plate_dataset, position_name)
    if entry is None:
        return 0.0, 0.0, 0.0

    xy_stage = entry.get("DefaultXYStage", "")
    if "DevicePositions" in entry:
        x = y = z = 0.0
        for device in entry["DevicePositions"]:
            coords = device["Position_um"]
            if xy_stage and device["Device"] == xy_stage:
                x, y = coords
            else:
                z += coords[0]
        return z, y, x

    x, y = entry.get(xy_stage, (0.0, 0.0)) if xy_stage else (0.0, 0.0)
    z = entry.get(entry.get("DefaultZStage", ""), 0.0)
    return z, y, x


def _read_stage_positions(
    input_position_dirpaths: list[Path],
) -> dict[str, tuple]:
    """fov_name ("row/col/fov") → (z, y, x) stage coordinates in um."""
    plate_path = Path(*Path(input_position_dirpaths[0]).parts[:-3])
    coords: dict[str, tuple] = {}
    with open_ome_zarr(plate_path) as plate:
        for dirpath in input_position_dirpaths:
            fov_name = "/".join(Path(dirpath).parts[-3:])
            with open_ome_zarr(dirpath) as position:
                # micromanager labels live in the omero name when present
                label = position.zattrs.get("omero", {}).get("name", fov_name)
            coords[fov_name] = extract_stage_position(plate, label)
            click.echo(f"Found metadata: {fov_name}: {coords[fov_name]}")
    return coords


def _refine_well_with_pcc(
    shifts_px: np.ndarray,
    fov_names: list[str],
    plate_path: Path,
    well_name: str,
    channel_index: int,
    z_index: int,
    fliplr: bool,
    flipud: bool,
) -> np.ndarray:
    """Replace the YX columns of ``shifts_px`` with the PCC-refined solve.

    Pairwise Hanning-windowed phase correlations on overlap strips feed the
    global soft-L1 position solve (stitching/tile.py), seeded by the stage
    estimate (reference: biahub/estimate_stitch.py:155-191).
    """
    fovs = {name: None for name in fov_names}
    seed_yx = {
        name: (shifts_px[i, 1], shifts_px[i, 2]) for i, name in enumerate(fov_names)
    }
    edges, confidence = pairwise_shifts(
        fovs,
        plate_path,
        well_name,
        flipud=flipud,
        fliplr=fliplr,
        rot90=False,
        overlap=300,
        channel_index=channel_index,
        z_index=z_index,
        initial_positions=seed_yx,
    )
    click.echo("Confidence scores:")
    for pair, *_, score in confidence.values():
        click.echo(f"{pair}: {score:.2f}")

    with open_ome_zarr(plate_path / fov_names[0]) as first:
        tile_yx = first.data.shape[-2:]
    solved = optimal_positions(
        edges,
        {name.split("/")[-1]: i for i, name in enumerate(fov_names)},
        well_name,
        tile_size=tile_yx,
        initial_guess={
            well_name: {"i": shifts_px[:, 1], "j": shifts_px[:, 2]}
        },
    )
    refined = shifts_px.copy()
    refined[:, 1] = [yx[0] for yx in solved.values()]
    refined[:, 2] = [yx[1] for yx in solved.values()]
    return refined


@click.command("estimate-stitch")
@input_position_dirpaths()
@output_filepath()
@click.option("--fliplr", is_flag=True, help="Flip images left-right before stitching")
@click.option("--flipud", is_flag=True, help="Flip images up-down before stitching")
@click.option("--flipxy", is_flag=True, help="Flip images along the diagonal before stitching")
@click.option(
    "--pcc-channel-name",
    default=None,
    type=str,
    help=(
        "Channel name to use for phase cross-correlation optimization "
        "(default: None, disables optimization)"
    ),
)
@click.option(
    "--pcc-z-index",
    default=0,
    type=int,
    help="Z slice index to use for phase cross-correlation optimization (default: 0)",
)
@click.option(
    "--add_offset",
    is_flag=True,
    help="add the offset to estimated shifts, needed for OPS experiments",
)
@local()
@monitor()
def estimate_stitch_cli(
    input_position_dirpaths: list[Path],
    output_filepath: Path,
    fliplr: bool,
    flipud: bool,
    flipxy: bool,
    pcc_channel_name: str,
    pcc_z_index: int,
    add_offset: bool,
    local: bool,
    monitor: bool,
):
    """Estimate stitching parameters for positions in wells of a zarr store.

    Uses micro-manager stage position metadata and scale metadata to generate
    translation parameters for stitching, in pixel units. More precise
    translations come from phase cross-correlation with `--pcc-channel-name`.

    >>> biahub estimate-stitch -i ./input.zarr/*/*/* -o ./stitch_params.yml
    """
    plate_path = Path(*Path(input_position_dirpaths[0]).parts[:-3])

    click.echo("Reading stage positions...")
    stage_um = _read_stage_positions(input_position_dirpaths)

    by_well: dict[str, list[str]] = defaultdict(list)
    for fov_name in stage_um:
        by_well["/".join(fov_name.split("/")[:2])].append(fov_name)

    with open_ome_zarr(input_position_dirpaths[0]) as first:
        scale_zyx = np.asarray(first.scale[2:], dtype=np.float64)
        channel_names = first.channel_names

    total_translation: dict[str, list[float]] = {}
    for well_name, fov_names in by_well.items():
        # Well-local pixel shifts: stage um, re-origined, divided by scale.
        shifts = np.array([stage_um[f] for f in fov_names], dtype=np.float64)
        shifts -= shifts.min(axis=0)
        shifts /= scale_zyx

        if pcc_channel_name is not None:
            shifts = _refine_well_with_pcc(
                shifts,
                fov_names,
                plate_path,
                well_name,
                channel_index=channel_names.index(pcc_channel_name),
                z_index=pcc_z_index,
                fliplr=fliplr,
                flipud=flipud,
            )

        if fliplr:
            shifts[:, 2] *= -1
        if flipud:
            shifts[:, 1] *= -1
        if flipxy:
            shifts = shifts[:, [0, 2, 1]]
        # Flips can push shifts negative; re-anchor at zero.
        shifts -= np.minimum(shifts.min(axis=0), 0)

        for fov_name, zyx in zip(fov_names, shifts):
            total_translation[fov_name] = [float(v) for v in np.round(zyx, 2)]

    model_to_yaml(
        StitchSettings(channels=None, total_translation=total_translation),
        Path(output_filepath),
    )


if __name__ == "__main__":
    estimate_stitch_cli()

"""``biahub estimate-stitch``: per-FOV pixel shifts from stage metadata.

Mirrors the reference (reference: biahub/estimate_stitch.py:16-217):
micromanager ``Summary/StagePositions`` metadata is converted to per-well
pixel shifts, optionally refined with phase cross-correlation on overlap
strips and a global position solve, then written as a StitchSettings YAML.
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


def extract_stage_position(plate_dataset, position_name: str):
    """(z, y, x) stage coordinates in um for a named micromanager position."""
    stage_positions = plate_dataset.zattrs["Summary"]["StagePositions"]
    xpos, ypos, zpos = 0, 0, 0
    for stage_position in stage_positions:
        if stage_position["Label"] == position_name:
            xpos, ypos, zpos = 0, 0, 0
            if "DevicePositions" in stage_position.keys():
                xy_stage_name = stage_position.get("DefaultXYStage", "")
                non_z_devices = {xy_stage_name}
                for device in stage_position["DevicePositions"]:
                    if device["Device"] == xy_stage_name and xy_stage_name:
                        xpos, ypos = device["Position_um"]
                    elif device["Device"] not in non_z_devices:
                        zpos += device["Position_um"][0]
            else:
                try:
                    xy_stage_name = stage_position["DefaultXYStage"]
                    xpos, ypos = stage_position[xy_stage_name]
                except KeyError:
                    pass
                try:
                    z_stage_name = stage_position["DefaultZStage"]
                    zpos = stage_position[z_stage_name]
                except KeyError:
                    pass
    return zpos, ypos, xpos


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
    input_plate_path = Path(*Path(input_position_dirpaths[0]).parts[:-3])
    output_filepath = Path(output_filepath)

    print("Reading stage positions...")
    translation_dict = {}
    input_plate_dataset = open_ome_zarr(input_plate_path)
    for input_position_dirpath in input_position_dirpaths:
        fov_name = "/".join(Path(input_position_dirpath).parts[-3:])
        position = open_ome_zarr(input_position_dirpath)
        position_name = position.zattrs.get("omero", {}).get("name", fov_name)
        zyx_position = extract_stage_position(input_plate_dataset, position_name)
        print(f"Found metadata: {fov_name}: {zyx_position}")
        translation_dict[fov_name] = zyx_position

    grouped_wells: dict[str, dict] = defaultdict(dict)
    for key, value in translation_dict.items():
        well_name = "/".join(key.split("/")[:2])
        grouped_wells[well_name][key] = value

    scale = open_ome_zarr(input_position_dirpaths[0]).scale[2:]

    final_translation_dict = {}
    for well_name, well_positions in grouped_wells.items():
        zyx_well_array = np.array(list(well_positions.values()), dtype=np.float64)
        zyx_well_array -= np.min(zyx_well_array, axis=0)
        zyx_well_array /= np.asarray(scale)

        if pcc_channel_name is not None:
            tile_lut = {t.split("/")[-1]: i for i, t in enumerate(well_positions)}
            initial_guess = {
                well_name: {"i": zyx_well_array[:, 1], "j": zyx_well_array[:, 2]}
            }
            channel_names = open_ome_zarr(input_position_dirpaths[0]).channel_names
            channel_index = channel_names.index(pcc_channel_name)

            initial_positions = {
                name: (zyx_well_array[i, 1], zyx_well_array[i, 2])
                for i, name in enumerate(well_positions)
            }
            edge_list, confidence_dict = pairwise_shifts(
                well_positions,
                input_plate_path,
                well_name,
                flipud=flipud,
                fliplr=fliplr,
                rot90=False,
                overlap=300,
                channel_index=channel_index,
                z_index=pcc_z_index,
                initial_positions=initial_positions,
            )
            print("Confidence scores:")
            for v in confidence_dict.values():
                print(f"{v[0]}: {v[-1]:.2f}")

            first_position_path = next(iter(well_positions))
            tile_size = open_ome_zarr(input_plate_path / first_position_path).data.shape[-2:]

            opt_shift_dict = optimal_positions(
                edge_list, tile_lut, well_name, tile_size=tile_size,
                initial_guess=initial_guess,
            )
            zyx_well_array[:, 1] = [a[0] for a in opt_shift_dict.values()]
            zyx_well_array[:, 2] = [a[1] for a in opt_shift_dict.values()]

        if fliplr:
            zyx_well_array[:, 2] *= -1
        if flipud:
            zyx_well_array[:, 1] *= -1
        if flipxy:
            zyx_well_array[:, [1, 2]] = zyx_well_array[:, [2, 1]]

        zyx_well_array -= np.minimum(zyx_well_array.min(axis=0), 0)

        for i, fov_name in enumerate(well_positions.keys()):
            final_translation_dict[fov_name] = list(np.round(zyx_well_array[i], 2))

    settings = StitchSettings(channels=None, total_translation=final_translation_dict)
    model_to_yaml(settings, output_filepath)


if __name__ == "__main__":
    estimate_stitch_cli()

"""``biahub estimate-crop``: find the common non-zero crop of two plates.

Mirrors the reference (reference: biahub/estimate_crop.py:32-324): for each
phase/fluorescence FOV pair, median-filter the per-(t, c) volume sums to
drop outlier frames, compute the all-valid voxel mask, run the largest-
interior-rectangle search, and write the smallest common crop into a
ConcatenateSettings YAML.
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np
import pandas as pd

from biahub_tpu.cli.parsing import (
    config_filepath,
    local,
    output_filepath,
    sbatch_filepath,
)
from biahub_tpu.cli.utils import model_to_yaml, yaml_to_model
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.register import find_lir
from biahub_tpu.runtime import estimate_resources, resolve_cluster
from biahub_tpu.settings import ConcatenateSettings

__all__ = ["estimate_crop", "estimate_crop_cli", "estimate_crop_one_position"]


def estimate_crop_one_position(
    lf_dir: Path,
    ls_dir: Path,
    lf_mask_radius: float | None = None,
    output_dir: Path | None = None,
):
    """Crop ranges where both phase and fluorescence volumes are non-zero."""
    fov = "/".join(Path(lf_dir).parts[-3:])
    click.echo(f"Processing FOV: {fov}")

    lf_data = open_ome_zarr(lf_dir).data[:, :1]
    lf_mask = (lf_data != 0) & (~np.isnan(lf_data))
    ls_data = open_ome_zarr(ls_dir).data[:, :1]
    ls_mask = (ls_data != 0) & (~np.isnan(ls_data))

    if lf_mask.ndim != 5 or ls_mask.ndim != 5:
        raise ValueError("Both phase_data and fluor_data must be 5D arrays.")

    lf_shape, ls_shape = lf_mask.shape[-3:], ls_mask.shape[-3:]
    _max_zyx_dims = np.asarray([lf_shape, ls_shape]).min(axis=0)
    if lf_shape != ls_shape:
        click.echo(
            "WARNING: Phase and fluorescence datasets should have the same shape, got"
            f" phase shape: {lf_shape}, fluorescence shape: {ls_shape}"
        )
        lf_mask = lf_mask[..., : _max_zyx_dims[0], : _max_zyx_dims[1], : _max_zyx_dims[2]]
        ls_mask = ls_mask[..., : _max_zyx_dims[0], : _max_zyx_dims[1], : _max_zyx_dims[2]]

    data = np.concatenate([lf_mask, ls_mask], axis=1)

    # Keep only frames whose non-zero volume is near the median (robust to
    # blank/partial frames)
    volume = np.sum(data, axis=(2, 3, 4))
    median_volume = np.median(volume)
    valid_t, valid_c = np.where(
        (volume > 0.8 * median_volume) & (volume < 1.2 * median_volume)
    )
    if len(valid_t) == 0:
        click.echo("No valid data found for current position, will not crop.")
        return tuple(zip((0, 0, 0), _max_zyx_dims))
    valid_data = data[valid_t, valid_c]
    combined_mask = np.all(valid_data, axis=0)

    if lf_mask_radius is not None:
        click.echo(f"Applying circular mask of radius {lf_mask_radius} to phase channel.")
        if not (0 < lf_mask_radius <= 1):
            raise ValueError(
                "lf_mask_radius must be a fraction of image width (0 < lf_mask_radius <= 1)."
            )
        circle = np.zeros(lf_mask.shape[-2:], dtype=bool)
        y, x = np.ogrid[: circle.shape[-2], : circle.shape[-1]]
        center = (circle.shape[-2] // 2, circle.shape[-1] // 2)
        radius = int(lf_mask_radius * min(center))
        circle[(x - center[0]) ** 2 + (y - center[1]) ** 2 <= radius**2] = True
        combined_mask = combined_mask * circle[: _max_zyx_dims[1], : _max_zyx_dims[2]]

    z_slice, y_slice, x_slice = find_lir(combined_mask)
    click.echo(
        f"Estimated crop for FOV {fov}:\n"
        f"Z: {z_slice.start} - {z_slice.stop}\n"
        f"Y: {y_slice.start} - {y_slice.stop}\n"
        f"X: {x_slice.start} - {x_slice.stop}"
    )

    if output_dir:
        df = pd.DataFrame(
            [
                {
                    "fov": fov,
                    "Z": [z_slice.start, z_slice.stop],
                    "Y": [y_slice.start, y_slice.stop],
                    "X": [x_slice.start, x_slice.stop],
                }
            ]
        )
        Path(output_dir).mkdir(parents=True, exist_ok=True)
        df.to_csv(Path(output_dir) / f"{fov.replace('/', '_')}.csv", index=False)

    return (
        [z_slice.start, z_slice.stop],
        [y_slice.start, y_slice.stop],
        [x_slice.start, x_slice.stop],
    )


def estimate_crop(
    config_filepath: Path,
    output_filepath: Path,
    lf_mask_radius: float | None = 0.95,
    sbatch_filepath: str | None = None,
    local: bool = False,
):
    config_filepath = Path(config_filepath)
    if config_filepath.suffix not in (".yml", ".yaml"):
        raise ValueError("Config file must be a yaml file")

    settings = yaml_to_model(config_filepath, ConcatenateSettings)
    output_dir = Path(output_filepath).parent
    output_dir.mkdir(parents=True, exist_ok=True)

    # Phase dataset first, fluorescence second in concat_data_paths
    lf_position_dirpaths = [
        p for p in sorted(config_filepath.parent.glob(settings.concat_data_paths[0]))
        if p.is_dir()
    ]
    click.echo(f"Found {len(lf_position_dirpaths)} phase channels.")
    ls_position_dirpaths = [
        p for p in sorted(config_filepath.parent.glob(settings.concat_data_paths[1]))
        if p.is_dir()
    ]
    click.echo(f"Found {len(ls_position_dirpaths)} fluorescence channels.")
    if len(lf_position_dirpaths) != len(ls_position_dirpaths):
        raise ValueError("Number of phase and fluorescence channels must be the same.")

    dataset = open_ome_zarr(lf_position_dirpaths[0])
    estimate_resources(shape=dataset.data.shape, ram_multiplier=16, max_num_cpus=16)
    resolve_cluster(None, local)

    all_ranges = []
    for ls_dir, lf_dir in zip(ls_position_dirpaths, lf_position_dirpaths):
        ranges = estimate_crop_one_position(
            lf_dir=lf_dir, ls_dir=ls_dir, lf_mask_radius=lf_mask_radius
        )
        all_ranges.append([list(r) for r in ranges])

    # Smallest common crop across positions
    all_ranges = np.array(all_ranges)
    standardized = np.concatenate(
        [
            all_ranges[..., 0].max(axis=0, keepdims=True),
            all_ranges[..., 1].min(axis=0, keepdims=True),
        ]
    )
    click.echo(
        f"Standardized ranges:\nZ: {standardized[:, 0].tolist()}\n"
        f"Y: {standardized[:, 1].tolist()}\nX: {standardized[:, 2].tolist()}"
    )

    output_model = settings.model_copy()
    output_model.Z_slice = standardized[:, 0].tolist()
    output_model.Y_slice = standardized[:, 1].tolist()
    output_model.X_slice = standardized[:, 2].tolist()
    model_to_yaml(output_model, output_filepath)
    click.echo("Done.")


@click.command("estimate-crop")
@config_filepath()
@output_filepath()
@sbatch_filepath()
@local()
@click.option(
    "--lf-mask-radius",
    type=float,
    help=(
        "(Optional) Radius of the circular mask given as fraction of image width "
        "to apply to the phase channel."
    ),
    required=False,
)
def estimate_crop_cli(
    config_filepath: Path,
    output_filepath: Path,
    lf_mask_radius: float = 0.95,
    sbatch_filepath: str | None = None,
    local: bool = False,
):
    """Estimate a crop region where both phase and fluorescence volumes are non-zero.

    >>> biahub estimate-crop \\
        -c ./concat.yml \\
        -o ./cropped_concat.yml \\
        --local
    """
    estimate_crop(
        config_filepath=config_filepath,
        output_filepath=output_filepath,
        lf_mask_radius=lf_mask_radius,
        sbatch_filepath=sbatch_filepath,
        local=local,
    )


if __name__ == "__main__":
    estimate_crop_cli()

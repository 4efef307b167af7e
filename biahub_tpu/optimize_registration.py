"""``biahub optimize-registration``: refine an existing registration YAML.

Refines the config's ``affine_transform_zyx`` by intensity registration on
the LIR-cropped overlap (reference: biahub/optimize_registration.py:24-311);
the ANTs Similarity optimizer is replaced by the differentiable JAX
multi-resolution optimizer. The optional napari viewer is unavailable in
headless runs and degrades to a message.
"""

from __future__ import annotations

import click
import numpy as np

from biahub_tpu.cli.parsing import (
    config_filepath,
    output_filepath,
    source_position_dirpaths,
    target_position_dirpaths,
)
from biahub_tpu.cli.utils import model_to_yaml, yaml_to_model
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.registration.intensity import estimate_czyx
from biahub_tpu.settings import RegistrationSettings

__all__ = ["optimize_registration_cli", "_optimize_registration"]


def _optimize_registration(
    source_czyx: np.ndarray,
    target_czyx: np.ndarray,
    initial_tform: np.ndarray,
    source_channel_index: int | list = 0,
    target_channel_index: int = 0,
    crop: bool = False,
    target_mask_radius: float | None = None,
    clip: bool = False,
    sobel_fitler: bool = False,
    verbose: bool = False,
    t_idx: int = 0,
    output_folder_path=None,
) -> np.ndarray | None:
    """Refine the initial transform on one (C, Z, Y, X) pair (host API)."""
    source_czyx = np.asarray(source_czyx, dtype=np.float32)
    target_czyx = np.asarray(target_czyx, dtype=np.float32)
    if np.all(source_czyx == 0) or np.all(target_czyx == 0):
        return None
    return estimate_czyx(
        mov_czyx=source_czyx,
        ref_czyx=target_czyx,
        initial_tform=np.asarray(initial_tform),
        mov_channel_index=source_channel_index,
        ref_channel_index=target_channel_index,
        crop=crop,
        ref_mask_radius=target_mask_radius,
        clip=clip,
        sobel_filter=sobel_fitler,
        verbose=verbose,
        t_idx=t_idx,
        output_folder_path=output_folder_path,
    )


@click.command("optimize-registration")
@source_position_dirpaths()
@target_position_dirpaths()
@config_filepath()
@output_filepath()
@click.option(
    "--display-viewer",
    "-d",
    is_flag=True,
    help="Display the registered channels in a napari viewer",
)
def optimize_registration_cli(
    source_position_dirpaths,
    target_position_dirpaths,
    config_filepath,
    output_filepath,
    display_viewer,
):
    """Optimize the affine transform between source and target channels.

    Start by generating an initial affine transform with `estimate-registration`.

    >>> biahub optimize-registration \\
        -s ./acq_name_virtual_staining_reconstructed.zarr/0/0/0 \\
        -t ./acq_name_lightsheet_deskewed.zarr/0/0/0 \\
        -c ./transform.yml \\
        -o ./optimized_transform.yml -d
    """
    settings = yaml_to_model(config_filepath, RegistrationSettings)
    t_idx = settings.time_indices
    if not isinstance(t_idx, int):
        print(
            "Time index 'all' is not supported for optimize-registration, "
            "using first time index"
        )
        t_idx = 0

    source_position = open_ome_zarr(source_position_dirpaths[0])
    source_channel_names = source_position.channel_names
    source_channel_index = source_channel_names.index(settings.source_channel_names[0])
    source_data_czyx = np.asarray(source_position.data[t_idx])
    print("Source data shape:", source_data_czyx.shape)

    target_position = open_ome_zarr(target_position_dirpaths[0])
    target_channel_names = target_position.channel_names
    target_channel_index = target_channel_names.index(settings.target_channel_name)
    target_data_czyx = np.asarray(target_position.data[t_idx])
    print("Target data shape:", target_data_czyx.shape)

    click.echo(
        f"\nOptimizing registration using source channel "
        f"{source_channel_names[source_channel_index]} and target channel "
        f"{target_channel_names[target_channel_index]}"
    )

    approx_tform = np.asarray(settings.affine_transform_zyx, dtype=np.float32)
    composed_matrix = _optimize_registration(
        source_czyx=source_data_czyx,
        target_czyx=target_data_czyx,
        initial_tform=approx_tform,
        source_channel_index=source_channel_index,
        target_channel_index=target_channel_index,
        crop=True,
        verbose=settings.verbose,
    )
    if composed_matrix is None:
        raise click.ClickException("Input data contains only NaN or zeros.")

    click.echo(f"Writing registration parameters to {output_filepath}")
    output_settings = settings.model_copy()
    output_settings.affine_transform_zyx = composed_matrix.tolist()
    model_to_yaml(output_settings, output_filepath)

    if display_viewer:
        click.echo(
            "napari viewing is unavailable in a headless TPU run; inspect the "
            "registered output with `biahub register` instead."
        )


if __name__ == "__main__":
    optimize_registration_cli()

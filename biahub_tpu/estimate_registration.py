"""``biahub estimate-registration``: estimate a source→target affine.

Three estimation methods mirroring the reference (reference:
biahub/estimate_registration.py:361-603): "beads" (bead matching,
:mod:`biahub_tpu.registration.beads`), "ants" (intensity optimization, here
the JAX multi-resolution optimizer in
:mod:`biahub_tpu.registration.intensity`), and "manual" (interactive napari
click-pair selection — GUI-only in the reference; here the non-GUI math is
exposed as :func:`registration_from_point_pairs` and the CLI raises a clear
error when invoked headless without pre-picked points).
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from biahub_tpu.cli.parsing import (
    config_filepath,
    local,
    output_filepath,
    sbatch_filepath,
    source_position_dirpaths,
    target_position_dirpaths,
)
from biahub_tpu.cli.utils import model_to_yaml, yaml_to_model
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.register import (
    get_3D_fliplr_matrix,
    get_3D_rescaling_matrix,
    get_3D_rotation_matrix,
)
from biahub_tpu.registration.utils import evaluate_transforms, plot_translations
from biahub_tpu.runtime import resolve_cluster
from biahub_tpu.settings import (
    EstimateRegistrationSettings,
    RegistrationSettings,
    StabilizationSettings,
)
from biahub_tpu.transforms.fitting import fit_transform

__all__ = [
    "estimate_registration",
    "estimate_registration_cli",
    "registration_from_point_pairs",
]


def registration_from_point_pairs(
    source_points: np.ndarray,
    target_points: np.ndarray,
    source_shape_zyx: tuple[int, int, int],
    target_shape_zyx: tuple[int, int, int],
    source_voxel_size,
    target_voxel_size,
    similarity: bool = False,
    pre_affine_90degree_rotation: int = 0,
    pre_affine_fliplr: bool = False,
) -> np.ndarray:
    """The non-GUI core of manual registration: fit a transform from clicked
    point pairs composed with the scale/rotation/flip pre-alignment
    (reference: biahub/estimate_registration.py:60-358).
    """
    # Pre-alignment: voxel-size rescale + optional 90-degree rotation + flip
    scale = np.asarray(source_voxel_size, dtype=float) / np.asarray(
        target_voxel_size, dtype=float
    )
    compound = get_3D_rescaling_matrix(source_shape_zyx, scale, target_shape_zyx)
    if pre_affine_90degree_rotation:
        compound = (
            get_3D_rotation_matrix(
                target_shape_zyx, 90.0 * pre_affine_90degree_rotation
            )
            @ compound
        )
    if pre_affine_fliplr:
        compound = get_3D_fliplr_matrix(target_shape_zyx) @ compound

    # Fit from the (pre-aligned) source points to the target points
    source_points = np.asarray(source_points, dtype=np.float64)
    target_points = np.asarray(target_points, dtype=np.float64)
    hom = np.hstack([source_points, np.ones((len(source_points), 1))])
    pre_aligned = (compound @ hom.T).T[:, :3]
    fit = fit_transform(
        pre_aligned, target_points, "similarity" if similarity else "euclidean"
    )
    # Points map source→target; the warp matrix (output→input) is its inverse
    return np.linalg.inv(fit @ compound)


def estimate_registration(
    source_position_dirpaths: list[Path],
    target_position_dirpaths: list[Path],
    output_filepath: Path,
    config_filepath: Path,
    registration_target_channel: str | None,
    registration_source_channel: list[str],
    sbatch_filepath: str | None = None,
    local: bool = False,
):
    output_dir = Path(output_filepath).parent
    output_dir.mkdir(parents=True, exist_ok=True)

    settings = yaml_to_model(config_filepath, EstimateRegistrationSettings)
    click.echo(f"Settings: {settings}")

    target_channel_name = settings.target_channel_name
    source_channel_name = settings.source_channel_name
    registration_source_channels = list(registration_source_channel)
    if registration_target_channel is None:
        registration_target_channel = target_channel_name
    if len(registration_source_channels) == 0:
        registration_source_channels = [source_channel_name]

    click.echo(f"Target channel: {target_channel_name}")
    click.echo(f"Source channel: {source_channel_name}")

    source_position = open_ome_zarr(source_position_dirpaths[0], mode="r")
    source_channels = source_position.channel_names
    source_channel_index = source_channels.index(source_channel_name)
    source_data = source_position.data
    source_voxel_size = source_position.scale[-3:]

    target_position = open_ome_zarr(target_position_dirpaths[0], mode="r")
    target_channels = target_position.channel_names
    target_channel_index = target_channels.index(target_channel_name)
    target_data = target_position.data
    voxel_size = target_position.scale
    target_voxel_size = voxel_size[-3:]

    cluster = resolve_cluster(None, local)
    eval_transform_settings = settings.eval_transform_settings

    if settings.estimation_method == "beads":
        from biahub_tpu.registration.beads import estimate_tczyx

        transforms = estimate_tczyx(
            mov_tczyx=source_data,
            ref_tczyx=target_data,
            mov_channel_index=source_channel_index,
            ref_channel_index=target_channel_index,
            beads_match_settings=settings.beads_match_settings,
            affine_transform_settings=settings.affine_transform_settings,
            verbose=settings.verbose,
            cluster=cluster,
            output_folder_path=output_dir,
            ref_voxel_size=target_voxel_size,
            mov_voxel_size=source_voxel_size,
        )
    elif settings.estimation_method == "ants":
        from biahub_tpu.registration.intensity import estimate_tczyx

        transforms = estimate_tczyx(
            mov_tczyx=source_data,
            ref_tczyx=target_data,
            mov_channel_index=source_channel_index,
            ref_channel_index=target_channel_index,
            ants_registration_settings=settings.ants_registration_settings,
            affine_transform_settings=settings.affine_transform_settings,
            cluster=cluster,
            verbose=settings.verbose,
            output_folder_path=output_dir,
        )
    elif settings.estimation_method == "manual":
        raise click.ClickException(
            "Manual (user-assisted) registration needs an interactive napari "
            "session to pick matching points, which is unavailable here. Use "
            "estimation_method 'beads' or 'ants', or call "
            "biahub_tpu.estimate_registration.registration_from_point_pairs "
            "with externally picked point pairs."
        )
    else:
        raise ValueError(
            f"Unknown estimation method: {settings.estimation_method}. "
            "Supported methods are 'beads', 'ants', and 'manual'."
        )

    if len(transforms) == 1:
        if eval_transform_settings:
            click.echo("One transform was estimated, no need to evaluate")
        model = RegistrationSettings(
            source_channel_names=registration_source_channels,
            target_channel_name=registration_target_channel,
            affine_transform_zyx=transforms[0],
        )
    else:
        if eval_transform_settings:
            transforms = evaluate_transforms(
                transforms=transforms,
                shape_zyx=source_data.shape[-3:],
                validation_window_size=eval_transform_settings.validation_window_size,
                validation_tolerance=eval_transform_settings.validation_tolerance,
                interpolation_window_size=eval_transform_settings.interpolation_window_size,
                interpolation_type=eval_transform_settings.interpolation_type,
                verbose=settings.verbose,
            )
        model = StabilizationSettings(
            stabilization_estimation_channel=target_channel_name,
            stabilization_type="affine",
            stabilization_method=settings.estimation_method,
            stabilization_channels=[source_channel_name, target_channel_name],
            affine_transform_zyx_list=transforms,
            time_indices="all",
            output_voxel_size=voxel_size,
        )
        if settings.verbose:
            plot_translations(
                transforms_zyx=transforms,
                output_filepath=output_dir
                / "translation_plots"
                / f"{settings.estimation_method}_registration.png",
            )

    model_to_yaml(model, output_filepath)
    click.echo(f"Registration settings saved to {output_dir.resolve()}")


@click.command("estimate-registration")
@source_position_dirpaths()
@target_position_dirpaths()
@output_filepath()
@config_filepath()
@sbatch_filepath()
@local()
@click.option(
    "--registration-target-channel",
    "-rt",
    type=str,
    help="Name of the target channel to be used when registration params are applied. "
    "If not provided, the target channel from the config file will be used.",
    required=False,
)
@click.option(
    "--registration-source-channel",
    "-rs",
    type=str,
    multiple=True,
    help="Name of the source channels to be used when registration params are applied. "
    "May be passed multiple times. If not provided, the source channels from the "
    "config file will be used.",
    required=False,
)
def estimate_registration_cli(
    source_position_dirpaths: list[Path],
    target_position_dirpaths: list[Path],
    output_filepath: Path,
    config_filepath: Path,
    registration_target_channel: str,
    registration_source_channel: list[str],
    sbatch_filepath: str | None = None,
    local: bool = False,
):
    """Estimate the affine transformation between a source and target image for registration.

    Estimates registration transforms between a source (moving) and target (fixed)
    image using (1) bead matches across timepoints, or (2) image features via
    multi-resolution intensity optimization. The output is a configuration file
    consumed by `stabilize` and `register`.

    >>> biahub estimate-registration \\
        -s ./acq_name_labelfree_reconstructed.zarr/0/0/0 \\
        -t ./acq_name_lightsheet_deskewed.zarr/0/0/0 \\
        -o ./output.yml \\
        --config ./config.yml \\
        --registration-target-channel "Phase3D" \\
        --registration-source-channel "GFP"
    """
    estimate_registration(
        source_position_dirpaths=source_position_dirpaths,
        target_position_dirpaths=target_position_dirpaths,
        output_filepath=output_filepath,
        config_filepath=config_filepath,
        registration_target_channel=registration_target_channel,
        registration_source_channel=registration_source_channel,
        sbatch_filepath=sbatch_filepath,
        local=local,
    )


if __name__ == "__main__":
    estimate_registration_cli()


def user_assisted_registration(*args, **kwargs):
    """Reference-name stub (reference: biahub/estimate_registration.py:60-358).

    Manual registration needs an interactive napari session to click matching
    point pairs, which is unavailable headless. Pick the pairs externally and
    call :func:`registration_from_point_pairs` instead, or use the 'beads' /
    'ants' estimation methods.
    """
    raise RuntimeError(
        "user_assisted_registration requires an interactive napari session; "
        "use registration_from_point_pairs with externally picked points, or "
        "the 'beads'/'ants' estimation methods."
    )

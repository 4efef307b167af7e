"""``biahub estimate-registration``: estimate a source→target affine.

Three estimation methods mirroring the reference (reference:
biahub/estimate_registration.py:361-603): "beads" (bead matching,
:mod:`biahub_tpu.registration.beads`), "ants" (intensity optimization, here
the JAX multi-resolution optimizer in
:mod:`biahub_tpu.registration.intensity`), and "manual" (the reference's
user-assisted napari flow, biahub/estimate_registration.py:60-358),
reachable two ways — like estimate-deskew:

- headless with point files (``--source-points``/``--target-points`` CSVs
  or .npy exported from any viewer; source points picked on the
  pre-aligned overlay, exactly the frame the napari flow records),
- interactively (:func:`user_assisted_registration`) when napari is
  installed: focus-slice jump, pre-rotation/flip/scale compound overlay,
  alternating click-pair collection, live registered preview.

The fit math (:func:`manual_transform_from_picked_points`) is shared by
both: 3D similarity, or the reference's Euclidean variant — 2D YX rigid fit
plus a z translation taken from the first point pair.
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
    "manual_compound_affine",
    "manual_transform_from_picked_points",
    "user_assisted_registration",
]

# Focus-finding constants of the reference's manual flow
# (reference: biahub/estimate_registration.py:42-46).
NA_DETECTION_SOURCE = 1.35
NA_DETECTION_TARGET = 1.35
WAVELENGTH_EMISSION_SOURCE_CHANNEL = 0.45  # um
WAVELENGTH_EMISSION_TARGET_CHANNEL = 0.6  # um
FOCUS_SLICE_ROI_WIDTH = 150

COLOR_CYCLE = [
    "white",
    "cyan",
    "lime",
    "orchid",
    "blue",
    "orange",
    "yellow",
    "magenta",
]


def manual_compound_affine(
    source_shape_zyx: tuple[int, int, int],
    target_shape_zyx: tuple[int, int, int],
    source_voxel_size,
    target_voxel_size,
    pre_affine_90degree_rotation: int = 0,
    pre_affine_fliplr: bool = False,
) -> np.ndarray:
    """Pre-alignment compound affine of the manual flow: voxel-size rescale ∘
    optional 90° in-plane rotation ∘ optional left-right flip (flip first)
    (reference: biahub/estimate_registration.py:159-192).
    """
    sz = float(source_voxel_size[-3]) / float(target_voxel_size[-3])
    syx = float(source_voxel_size[-1]) / float(target_voxel_size[-1])
    scaling_affine = get_3D_rescaling_matrix(
        target_shape_zyx, (sz, syx, syx), target_shape_zyx
    )
    rotate90_affine = get_3D_rotation_matrix(
        source_shape_zyx, 90.0 * pre_affine_90degree_rotation, target_shape_zyx
    )
    fliplr_affine = (
        get_3D_fliplr_matrix(source_shape_zyx, target_shape_zyx)
        if pre_affine_fliplr
        else np.eye(4)
    )
    return scaling_affine @ rotate90_affine @ fliplr_affine


def manual_transform_from_picked_points(
    source_points: np.ndarray,
    target_points: np.ndarray,
    compound_affine: np.ndarray,
    similarity: bool = False,
) -> np.ndarray:
    """Output→input registration matrix from clicked point pairs.

    ``source_points`` are in the PRE-ALIGNED display frame (picked on the
    compound-affine overlay, as the napari flow records them). Similarity
    fits all three axes; Euclidean mirrors the reference exactly — a 2D YX
    rigid fit plus a z translation from the FIRST point pair
    (reference: biahub/estimate_registration.py:306-333).
    """
    src = np.asarray(source_points, dtype=np.float64)
    dst = np.asarray(target_points, dtype=np.float64)
    if src.shape != dst.shape or src.ndim != 2 or src.shape[1] != 3:
        raise ValueError(
            f"point arrays must both be (N, 3) ZYX; got {src.shape} vs {dst.shape}"
        )
    if len(src) < 3:
        raise ValueError("need at least three point pairs")
    if similarity:
        fit = fit_transform(src, dst, "similarity")
    else:
        yx = fit_transform(src[:, 1:], dst[:, 1:], "euclidean")  # (3, 3)
        z_translation = dst[0, 0] - src[0, 0]
        fit = np.vstack(
            [
                np.array([[1.0, 0.0, 0.0, z_translation]]),
                np.insert(yx, 0, 0.0, axis=1),
            ]
        )
    # fit @ compound maps source→target points; the warp matrix
    # (output→input, scipy convention) is its inverse.
    return np.linalg.inv(fit @ np.asarray(compound_affine, dtype=np.float64))


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
    source_points_frame: str = "original",
) -> np.ndarray:
    """Manual registration from point pairs, headless.

    ``source_points_frame``: ``"original"`` (default, round-2-compatible)
    means the source points were picked on the raw source volume (e.g. in
    Fiji) and are composed with the compound pre-alignment here;
    ``"pre_aligned"`` means they were picked on the compound-affine overlay
    — the frame the napari flow records (reference parity; the CLI's
    ``--source-points`` path passes this explicitly).
    """
    compound = manual_compound_affine(
        source_shape_zyx,
        target_shape_zyx,
        source_voxel_size,
        target_voxel_size,
        pre_affine_90degree_rotation,
        pre_affine_fliplr,
    )
    src = np.asarray(source_points, dtype=np.float64)
    if source_points_frame == "original":
        hom = np.hstack([src, np.ones((len(src), 1))])
        src = (compound @ hom.T).T[:, :3]
    elif source_points_frame != "pre_aligned":
        raise ValueError(f"unknown source_points_frame {source_points_frame!r}")
    return manual_transform_from_picked_points(
        src, target_points, compound, similarity
    )


def _load_points(path: str | Path) -> np.ndarray:
    """Load an (N, 3) ZYX points array from a .npy or CSV/TSV file.

    Accepts headerless numeric files AND napari's "Save Points layer" export
    (header row ``index,axis-0,axis-1,axis-2`` plus a leading index column):
    a non-numeric first row is skipped and a 4th leading column of
    0,1,2,... is dropped.
    """
    path = Path(path)
    if path.suffix == ".npy":
        pts = np.load(path)
    else:
        delimiter = "," if path.suffix == ".csv" else None
        try:
            pts = np.loadtxt(path, delimiter=delimiter, ndmin=2)
        except ValueError:
            pts = np.loadtxt(path, delimiter=delimiter, skiprows=1, ndmin=2)
    if pts.ndim == 2 and pts.shape[1] == 4 and np.array_equal(
        pts[:, 0], np.arange(len(pts))
    ):
        pts = pts[:, 1:]  # napari's row-index column
    return pts


def estimate_registration(
    source_position_dirpaths: list[Path],
    target_position_dirpaths: list[Path],
    output_filepath: Path,
    config_filepath: Path,
    registration_target_channel: str | None,
    registration_source_channel: list[str],
    sbatch_filepath: str | None = None,
    local: bool = False,
    source_points: str | Path | None = None,
    target_points: str | Path | None = None,
    source_points_frame: str = "pre_aligned",
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
        manual = settings.manual_registration_settings
        t_idx = manual.time_index if manual else 0
        similarity = settings.affine_transform_settings.transform_type == "similarity"
        rot90 = manual.affine_90degree_rotation if manual else 0
        fliplr = manual.affine_fliplr if manual else False
        if source_points is not None or target_points is not None:
            if source_points is None or target_points is None:
                raise click.ClickException(
                    "--source-points and --target-points must be given together"
                )
            tform = registration_from_point_pairs(
                source_points=_load_points(source_points),
                target_points=_load_points(target_points),
                source_shape_zyx=source_data.shape[-3:],
                target_shape_zyx=target_data.shape[-3:],
                source_voxel_size=source_voxel_size,
                target_voxel_size=target_voxel_size,
                similarity=similarity,
                pre_affine_90degree_rotation=rot90,
                pre_affine_fliplr=fliplr,
                source_points_frame=source_points_frame,
            )
            transforms = [tform.tolist()]
        else:
            try:
                transforms = user_assisted_registration(
                    source_channel_volume=np.asarray(
                        source_data[t_idx, source_channel_index]
                    ),
                    source_channel_name=source_channel_name,
                    source_channel_voxel_size=source_voxel_size,
                    target_channel_volume=np.asarray(
                        target_data[t_idx, target_channel_index]
                    ),
                    target_channel_name=target_channel_name,
                    target_channel_voxel_size=target_voxel_size,
                    similarity=similarity,
                    pre_affine_90degree_rotation=rot90,
                    pre_affine_fliplr=fliplr,
                )
            except RuntimeError as exc:
                raise click.ClickException(str(exc)) from None
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
@click.option(
    "--source-points",
    type=click.Path(exists=True),
    default=None,
    help="Manual method, headless: (N, 3) ZYX source point file (.csv/.npy) "
    "picked on the pre-aligned overlay (the frame the napari flow records).",
)
@click.option(
    "--target-points",
    type=click.Path(exists=True),
    default=None,
    help="Manual method, headless: (N, 3) ZYX target point file (.csv/.npy) "
    "matching --source-points pair for pair.",
)
@click.option(
    "--source-points-frame",
    type=click.Choice(["pre_aligned", "original"]),
    default="pre_aligned",
    show_default=True,
    help="Frame of --source-points: 'pre_aligned' = picked on the "
    "compound-affine overlay (what the napari flow records); 'original' = "
    "picked on the raw source volume (e.g. in Fiji).",
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
    source_points: str | None = None,
    target_points: str | None = None,
    source_points_frame: str = "pre_aligned",
):
    """Estimate the affine transformation between a source and target image for registration.

    Estimates registration transforms between a source (moving) and target (fixed)
    image using (1) bead matches across timepoints, (2) image features via
    multi-resolution intensity optimization, or (3) manual point pairs — clicked
    interactively in napari, or supplied headless via --source-points/
    --target-points files. The output is a configuration file consumed by
    `stabilize` and `register`.

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
        source_points=source_points,
        target_points=target_points,
        source_points_frame=source_points_frame,
    )


if __name__ == "__main__":
    estimate_registration_cli()


def _find_focus_slice(
    volume: np.ndarray, na_det: float, wavelength: float, pixel_size: float
) -> int:
    """In-focus z index over the central ROI, falling back to the mid-slice
    when the metric lands on an edge (reference:
    biahub/estimate_registration.py:113-157)."""
    from biahub_tpu.kernels.focus import focus_from_transverse_band

    z, y, x = volume.shape[-3:]
    roi = volume[
        :,
        max(y // 2 - FOCUS_SLICE_ROI_WIDTH, 0) : y // 2 + FOCUS_SLICE_ROI_WIDTH,
        max(x // 2 - FOCUS_SLICE_ROI_WIDTH, 0) : x // 2 + FOCUS_SLICE_ROI_WIDTH,
    ]
    idx = focus_from_transverse_band(
        roi, NA_det=na_det, lambda_ill=wavelength, pixel_size=pixel_size
    )
    if idx in (0, z - 1):
        idx = z // 2
        click.echo(f"Could not determine best focus slice, using {idx}")
    else:
        click.echo(f"Best focus slice: {idx}")
    return idx


def user_assisted_registration(
    source_channel_volume: np.ndarray,
    source_channel_name: str,
    source_channel_voxel_size,
    target_channel_volume: np.ndarray,
    target_channel_name: str,
    target_channel_voxel_size,
    similarity: bool = False,
    pre_affine_90degree_rotation: int = 0,
    pre_affine_fliplr: bool = False,
) -> list:
    """Interactive manual registration in napari (reference:
    biahub/estimate_registration.py:60-358).

    Shows the target volume and the compound-pre-aligned source volume, jumps
    each point layer to its in-focus slice, collects alternating click pairs,
    fits the transform, and previews the registered source before returning
    ``[matrix.tolist()]``. Headless (no napari) this raises with a pointer to
    the ``--source-points``/``--target-points`` file path.
    """
    try:
        import napari  # type: ignore
    except ImportError:
        raise RuntimeError(
            "user_assisted_registration requires an interactive napari "
            "session; headless, export point pairs and pass --source-points/"
            "--target-points (or call registration_from_point_pairs), or use "
            "the 'beads'/'ants' estimation methods."
        ) from None

    from biahub_tpu.registration.utils import apply_affine_transform

    source = np.asarray(source_channel_volume, dtype=np.float32)
    target = np.asarray(target_channel_volume, dtype=np.float32)
    click.echo("Finding source channel focus slice...")
    source_focus_idx = _find_focus_slice(
        source,
        NA_DETECTION_SOURCE,
        WAVELENGTH_EMISSION_SOURCE_CHANNEL,
        source_channel_voxel_size[-1],
    )
    click.echo("Finding target channel focus slice...")
    target_focus_idx = _find_focus_slice(
        target,
        NA_DETECTION_TARGET,
        WAVELENGTH_EMISSION_TARGET_CHANNEL,
        target_channel_voxel_size[-1],
    )
    scaling_factor_z = source_channel_voxel_size[-3] / target_channel_voxel_size[-3]

    compound = manual_compound_affine(
        source.shape,
        target.shape,
        source_channel_voxel_size,
        target_channel_voxel_size,
        pre_affine_90degree_rotation,
        pre_affine_fliplr,
    )
    # Display overlay: warp the source into the target frame (output→input
    # matrix = the compound's inverse).
    source_pre_reg = apply_affine_transform(
        source, np.linalg.inv(compound), target.shape
    )

    viewer = napari.Viewer()
    viewer.add_image(target, name=f"target_{target_channel_name}")
    points_target = viewer.add_points(
        ndim=3,
        name=f"pts_target_{target_channel_name}",
        size=20,
        face_color=COLOR_CYCLE[0],
    )
    source_layer = viewer.add_image(
        source_pre_reg,
        name=f"source_{source_channel_name}",
        blending="additive",
        colormap="green",
    )
    points_source = viewer.add_points(
        ndim=3,
        name=f"pts_source_{source_channel_name}",
        size=20,
        face_color=COLOR_CYCLE[0],
    )
    viewer.layers.selection.active = points_source
    points_source.mode = "add"
    points_target.mode = "add"

    def next_on_click(layer, event):
        """Alternate between the two point layers after each click, jumping
        the z slider to the partner layer's last point (or its focus slice)
        and cycling the pair color."""
        if layer.mode != "add":
            return
        other = points_target if layer is points_source else points_source
        if len(other.data) < 1:
            focus = (
                target_focus_idx
                if other is points_target
                else source_focus_idx * scaling_factor_z
            )
            next_step = (focus, 0, 0)
        else:
            next_step = (other.data[-1][0], 0, 0)
        layer.add(layer.world_to_data(viewer.cursor.position))
        shift = 0 if layer is points_source else 1
        current = COLOR_CYCLE.index(layer.current_face_color)
        other.current_face_color = COLOR_CYCLE[
            (current + shift) % len(COLOR_CYCLE)
        ]
        other.mode = "add"
        layer.selected_data = {}
        viewer.layers.selection.active = other
        viewer.dims.current_step = next_step

    viewer.dims.current_step = (source_focus_idx * scaling_factor_z, 0, 0)
    points_source.mouse_drag_callbacks.append(next_on_click)
    points_target.mouse_drag_callbacks.append(next_on_click)

    input(
        "Add at least three points in the two channels by sequentially "
        "clicking on a feature in the source channel and its corresponding "
        "feature in target channel. Select grid mode if you prefer "
        "side-by-side view. Press <enter> when done..."
    )

    tform = manual_transform_from_picked_points(
        np.asarray(points_source.data),
        np.asarray(points_target.data),
        compound,
        similarity=similarity,
    )

    click.echo("\nShowing registered source image in magenta")
    registered = apply_affine_transform(source, tform, target.shape)
    viewer.add_image(
        registered,
        name=f"registered_{source_channel_name}",
        colormap="magenta",
        blending="additive",
    )
    viewer.layers.remove(points_source)
    viewer.layers.remove(points_target)
    source_layer.visible = False
    click.echo(f"Estimated affine transformation matrix:\n{tform}\n")
    input("Press <Enter> to close the viewer and exit...")
    viewer.close()
    return [tform.tolist()]

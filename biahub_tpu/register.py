"""``biahub register``: apply a 4x4 affine across a plate.

Semantics mirror the reference (reference: biahub/register.py:404-613):
source channels listed in the config are warped into the target frame, all
other target channels are crop-copied, and without ``keep_overhang`` the
output is cropped to the largest interior rectangle of the overlap. The ANTs
resampler is replaced by the device warp kernel, with the crop offset folded
into the affine so cropped voxels are never computed.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import click
import numpy as np

from biahub_tpu.cli.parsing import (
    config_filepath,
    local,
    monitor,
    output_dirpath,
    sbatch_filepath,
    source_position_dirpaths,
    target_position_dirpaths,
)
from biahub_tpu.cli.utils import yaml_to_model
from biahub_tpu.io.ngff import create_empty_plate, get_ome_zarr_version, open_ome_zarr
from biahub_tpu.kernels.affine import affine_warp_auto, affine_warp_zyx
from biahub_tpu.runtime import BatchRunner, estimate_resources, resolve_cluster
from biahub_tpu.settings import RegistrationSettings
from biahub_tpu.transforms.lir import largest_interior_rectangle

__all__ = [
    "register_cli",
    "apply_affine_transform",
    "find_lir",
    "find_overlapping_volume",
    "rescale_voxel_size",
    "get_3D_rescaling_matrix",
    "get_3D_rotation_matrix",
    "get_3D_fliplr_matrix",
]


def get_3D_rescaling_matrix(start_shape_zyx, scaling_factor_zyx=(1, 1, 1), end_shape_zyx=None):
    """YX-centered anisotropic rescale (reference: biahub/register.py:35-60)."""
    center_y_start, center_x_start = np.array(start_shape_zyx)[-2:] / 2
    if end_shape_zyx is None:
        center_y_end, center_x_end = center_y_start, center_x_start
    else:
        center_y_end, center_x_end = np.array(end_shape_zyx)[-2:] / 2
    sz, sy, sx = scaling_factor_zyx[-3], scaling_factor_zyx[-2], scaling_factor_zyx[-1]
    return np.array(
        [
            [sz, 0, 0, 0],
            [0, sy, 0, -center_y_start * sy + center_y_end],
            [0, 0, sx, -center_x_start * sx + center_x_end],
            [0, 0, 0, 1],
        ]
    )


def get_3D_rotation_matrix(start_shape_zyx, angle: float = 0.0, end_shape_zyx=None):
    """In-plane (YX) rotation about the volume center (reference: biahub/register.py:63-114)."""
    center_y_start, center_x_start = np.array(start_shape_zyx)[-2:] / 2
    if end_shape_zyx is None:
        center_y_end, center_x_end = center_y_start, center_x_start
    else:
        center_y_end, center_x_end = np.array(end_shape_zyx)[-2:] / 2
    theta = np.radians(angle)
    c, s = np.cos(theta), np.sin(theta)
    return np.array(
        [
            [1, 0, 0, 0],
            [0, c, -s, -center_y_start * c + s * center_x_start + center_y_end],
            [0, s, c, -center_y_start * s - center_x_start * c + center_x_end],
            [0, 0, 0, 1],
        ]
    )


def get_3D_fliplr_matrix(start_shape_zyx, end_shape_zyx=None):
    """Left-right (X) flip about the volume center (reference: biahub/register.py:117-148)."""
    center_x_start = start_shape_zyx[-1] / 2
    center_x_end = center_x_start if end_shape_zyx is None else end_shape_zyx[-1] / 2
    return np.array(
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, -1, 2 * center_x_end],
            [0, 0, 0, 1],
        ]
    )


def apply_affine_transform(
    zyx_data: np.ndarray,
    matrix: np.ndarray,
    output_shape_zyx: tuple,
    method: str = "jax",
    interpolation: str = "linear",
    crop_output_slicing=None,
) -> np.ndarray:
    """Warp one ZYX (or CZYX) volume by a homogeneous output→input matrix.

    With ``crop_output_slicing`` the crop start is folded into the matrix's
    translation so only the cropped region is computed.
    """
    if zyx_data.ndim == 4:
        return np.stack(
            [
                apply_affine_transform(
                    c, matrix, output_shape_zyx, method, interpolation, crop_output_slicing
                )
                for c in zyx_data
            ]
        )
    matrix = np.asarray(matrix, dtype=np.float64)
    out_shape = tuple(output_shape_zyx)
    if crop_output_slicing is not None:
        z_slice, y_slice, x_slice = crop_output_slicing
        start = np.array([z_slice.start, y_slice.start, x_slice.start], dtype=np.float64)
        out_shape = (
            z_slice.stop - z_slice.start,
            y_slice.stop - y_slice.start,
            x_slice.stop - x_slice.start,
        )
        shifted = matrix.copy()
        shifted[:3, 3] = matrix[:3, 3] + matrix[:3, :3] @ start
        matrix = shifted
    order = 0 if interpolation in ("nearest", "nearestNeighbor", "genericLabel") else 1
    zyx_data = np.nan_to_num(np.asarray(zyx_data, dtype=np.float32), nan=0)
    return np.asarray(affine_warp_auto(zyx_data, matrix, out_shape, order=order))


def find_lir(registered_zyx: np.ndarray, plot: bool = False) -> tuple:
    """ZYX slices of the largest interior rectangle of a boolean volume.

    Search strategy matches the reference (reference: biahub/register.py:287-345):
    LIR of the central YX plane, then the Z window over probe ZX/ZY slices.
    """
    registered_zyx = np.asarray(registered_zyx, dtype=bool)

    registered_yx = registered_zyx[registered_zyx.shape[0] // 2]
    x, y, width, height = largest_interior_rectangle(registered_yx)
    x_start, x_stop = x, x + width
    y_start, y_stop = y, y + height
    x_slice = slice(x_start, x_stop)
    y_slice = slice(y_start, y_stop)

    coords = []
    for _x in (x_start, x_start + (x_stop - x_start) // 2, x_stop - 1):
        _, z, _, depth = largest_interior_rectangle(registered_zyx[:, y_slice, _x])
        coords.append((z, z + depth))
    for _y in (y_start, y_start + (y_stop - y_start) // 2, y_stop - 1):
        _, z, _, depth = largest_interior_rectangle(registered_zyx[:, _y, x_slice])
        coords.append((z, z + depth))

    coords = np.asarray(coords)
    z_slice = slice(int(coords.max(axis=0)[0]), int(coords.min(axis=0)[1]))
    return (z_slice, y_slice, x_slice)


def find_overlapping_volume(
    input_zyx_shape: tuple,
    target_zyx_shape: tuple,
    transformation_matrix: np.ndarray,
    method: str = "LIR",
    plot: bool = False,
) -> tuple:
    """ZYX slices of the overlap of a warped dummy volume with the target frame."""
    moving = np.ones(tuple(input_zyx_shape), dtype=np.float32)
    registered = apply_affine_transform(
        moving, transformation_matrix, tuple(target_zyx_shape)
    )
    if method != "LIR":
        raise ValueError(f"Unknown method {method}")
    click.echo("Starting Largest interior rectangle (LIR) search")
    mask = registered > 0
    return find_lir(mask, plot=plot)


def rescale_voxel_size(affine_matrix, input_scale):
    return np.linalg.norm(affine_matrix, axis=1) * input_scale


@click.command("register")
@source_position_dirpaths()
@target_position_dirpaths()
@config_filepath()
@output_dirpath()
@local()
@sbatch_filepath()
@monitor()
def register_cli(
    source_position_dirpaths: list[Path],
    target_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
    local: bool,
    sbatch_filepath: Path,
    monitor: bool = True,
):
    """Apply an affine transformation to a single position across T and C axes based on a registration config file.

    Start by generating an initial affine transform with `estimate-register`.
    Optionally, refine this transform with `optimize-register`. Finally, use `register`.

    >>> biahub register \\
        -s source.zarr/*/*/* \\
        -t target.zarr/*/*/* \\
        -c config.yaml \\
        -o ./acq_name_registerred.zarr
    """
    output_dirpath = Path(output_dirpath)

    settings = yaml_to_model(config_filepath, RegistrationSettings)
    matrix = np.array(settings.affine_transform_zyx)
    keep_overhang = settings.keep_overhang

    source_dataset = open_ome_zarr(source_position_dirpaths[0])
    T, C, Z, Y, X = source_dataset.data.shape
    source_channel_names = source_dataset.channel_names
    source_shape_zyx = source_dataset.data.shape[-3:]
    source_voxel_size = source_dataset.scale[-3:]
    output_voxel_size = rescale_voxel_size(matrix[:3, :3], source_voxel_size)

    target_dataset = open_ome_zarr(target_position_dirpaths[0])
    target_channel_names = target_dataset.channel_names
    target_shape_zyx = target_dataset.data.shape[-3:]

    click.echo("\nREGISTRATION PARAMETERS:")
    click.echo(f"Transformation matrix:\n{matrix}")
    click.echo(f"Voxel size: {output_voxel_size}")

    if settings.time_indices == "all":
        time_indices = list(range(T))
    elif isinstance(settings.time_indices, list):
        time_indices = settings.time_indices
    else:
        time_indices = [settings.time_indices]

    output_channel_names = list(target_channel_names)
    if target_position_dirpaths != source_position_dirpaths:
        output_channel_names += list(source_channel_names)

    if not keep_overhang:
        click.echo("\nFinding largest overlapping volume between source and target datasets")
        z_slice, y_slice, x_slice = find_overlapping_volume(
            source_shape_zyx, target_shape_zyx, matrix
        )
        cropped_shape_zyx = (
            z_slice.stop - z_slice.start,
            y_slice.stop - y_slice.start,
            x_slice.stop - x_slice.start,
        )
        click.echo(f"Shape of cropped output dataset: {cropped_shape_zyx}\n")
    else:
        cropped_shape_zyx = tuple(target_shape_zyx)
        z_slice, y_slice, x_slice = (
            slice(0, cropped_shape_zyx[-3]),
            slice(0, cropped_shape_zyx[-2]),
            slice(0, cropped_shape_zyx[-1]),
        )

    version = settings.output_ome_zarr_version or get_ome_zarr_version(
        Path(source_position_dirpaths[0]).parents[2]
    )
    create_empty_plate(
        store_path=output_dirpath,
        position_keys=[Path(p).parts[-3:] for p in source_position_dirpaths],
        channel_names=output_channel_names,
        shape=(len(time_indices), len(output_channel_names)) + tuple(cropped_shape_zyx),
        scale=(1, 1) + tuple(output_voxel_size),
        dtype=np.float32,
        version=version,
    )

    estimate_resources(shape=(T, C, Z, Y, X), ram_multiplier=5)
    resolved = resolve_cluster(None, local)
    click.echo(f"Running on-device batches (mode='{resolved}')")

    # Fold the crop start into the affine: only cropped voxels are computed.
    crop = None if keep_overhang else [z_slice, y_slice, x_slice]
    warp_matrix = np.asarray(matrix, dtype=np.float64)
    if crop is not None:
        start = np.array([z_slice.start, y_slice.start, x_slice.start], dtype=np.float64)
        warp_matrix = warp_matrix.copy()
        warp_matrix[:3, 3] += warp_matrix[:3, :3] @ start
    order = 0 if settings.interpolation in ("nearest", "nearestNeighbor") else 1

    kernel = _make_register_kernel(
        warp_matrix, tuple(cropped_shape_zyx), order
    )

    source_positions = [open_ome_zarr(p, mode="r") for p in source_position_dirpaths]
    target_positions = [open_ome_zarr(p, mode="r") for p in target_position_dirpaths]
    output_positions = [
        open_ome_zarr(output_dirpath / Path(*Path(p).parts[-3:]), mode="r+")
        for p in source_position_dirpaths
    ]
    extra_metadata = {
        "biahub-register": {
            "affine_transformation": {"transform_matrix": matrix.tolist()},
            "settings": settings.model_dump(),
        }
    }
    for out_pos in output_positions:
        out_pos.update_zattrs(extra_metadata)

    # Warp the registered source channels
    runner = BatchRunner(cluster=resolved)
    registered_pairs = [
        (source_channel_names.index(name), output_channel_names.index(name))
        for name in source_channel_names
        if name in settings.source_channel_names
    ]
    from biahub_tpu.kernels.multipass_warp import common_frame_bytes

    # Budget in + out + the warp's internal common-frame footprint: a
    # rotation's frame can dwarf both, so an "in-budget" volume could still
    # blow HBM inside the multipass warp without this term.
    workspace_bytes = common_frame_bytes(
        warp_matrix, source_shape_zyx, tuple(cropped_shape_zyx)
    )
    volume_bytes = (
        4 * (int(np.prod(source_shape_zyx)) + int(np.prod(cropped_shape_zyx)))
        + workspace_bytes
    )
    if volume_bytes > runner.max_batch_bytes:
        # A single volume exceeds the HBM budget: warp output chunks whose
        # input sub-boxes are back-propagated through the pass chain
        # (kernels/multipass_warp.py; the general-warp analog of the deskew
        # X-slab split). The dispatcher also covers order=0 (exact per-chunk
        # nearest gather) and vanishing-pivot matrices, so no whole-volume
        # batch is ever attempted over budget.
        from biahub_tpu.kernels.multipass_warp import chunked_affine_warp_zyx

        chunk = tuple(
            max(32, s // max(1, int(np.ceil(volume_bytes / runner.max_batch_bytes))))
            for s in cropped_shape_zyx
        )
        click.echo(
            f"Volume exceeds the device batch budget; warping in output "
            f"chunks of {chunk}"
        )
        from biahub_tpu.runtime.executor import stripe_units

        chunk_units = [
            (src_pos, out_pos, int(t), t_out, int(c_in), int(c_out))
            for src_pos, out_pos in zip(source_positions, output_positions)
            for t_out, t in enumerate(time_indices)
            for c_in, c_out in registered_pairs
        ]
        n = 0
        for src_pos, out_pos, t, t_out, c_in, c_out in stripe_units(chunk_units):
            def read_fn(zs, ys, xs, _t=t, _c=c_in, _p=src_pos):
                return np.asarray(_p.data[_t, _c, zs, ys, xs], np.float32)

            def write_fn(zs, ys, xs, d, _t=t_out, _c=c_out, _p=out_pos):
                _p["0"][_t, _c, zs, ys, xs] = d

            chunked_affine_warp_zyx(
                read_fn,
                warp_matrix,
                source_shape_zyx,
                tuple(cropped_shape_zyx),
                chunk,
                write_fn=write_fn,
                order=order,
            )
            n += 1
    else:
        n = runner.run_zyx(
            kernel,
            source_positions,
            output_positions,
            channel_pairs=registered_pairs,
            time_indices=time_indices,
            monitor=monitor and resolved != "debug",
            unit_workspace_bytes=workspace_bytes,
        )

    # Crop-copy the non-registered target channels
    copy_pairs = [
        (target_channel_names.index(name), output_channel_names.index(name))
        for name in target_channel_names
        if name not in settings.source_channel_names
    ]
    if copy_pairs:
        _copy_cropped(
            target_positions, output_positions, copy_pairs, time_indices,
            (z_slice, y_slice, x_slice),
        )
    click.echo(f"Registered {n} (t, c) volumes")


def _make_register_kernel(matrix, output_shape, order):
    """Jittable per-volume kernel, dispatched on the static matrix structure
    (translation / in-plane / general; see kernels.affine.affine_warp_auto)."""
    matrix = np.asarray(matrix, dtype=np.float64)

    def kernel(zyx):
        return affine_warp_auto(zyx, matrix, output_shape, order=order)

    return kernel


def _copy_cropped(target_positions, output_positions, pairs, time_indices, slices):
    z_slice, y_slice, x_slice = slices
    futures = []
    for in_pos, out_pos in zip(target_positions, output_positions):
        out_arr = out_pos["0"]
        for t_out, t in enumerate(time_indices):
            for c_in, c_out in pairs:
                data = in_pos.data[int(t), int(c_in), z_slice, y_slice, x_slice]
                futures.append(
                    out_arr.write_async((t_out, c_out), data.astype(out_arr.dtype))
                )
    for f in futures:
        f.result()


if __name__ == "__main__":
    register_cli()


def convert_transform_to_ants(T_numpy):
    """Reference-name shim (reference: biahub/register.py:151-176): there is
    no ANTs object model in this build — Transform and plain 4x4 arrays are
    the interchange format (see PARITY.md "Known deltas")."""
    raise ImportError(
        "ANTs transform objects are not part of biahub-tpu; pass the 4x4 "
        "numpy matrix directly (every warp/registration API here accepts it)."
    )


def convert_transform_to_numpy(T_ants):
    """Reference-name shim (reference: biahub/register.py:179-202); see
    :func:`convert_transform_to_ants`."""
    raise ImportError(
        "ANTs transform objects are not part of biahub-tpu; transforms are "
        "already plain 4x4 numpy matrices here."
    )

"""``biahub stabilize``: apply per-timepoint 4x4 transforms across a plate.

Semantics follow the reference (reference: biahub/stabilize.py:96-327):
per-FOV config files are matched by position name, the first transform's
rotation decides whether the output YX axes swap, and every channel is
warped. The per-timepoint ANTs resample becomes ONE jitted batched warp whose
matrix is a traced per-unit parameter — all timepoints share a single
compiled kernel.
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np
from scipy.linalg import svd
from scipy.spatial.transform import Rotation as R  # noqa: N817

from biahub_tpu.cli.disk import check_disk_space_with_du
from biahub_tpu.cli.parsing import (
    config_filepaths,
    input_position_dirpaths,
    local,
    monitor,
    output_dirpath,
    sbatch_filepath,
)
from biahub_tpu.cli.utils import yaml_to_model
from biahub_tpu.io.ngff import create_empty_plate, get_ome_zarr_version, open_ome_zarr
from biahub_tpu.kernels.affine import (
    affine_warp_auto,
    affine_warp_zyx,
    inplane_affine_warp_zyx,
    is_inplane_matrix,
    is_translation_matrix,
    make_batched_inplane_kernel,
    translation_warp_zyx,
)
from biahub_tpu.kernels.multipass_warp import make_batched_multipass_kernel
from biahub_tpu.runtime import BatchRunner, estimate_resources, resolve_cluster
from biahub_tpu.runtime.executor import WorkUnit
from biahub_tpu.settings import StabilizationSettings

__all__ = ["stabilize", "stabilize_cli", "apply_stabilization_transform"]


def apply_stabilization_transform(
    zyx_data: np.ndarray,
    list_of_shifts: list[np.ndarray],
    input_time_index: int,
    output_shape: tuple[int, int, int] | None = None,
) -> np.ndarray:
    """Warp one 3D/4D volume by the transform for its time index (host API)."""
    if output_shape is None:
        output_shape = zyx_data.shape[-3:]
    matrix = np.asarray(list_of_shifts[input_time_index], dtype=np.float64)
    if zyx_data.ndim == 4:
        return np.stack(
            [
                apply_stabilization_transform(c, list_of_shifts, input_time_index, output_shape)
                for c in zyx_data
            ]
        )
    zyx_data = np.nan_to_num(zyx_data, nan=0).astype(np.float32)
    # The stabilization matrices are forward ANTs-style (output->input index
    # map), matching the reference's apply path.
    return np.asarray(affine_warp_auto(zyx_data, matrix, tuple(output_shape)))


def _output_yx(settings: StabilizationSettings, Y: int, X: int) -> tuple[int, int]:
    """Swap YX when the first transform is a ~90deg rotation.

    Mirrors the rotation-angle-aware output shape of the reference
    (reference: biahub/stabilize.py:167-185).
    """
    r_matrix = np.array(settings.affine_transform_zyx_list[0])[:3, :3]
    u, _, vt = svd(r_matrix)
    euler = R.from_matrix(u @ vt).as_euler("xyz", degrees=True)
    if np.isclose(euler[0], 90, atol=10):
        return X, Y
    return Y, X


def stabilize(
    input_position_dirpaths: list[Path],
    output_dirpath: Path,
    config_filepaths: list[Path],
    sbatch_filepath: str | None = None,
    local: bool = False,
    monitor: bool = True,
):
    settings = yaml_to_model(config_filepaths[0], StabilizationSettings)
    output_dirpath = Path(output_dirpath)

    dataset = open_ome_zarr(input_position_dirpaths[0])
    T, C, Z, Y, X = dataset.data.shape
    channel_names = dataset.channel_names

    out_y, out_x = _output_yx(settings, Y, X)
    out_shape_zyx = (Z, out_y, out_x)

    if settings.time_indices == "all":
        time_indices = list(range(T))
    elif isinstance(settings.time_indices, list):
        time_indices = settings.time_indices
    else:
        time_indices = [settings.time_indices]

    version = settings.output_ome_zarr_version or get_ome_zarr_version(
        Path(input_position_dirpaths[0]).parents[2]
    )
    create_empty_plate(
        store_path=output_dirpath,
        position_keys=[Path(p).parts[-3:] for p in input_position_dirpaths],
        channel_names=channel_names,
        shape=(len(time_indices), len(channel_names)) + out_shape_zyx,
        scale=settings.output_voxel_size,
        dtype=np.float32,
        version=version,
    )

    if not check_disk_space_with_du(
        input_path=input_position_dirpaths[0],
        output_path=output_dirpath,
        margin=1.1,
        verbose=True,
    ):
        raise RuntimeError(f"Not enough disk space to store the output at {output_dirpath}")

    estimate_resources(shape=(T, C, Z, Y, X), ram_multiplier=16, max_num_cpus=16)
    resolved = resolve_cluster(None, local)
    click.echo(f"Running on-device batches (mode='{resolved}')")

    # Per-FOV configs: matched by "<row>_<col>_<fov>" in the filename
    # (reference: biahub/stabilize.py:275-283).
    def config_for(path: Path) -> StabilizationSettings:
        if len(config_filepaths) > 1:
            fov = "_".join(Path(path).parts[-3:])
            matches = [p for p in config_filepaths if fov in Path(p).name]
            if not matches:
                raise click.ClickException(f"No config file matches position {fov}")
            return yaml_to_model(matches[0], StabilizationSettings)
        return settings

    input_positions = [open_ome_zarr(p, mode="r") for p in input_position_dirpaths]
    output_positions = [
        open_ome_zarr(output_dirpath / Path(*Path(p).parts[-3:]), mode="r+")
        for p in input_position_dirpaths
    ]
    per_position_mats = []
    for path, out_pos in zip(input_position_dirpaths, output_positions):
        fov_settings = config_for(path)
        per_position_mats.append(
            np.asarray(fov_settings.affine_transform_zyx_list, dtype=np.float32)
        )
        out_pos.update_zattrs({"biahub-stabilize": fov_settings.model_dump()})

    units = [
        WorkUnit(p_idx, int(t), c, c, int(t_out))
        for p_idx in range(len(input_positions))
        for t_out, t in enumerate(time_indices)
        for c in range(C)
    ]

    # One compiled kernel serves every timepoint; the matrix is a traced
    # per-unit parameter, so the kernel STRUCTURE is chosen host-side from the
    # whole matrix list (translations and z-decoupled affines avoid TPU's
    # slow elementwise gather; see kernels.affine). Fully general matrices run
    # the batched multipass program: per-matrix LU coefficients ride along as
    # a traced (7, 3) parameter through one fixed pass sequence.
    all_mats = np.concatenate(per_position_mats)
    param_fn = lambda u: {"matrix": per_position_mats[u.pos_idx][u.t]}  # noqa: E731
    if all(is_translation_matrix(m) for m in all_mats):
        # The concrete shift list bounds the traced per-timepoint shift, so
        # the Pallas passes can run static slab windows (affine.py).
        shift_bounds = tuple(
            (float(all_mats[:, ax, 3].min()), float(all_mats[:, ax, 3].max()))
            for ax in range(3)
        )

        def kernel(zyx, matrix):
            return translation_warp_zyx(
                zyx, matrix[:3, 3], out_shape_zyx, shift_bounds=shift_bounds
            )
    elif all(is_inplane_matrix(m) for m in all_mats):
        kernel, ip_params = make_batched_inplane_kernel(
            all_mats, (Z, Y, X), out_shape_zyx
        )
        ip_offsets = np.cumsum([0] + [len(m) for m in per_position_mats])

        def param_fn(u):
            flat = ip_offsets[u.pos_idx] + u.t
            return {
                "matrix": per_position_mats[u.pos_idx][u.t],
                "ip": ip_params[flat],
            }
    else:
        try:
            kernel, mp_params = make_batched_multipass_kernel(
                all_mats, (Z, Y, X), out_shape_zyx
            )
            offsets = np.cumsum([0] + [len(m) for m in per_position_mats])

            def param_fn(u):
                flat = offsets[u.pos_idx] + u.t
                return {
                    "matrix": per_position_mats[u.pos_idx][u.t],
                    "mp": mp_params[flat],
                }
        except ValueError:  # vanishing pivot (e.g. 90-degree permutation)
            def kernel(zyx, matrix):
                return affine_warp_zyx(zyx, matrix, out_shape_zyx)

    runner = BatchRunner(cluster=resolved)
    from biahub_tpu.kernels.multipass_warp import common_frame_bytes

    # Budget in + out + the warp's internal common-frame footprint: a
    # rotation's frame can dwarf both, so an "in-budget" volume could still
    # blow HBM inside the multipass warp. The batched kernel builds ONE
    # frame spanning the UNION of every per-timepoint matrix's bounds, so
    # the estimate unions over all of them too.
    all_mats_flat = [m for mats in per_position_mats for m in mats]
    workspace_bytes = (
        common_frame_bytes(all_mats_flat, (Z, Y, X), tuple(out_shape_zyx))
        if all_mats_flat
        else 0
    )
    volume_bytes = (
        4 * (int(np.prod((Z, Y, X))) + int(np.prod(out_shape_zyx))) + workspace_bytes
    )
    if volume_bytes > runner.max_batch_bytes:
        # Over-HBM volumes: warp output chunks per unit with that unit's
        # matrix. chunked_affine_warp_zyx picks the same kernel family the
        # in-budget batched path would (translation / in-plane / multipass /
        # exact-gather fallback for vanishing-pivot matrices), so results do
        # not depend on the batch budget and 90-degree rotations don't crash
        # mid-run.
        from biahub_tpu.kernels.multipass_warp import chunked_affine_warp_zyx

        n_splits = max(1, int(np.ceil(volume_bytes / runner.max_batch_bytes)))
        chunk = tuple(max(32, s // n_splits) for s in out_shape_zyx)
        click.echo(
            f"Volume exceeds the device batch budget; stabilizing in output "
            f"chunks of {chunk}"
        )
        from biahub_tpu.runtime.executor import stripe_units

        n = 0
        for u in stripe_units(units):
            in_pos = input_positions[u.pos_idx]
            out_pos = output_positions[u.pos_idx]
            mat = np.asarray(per_position_mats[u.pos_idx][u.t], dtype=np.float64)

            def read_fn(zs, ys, xs, _t=u.t, _c=u.c_in, _p=in_pos):
                return np.asarray(_p.data[_t, _c, zs, ys, xs], np.float32)

            def write_fn(zs, ys, xs, d, _t=u.out_t, _c=u.c_out, _p=out_pos):
                _p["0"][_t, _c, zs, ys, xs] = d

            chunked_affine_warp_zyx(
                read_fn, mat, (Z, Y, X), tuple(out_shape_zyx), chunk,
                write_fn=write_fn,
            )
            n += 1
        click.echo(f"Stabilized {n} (t, c) volumes")
        return

    n = runner.run_units(
        kernel,
        units,
        input_positions,
        output_positions,
        per_unit_params=param_fn,
        monitor=monitor and resolved != "debug",
        unit_workspace_bytes=workspace_bytes,
    )
    click.echo(f"Stabilized {n} (t, c) volumes")


@click.command("stabilize")
@input_position_dirpaths()
@output_dirpath()
@config_filepaths()
@sbatch_filepath()
@local()
@monitor()
def stabilize_cli(
    input_position_dirpaths: list[Path],
    output_dirpath: Path,
    config_filepaths: list[Path],
    sbatch_filepath: str,
    local: bool,
    monitor: bool,
):
    """Stabilize a timelapse dataset by applying spatial transformations estimated by estimate-stabilization.

    >>> biahub stabilize \\
        -i ./timelapse.zarr/0/0/0 \\
        -o ./stabilized_timelapse.zarr \\
        -c ./file_w_matrices.yml \\
        --local
    """
    stabilize(
        input_position_dirpaths=input_position_dirpaths,
        output_dirpath=output_dirpath,
        config_filepaths=config_filepaths,
        sbatch_filepath=sbatch_filepath,
        local=local,
        monitor=monitor,
    )


if __name__ == "__main__":
    stabilize_cli()

"""``biahub stitch``: assemble each well's FOVs into one blended mosaic.

Chunked owner-computes assembly mirroring the reference (reference:
biahub/stitch.py:33-503): per-well output shapes from the translation table,
distance-transform edge-weight blending with a configurable exponent,
float16 output, one output chunk written at a time so mosaics never
materialize in memory.
"""

from __future__ import annotations

import os
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from itertools import product
from pathlib import Path

import click
import numpy as np
import scipy.ndimage

from biahub_tpu.cli.parsing import (
    config_filepath,
    input_position_dirpaths,
    local,
    monitor,
    output_dirpath,
    sbatch_filepath,
)
from biahub_tpu.cli.slurm import wait_for_jobs_to_finish
from biahub_tpu.cli.utils import yaml_to_model
from biahub_tpu.io.ngff import TransformationMeta, get_ome_zarr_version, open_ome_zarr
from biahub_tpu.runtime import estimate_resources, resolve_cluster
from biahub_tpu.settings import StitchSettings

__all__ = ["stitch_cli", "write_output_chunk", "get_output_shape"]


def list_of_nd_slices_from_array_shape(array_shape, chunk_shape):
    """Slices dividing an array of array_shape into chunk_shape chunks."""
    chunk_slices = []
    for idx in product(*[range(0, s, c) for s, c in zip(array_shape, chunk_shape)]):
        chunk_slices.append(
            tuple(
                slice(i, min(i + c, s))
                for i, c, s in zip(idx, chunk_shape, array_shape)
            )
        )
    return chunk_slices


def check_overlap(chunk, fov_shift, fov_extent) -> bool:
    for dim in range(3):
        if (
            chunk[dim].start >= fov_shift[dim] + fov_extent[dim]
            or chunk[dim].stop <= fov_shift[dim]
        ):
            return False
    return True


def overlap_slices(chunk_corner, chunk_extent, fov_corner, fov_extent):
    """(fixed, moving) slice triplets of the chunk/FOV overlap, or (None, None)."""
    fixed, moving = [], []
    for d in range(3):
        start = max(chunk_corner[d], fov_corner[d])
        stop = min(chunk_corner[d] + chunk_extent[d], fov_corner[d] + fov_extent[d])
        if stop <= start:
            return None, None
        fixed_slice = slice(int(start - chunk_corner[d]), int(stop - chunk_corner[d]))
        moving_slice = slice(int(start - fov_corner[d]), int(stop - fov_corner[d]))
        max_len = max(
            fixed_slice.stop - fixed_slice.start, moving_slice.stop - moving_slice.start
        )
        fixed.append(slice(fixed_slice.start, fixed_slice.start + max_len))
        moving.append(slice(moving_slice.start, moving_slice.start + max_len))
    return tuple(fixed), tuple(moving)


def find_contributing_fovs(chunk, fov_shifts, fov_extent) -> list[str]:
    return [
        name for name, shift in fov_shifts.items() if check_overlap(chunk, shift, fov_extent)
    ]


def get_output_shape(shifts: dict, tile_shape) -> tuple[int, int, int]:
    """Mosaic ZYX shape: max shift + tile extent per axis."""
    arr = np.asarray(list(shifts.values()))
    return (
        int(arr[:, 0].max()) + tile_shape[-3],
        int(arr[:, 1].max()) + tile_shape[-2],
        int(arr[:, 2].max()) + tile_shape[-1],
    )


def fov_edge_distance(fov_extent) -> np.ndarray:
    """Distance-from-XY-edge map shared by every FOV (all share one shape)."""
    fov_extent = np.asarray(fov_extent)
    mask_2d = np.zeros(tuple(fov_extent[1:]), dtype=bool)
    mask_2d[1:-1, 1:-1] = True
    distance_2d = scipy.ndimage.distance_transform_edt(mask_2d)
    return np.broadcast_to(
        distance_2d[None], (int(fov_extent[0]),) + distance_2d.shape
    )


def write_output_chunk(
    output_chunk_slices,
    fov_shifts: dict,
    channel_idx,
    input_plate,
    input_fov_shape,
    output_position,
    verbose: bool,
    blending_exponent: float = 1.0,
    centered_distance: np.ndarray | None = None,
    distance_pad: tuple[int, int, int] | None = None,
) -> None:
    """Blend all contributing FOVs into one output chunk and write it.

    ``distance_pad``: when set, ``centered_distance`` is already a
    :func:`biahub_tpu.kernels.stitch_blend.pad_distance_map` result padded
    by this (nominal chunk) extent — the verb hoists the pad out of the
    per-chunk loop."""
    contributing = find_contributing_fovs(
        output_chunk_slices, fov_shifts, input_fov_shape[-3:]
    )
    chunk_corner = np.array([s.start for s in output_chunk_slices])
    chunk_extent = np.array([s.stop - s.start for s in output_chunk_slices])
    fov_extent = np.array(input_fov_shape[-3:])

    output_array = output_position["0"]
    T = output_array.shape[0]
    n_channels = len(channel_idx)
    chunk_shape = (T, n_channels) + tuple(chunk_extent)
    output_chunk = np.zeros(chunk_shape, dtype=np.float32)

    fixed_slices, moving_slices, kept = [], [], []
    for name in contributing:
        fov_corner = np.asarray(fov_shifts[name], dtype=np.float64)
        fixed, moving = overlap_slices(chunk_corner, chunk_extent, fov_corner, fov_extent)
        if fixed is None:
            continue
        fixed_slices.append(fixed)
        moving_slices.append(moving)
        kept.append(name)

    # Launch every contributing (FOV, channel) read up front so tensorstore
    # overlaps them with each other and with the weight-map computation —
    # chunk assembly is read-latency-bound, not compute-bound.
    reads = []
    for i, (name, fixed, moving) in enumerate(zip(kept, fixed_slices, moving_slices)):
        arr = input_plate[name]["0"]
        for ci, c in enumerate(channel_idx):
            future = arr.read_async((slice(None), int(c), *moving))
            reads.append((i, ci, name, fixed, future))

    if centered_distance is None:
        centered_distance = fov_edge_distance(fov_extent)

    if kept and os.environ.get("BIAHUB_TPU_HOST_BLEND") != "1":
        # Device blend (kernels/stitch_blend.py): the per-FOV weight map is
        # a dynamic_slice window of the shared zero-padded distance map, and
        # the power/normalize/accumulate chain runs as ONE XLA program —
        # the host only pads the ragged tensorstore reads into the dense
        # stack (a memcpy).
        from biahub_tpu.kernels.stitch_blend import blend_chunk, pad_distance_map

        if distance_pad is None:
            padded = pad_distance_map(centered_distance, tuple(chunk_extent))
            pad = tuple(int(c) for c in chunk_extent)
        else:
            padded = centered_distance
            pad = tuple(int(c) for c in distance_pad)
        offsets = np.array(
            [
                [m.start - f.start for m, f in zip(moving, fixed)]
                for fixed, moving in zip(fixed_slices, moving_slices)
            ],
            dtype=np.int64,
        )
        data_stack = np.zeros(
            (len(kept), T, n_channels) + tuple(chunk_extent), np.float32
        )
        for i, ci, name, fixed, future in reads:
            if verbose:
                click.echo(f"\t\tStacking {name}")
            data_stack[(i, slice(None), ci, *fixed)] = np.asarray(
                future.result(), dtype=np.float32
            )
        output_chunk = blend_chunk(
            padded, offsets, data_stack, blending_exponent, pad_extent=pad
        )
    else:
        distance_maps = np.zeros(
            (len(kept),) + tuple(chunk_extent), dtype=np.float32
        )
        for i, (fixed, moving) in enumerate(zip(fixed_slices, moving_slices)):
            distance_maps[(i, *fixed)] = centered_distance[moving]

        # note: np.power(..., where=...) without out= leaves masked entries
        # uninitialized; allocate zeros explicitly.
        w = np.zeros_like(distance_maps)
        np.power(distance_maps, blending_exponent, out=w, where=(distance_maps > 0))
        weight_maps = w / (np.sum(w, axis=0, keepdims=True) + 1e-8)

        for i, ci, name, fixed, future in reads:
            if verbose:
                click.echo(f"\t\tApplying weight maps to {name}")
            data = np.asarray(future.result(), dtype=np.float32)
            output_chunk[(slice(None), ci, *fixed)] += data * weight_maps[(i, *fixed)]

    if verbose:
        click.echo(f"\t\tWriting chunk to output array: {output_chunk_slices}")
    output_array[(slice(None), slice(None), *output_chunk_slices)] = output_chunk.astype(
        output_array.dtype
    )


@click.command("stitch")
@input_position_dirpaths()
@config_filepath()
@output_dirpath()
@sbatch_filepath()
@local()
@click.option(
    "--verbose",
    "-v",
    is_flag=True,
    type=bool,
    help="Verbose stitching output. Default is False.",
)
@click.option(
    "--blending-exponent",
    "-b",
    type=float,
    default=1.0,
    help=(
        "Exponent for blending weights. 0.0 is average blending, 1.0 is linear "
        "blending, and >1.0 is progressively sharper S-curve blending."
    ),
)
@click.option("--debug", is_flag=True, help="Run in debug mode")
@monitor()
def stitch_cli(
    input_position_dirpaths: list[Path],
    output_dirpath: Path,
    config_filepath: Path,
    verbose: bool = False,
    sbatch_filepath: str | None = None,
    local: bool = False,
    blending_exponent: float = 1.0,
    debug: bool = False,
    monitor: bool = False,
) -> None:
    """Stitch FOVs in each well together into a single FOV.

    Uses shifts from a configuration file generated with `biahub estimate-stitch`.

    >>> biahub stitch -i ./input.zarr/*/*/* -c ./config.yaml -o ./output.zarr
    """
    click.echo("Starting stitching...")
    settings = yaml_to_model(config_filepath, StitchSettings)
    input_plate_path = Path(input_position_dirpaths[0]).parents[2]
    input_plate = open_ome_zarr(input_plate_path, mode="r")
    all_shifts = settings.total_translation

    input_channels = input_plate.channel_names
    if settings.channels is None:
        settings.channels = input_channels
    if not all(ch in input_channels for ch in settings.channels):
        raise ValueError("Invalid channel(s) provided.")
    channel_idx = np.asarray([input_channels.index(ch) for ch in settings.channels])

    version = settings.output_ome_zarr_version or get_ome_zarr_version(input_plate_path)
    output_plate = open_ome_zarr(
        output_dirpath,
        layout="hcs",
        mode="w",
        channel_names=settings.channels,
        version=version,
    )

    shifts_by_well: dict[str, dict] = defaultdict(dict)
    for key, value in all_shifts.items():
        well_name = "/".join(key.split("/")[:2])
        shifts_by_well[well_name][key] = value

    resolve_cluster(None, local)

    for well_name, fov_shifts in shifts_by_well.items():
        if verbose:
            click.echo(f"Processing well {well_name}")
        first_fov_name = next(iter(fov_shifts))
        input_fov_shape = input_plate[first_fov_name].data.shape
        output_shape_zyx = get_output_shape(fov_shifts, input_fov_shape)
        input_chunks = input_plate[first_fov_name].data.chunks
        output_chunk_zyx = (output_shape_zyx[0], input_chunks[-2], input_chunks[-1])
        output_scale = input_plate[first_fov_name].scale

        output_position = output_plate.create_position(
            first_fov_name.split("/")[0], first_fov_name.split("/")[1], "0"
        )
        output_position.create_zeros(
            "0",
            shape=(input_fov_shape[0], len(channel_idx)) + output_shape_zyx,
            chunks=(1, 1, min(10, output_shape_zyx[0]), output_chunk_zyx[-2], output_chunk_zyx[-1]),
            dtype=np.float16,
            transform=[TransformationMeta(type="scale", scale=output_scale)],
        )

        estimate_resources(shape=input_fov_shape, ram_multiplier=25, max_num_cpus=16)

        # Owner-computes: every chunk writes a disjoint output region, so the
        # reference's one-Slurm-job-per-chunk fan-out (biahub/stitch.py:482-489)
        # becomes a thread pool — chunk work is zarr-I/O bound and tensorstore
        # releases the GIL.
        chunks = list(
            list_of_nd_slices_from_array_shape(output_shape_zyx, output_chunk_zyx)
        )
        n_workers = int(os.environ.get("BIAHUB_TPU_STITCH_WORKERS", "8"))
        centered_distance = fov_edge_distance(input_fov_shape[-3:])
        distance_pad = None
        if os.environ.get("BIAHUB_TPU_HOST_BLEND") != "1":
            # Hoist the device blend's padded distance map (and its
            # host->device transfer) out of the per-chunk loop; ragged edge
            # chunks reuse it (kernels/stitch_blend.py).
            import jax

            from biahub_tpu.kernels.stitch_blend import pad_distance_map

            distance_pad = tuple(int(c) for c in output_chunk_zyx)
            centered_distance = jax.device_put(
                pad_distance_map(centered_distance, distance_pad)
            )
        with ThreadPoolExecutor(max_workers=max(1, n_workers)) as pool:
            futures = [
                pool.submit(
                    write_output_chunk,
                    chunk,
                    fov_shifts,
                    channel_idx,
                    input_plate,
                    input_fov_shape,
                    output_position,
                    verbose,
                    blending_exponent,
                    centered_distance,
                    distance_pad,
                )
                for chunk in chunks
            ]
            # Block like the reference parent does on its chunk jobs
            # (reference: biahub/cli/slurm.py:6-25), then surface errors.
            wait_for_jobs_to_finish(futures, poll_seconds=0.2)
            for f in futures:
                f.result()
        click.echo(f"Stitched well {well_name} -> {output_shape_zyx}")


if __name__ == "__main__":
    stitch_cli()

"""``biahub deskew``: oblique-plane light-sheet deskew across a plate.

Verb layering follows the reference template (reference:
biahub/deskew.py:648-819): config parse → idempotent output plate init →
resource echo → per-unit compute. The per-position Slurm fan-out is replaced
by the on-device batch runner; the hot loop is the fused gather/lerp kernel
in :mod:`biahub_tpu.kernels.deskew`.
"""

from __future__ import annotations

import warnings
from functools import partial
from pathlib import Path

import click
import numpy as np

from biahub_tpu.cli.parsing import (
    cluster,
    config_filepath,
    init_only,
    input_position_dirpaths,
    monitor,
    output_dirpath,
    resume,
    sbatch_filepath,
    num_processes,
)
from biahub_tpu.cli.utils import (
    PROVENANCE_METADATA_KEYS,
    get_output_paths,
    yaml_to_model,
)
from biahub_tpu.io.progress import ProgressStore
from biahub_tpu.io.ngff import create_empty_plate, open_ome_zarr
from biahub_tpu.kernels.deskew import deskew_zyx, get_deskewed_data_shape
from biahub_tpu.runtime import (
    BatchRunner,
    echo_resources,
    estimate_resources,
    resolve_cluster,
    sbatch_to_overrides,
    settings_fingerprint,
)
from biahub_tpu.settings import DeskewSettings

__all__ = ["deskew", "deskew_cli"]


def _warn_pixel_size_mismatch(settings: DeskewSettings, reference_position_path) -> None:
    """Warn when the config pixel size disagrees >5% with the zarr XY scale."""
    ds = open_ome_zarr(str(reference_position_path), mode="r")
    zarr_pixel_size = float(ds.scale[-1])
    if zarr_pixel_size > 0 and not np.isclose(
        settings.pixel_size_um, zarr_pixel_size, rtol=0.05
    ):
        warnings.warn(
            f"Config pixel_size_um={settings.pixel_size_um} differs from the input "
            f"zarr metadata XY scale ({zarr_pixel_size:.4f}).",
            stacklevel=2,
        )


def _init_output_plate(
    input_position_dirpaths: list[Path],
    output_dirpath: Path,
    settings: DeskewSettings,
) -> tuple[tuple[int, int, int, int, int], list[str]]:
    """Create (or extend) the deskewed output plate; returns input shape/channels."""
    input_dataset = open_ome_zarr(str(input_position_dirpaths[0]), mode="r")
    channel_names = input_dataset.channel_names
    T, C, Z, Y, X = input_dataset.data.shape

    deskewed_shape, voxel_size = get_deskewed_data_shape(
        (Z, Y, X),
        settings.ls_angle_deg,
        settings.px_to_scan_ratio,
        settings.keep_overhang,
        settings.average_n_slices,
        settings.pixel_size_um,
    )

    input_plate = Path(input_position_dirpaths[0]).parents[2]
    version = settings.output_ome_zarr_version
    if version is None:
        from biahub_tpu.io.ngff import get_ome_zarr_version

        version = get_ome_zarr_version(input_plate)
    create_empty_plate(
        store_path=output_dirpath,
        position_keys=[Path(p).parts[-3:] for p in input_position_dirpaths],
        channel_names=channel_names,
        shape=(T, C) + deskewed_shape,
        scale=(1, 1) + voxel_size,
        version=version,
        metadata_sources=input_plate,
        metadata_keys=PROVENANCE_METADATA_KEYS,
    )
    return (T, C, Z, Y, X), channel_names


def _fill_overhang_chunked(out_pos, t: int, c: int, overhang_fill, y_chunk: int):
    """Whole-volume overhang fill applied in output-Y slabs with a halo.

    The dilation reaches 3 voxels, so a 4-voxel halo makes each slab's mask
    identical to the whole-volume mask; the mean-fill statistics are
    accumulated globally in a first sweep.
    """
    import jax.numpy as jnp

    from biahub_tpu.kernels.deskew import overhang_mask

    halo = 4
    arr = out_pos["0"]
    Y = arr.shape[-2]

    if overhang_fill == "mean":
        total, count = 0.0, 0
        for y0 in range(0, Y, y_chunk):
            y1 = min(y0 + y_chunk, Y)
            lo, hi = max(0, y0 - halo), min(Y, y1 + halo)
            slab = np.asarray(arr[t, c, :, lo:hi, :], dtype=np.float32)
            mask = np.asarray(overhang_mask(jnp.asarray(slab)))
            center = slice(y0 - lo, y0 - lo + (y1 - y0))
            valid = ~mask[:, center, :]
            total += float(slab[:, center, :][valid].sum())
            count += int(valid.sum())
        fill = total / max(count, 1)
    else:
        fill = float(overhang_fill)

    for y0 in range(0, Y, y_chunk):
        y1 = min(y0 + y_chunk, Y)
        lo, hi = max(0, y0 - halo), min(Y, y1 + halo)
        slab = np.asarray(arr[t, c, :, lo:hi, :], dtype=np.float32)
        mask = np.asarray(overhang_mask(jnp.asarray(slab)))
        center = slice(y0 - lo, y0 - lo + (y1 - y0))
        filled = np.where(mask[:, center, :], np.float32(fill), slab[:, center, :])
        arr[t, c, :, y0:y1, :] = filled


def deskew(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = True,
    init_only: bool = False,
    resume: bool = False,
):
    """Deskew a light-sheet dataset, batching (t, c) volumes on device."""
    output_dirpath = Path(output_dirpath)

    settings = yaml_to_model(config_filepath, DeskewSettings)
    _warn_pixel_size_mismatch(settings, input_position_dirpaths[0])
    input_shape, _ = _init_output_plate(input_position_dirpaths, output_dirpath, settings)

    # Same contract as the reference --init path; the numbers now size host
    # staging buffers rather than Slurm requests.
    time_minutes, num_cpus, gb_ram_per_cpu = estimate_resources(
        shape=input_shape, ram_multiplier=8, time_multiplier=0.5, max_num_cpus=16
    )
    echo_resources(num_cpus, num_cpus * gb_ram_per_cpu, time_minutes)

    if init_only:
        click.echo(
            f"Initialized {output_dirpath} ({len(input_position_dirpaths)} positions)"
        )
        return

    if sbatch_filepath:
        click.echo(f"Resource overrides (compatibility): {sbatch_to_overrides(sbatch_filepath)}")

    resolved = resolve_cluster(cluster=cluster)
    click.echo(f"Running on-device batches (mode='{resolved}')")

    # The coverslip-axis flip is a pure index reversal: as device work it
    # costs ~1 ms/volume (XLA sublane rev), as a host numpy view on the
    # fetched result it is free — the executor's post_fetch applies it just
    # before the zarr write.
    kernel = partial(
        deskew_zyx,
        ls_angle_deg=settings.ls_angle_deg,
        px_to_scan_ratio=settings.px_to_scan_ratio,
        keep_overhang=settings.keep_overhang,
        average_window=settings.average_n_slices,
        overhang_fill=settings.overhang_fill,
        skip_flip=True,
    )
    # Single-device batches ride the manually double-buffered zyx Pallas
    # kernel (DMA/MXU overlap vmap cannot express; kernels/deskew.py
    # deskew_zyx_batched falls back to vmap off that route).
    from biahub_tpu.kernels.deskew import deskew_zyx_batched

    kernel.batched_impl = partial(
        deskew_zyx_batched,
        ls_angle_deg=settings.ls_angle_deg,
        px_to_scan_ratio=settings.px_to_scan_ratio,
        keep_overhang=settings.keep_overhang,
        average_window=settings.average_n_slices,
        overhang_fill=settings.overhang_fill,
        skip_flip=True,
    )

    output_position_paths = get_output_paths(input_position_dirpaths, output_dirpath)
    input_positions = [open_ome_zarr(p, mode="r") for p in input_position_dirpaths]
    output_positions = [open_ome_zarr(p, mode="r+") for p in output_position_paths]
    for out_pos in output_positions:
        out_pos.update_zattrs({"biahub-deskew": settings.model_dump()})

    runner = BatchRunner(cluster=resolved)
    Z, Y, X = input_shape[-3:]
    out_zyx, _ = get_deskewed_data_shape(
        (Z, Y, X),
        settings.ls_angle_deg,
        settings.px_to_scan_ratio,
        settings.keep_overhang,
        settings.average_n_slices,
    )
    volume_bytes = 4 * (int(np.prod((Z, Y, X))) + int(np.prod(out_zyx)))
    if volume_bytes > runner.max_batch_bytes:
        # A single volume (input + output) exceeds the HBM budget: process
        # each (t, c) volume in input-X slabs (= output-Y slabs; the scan
        # resample involves only the scan and tilt axes, so the split is
        # exact). Mirrors the reference's GPU-memory X-split
        # (reference: biahub/deskew.py:554-582).
        n_splits = -(-volume_bytes // runner.max_batch_bytes)
        x_chunk = max(1, -(-X // int(n_splits)))
        click.echo(
            f"Volume exceeds the device batch budget; deskewing in "
            f"{n_splits} X-slabs of {x_chunk}"
        )
        # Slab pass runs WITHOUT overhang fill: the fill mask/mean are
        # whole-volume quantities, applied by a second chunked pass below.
        slab_kernel = partial(
            deskew_zyx,
            ls_angle_deg=settings.ls_angle_deg,
            px_to_scan_ratio=settings.px_to_scan_ratio,
            keep_overhang=settings.keep_overhang,
            average_window=settings.average_n_slices,
            overhang_fill=0,
        )
        needs_fill = settings.keep_overhang and settings.overhang_fill != 0
        token = settings_fingerprint(settings)
        # Multi-host: the over-HBM fallback honors the same per-(pos, t, c)
        # ownership contract as the executor (see runtime.executor).
        from biahub_tpu.runtime.executor import stripe_units

        slab_units = [
            (p_idx, t, c)
            for p_idx, in_pos in enumerate(input_positions)
            for t in range(in_pos.data.shape[0])
            for c in range(in_pos.data.shape[1])
        ]
        progress_stores: dict[int, ProgressStore] = {}
        n = 0
        for p_idx, t, c in stripe_units(slab_units):
            in_pos = input_positions[p_idx]
            out_pos = output_positions[p_idx]
            if resume and p_idx not in progress_stores:
                progress_stores[p_idx] = ProgressStore(out_pos.path, token)
            progress = progress_stores.get(p_idx)
            if progress is not None and progress.is_done(t, c):
                n += 1
                continue
            for x0 in range(0, X, x_chunk):
                x1 = min(x0 + x_chunk, X)
                slab = np.asarray(in_pos.data[t, c, :, :, x0:x1], dtype=np.float32)
                out_slab = np.asarray(slab_kernel(slab))
                # Input X is flipped into output Y (bit-exact split;
                # see tests/test_cli/test_deskew_cli.py)
                out_pos["0"][t, c, :, X - x1 : X - x0, :] = out_slab
            if needs_fill:
                _fill_overhang_chunked(out_pos, t, c, settings.overhang_fill, x_chunk)
            if progress is not None:
                progress.mark_done(t, c)
            n += 1
        click.echo(f"Deskewed {n} (t, c) volumes across {len(input_positions)} positions")
        for path in input_position_dirpaths:
            click.echo(f"Deskew complete: {path}")
        return

    n = runner.run_zyx(
        kernel,
        input_positions,
        output_positions,
        resume=resume,
        resume_token=settings_fingerprint(settings),
        monitor=monitor and resolved != "debug",
        post_fetch=lambda a: a[:, ::-1],  # the skipped coverslip flip
    )
    click.echo(f"Deskewed {n} (t, c) volumes across {len(input_positions)} positions")
    for path in input_position_dirpaths:
        click.echo(f"Deskew complete: {path}")


@click.command("deskew")
@input_position_dirpaths()
@config_filepath()
@output_dirpath()
@sbatch_filepath()
@cluster()
@monitor()
@init_only()
@resume()
@num_processes()
def deskew_cli(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = False,
    init_only: bool = False,
    resume: bool = False,
    num_processes: int = 1,
):
    """Deskew oblique plane light-sheet dataset. Deskew parameters can be estimated with estimate-deskew.

    \b
    Batch a whole plate's positions on device:
    >>> biahub deskew -i ./input.zarr/*/*/* -c ./deskew_params.yml -o ./output.zarr

    \b
    Initialize the output plate only:
    >>> biahub deskew --init -i ./input.zarr/*/*/* -c ./deskew_params.yml -o ./output.zarr

    \b
    In-process run of a single position:
    >>> biahub deskew --cluster debug -i ./input.zarr/A/1/0 -c ./deskew_params.yml -o ./output.zarr
    """  # noqa: D301
    deskew(
        input_position_dirpaths=input_position_dirpaths,
        config_filepath=config_filepath,
        output_dirpath=output_dirpath,
        sbatch_filepath=sbatch_filepath,
        cluster=cluster,
        monitor=monitor,
        init_only=init_only,
        resume=resume,
    )


if __name__ == "__main__":
    deskew_cli()


# Reference-name compatibility: the reference exposes the optimized path as
# ``fast_deskew_zyx`` (reference: biahub/deskew.py:459-545); here the one
# deskew entrypoint already dispatches to the fused Pallas kernel on TPU.
fast_deskew_zyx = deskew_zyx

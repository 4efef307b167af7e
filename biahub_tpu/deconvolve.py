"""``biahub deconvolve``: PSF-based Wiener/Tikhonov deconvolution of a plate.

CLI surface mirrors the reference (reference: biahub/deconvolve.py:73-206):
``-i`` positions, ``-p`` psf.zarr, ``-c`` config, ``-o`` output; a
transfer_function.zarr is written next to the output store. Compute is
batched 3D rFFTs on device instead of per-position Slurm jobs.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import click
import numpy as np

from biahub_tpu.cli.parsing import (
    config_filepath,
    input_position_dirpaths,
    local,
    monitor,
    output_dirpath,
    sbatch_filepath,
    _str_to_path,
)
from biahub_tpu.cli.utils import get_output_paths, yaml_to_model
from biahub_tpu.io.ngff import (
    TransformationMeta,
    create_empty_plate,
    get_ome_zarr_version,
    open_ome_zarr,
)
from biahub_tpu.kernels.deconvolve import compute_transfer_function, deconvolve_zyx
from biahub_tpu.runtime import (
    BatchRunner,
    echo_resources,
    estimate_resources,
    resolve_cluster,
)
from biahub_tpu.settings import DeconvolveSettings

__all__ = ["deconvolve", "deconvolve_cli", "compute_transfer_function"]


def deconvolve(
    input_position_dirpaths: list[Path],
    psf_dirpath: Path,
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    local: bool = False,
    monitor: bool = True,
):
    output_dirpath = Path(output_dirpath)
    transfer_function_store_path = output_dirpath.parent / "transfer_function.zarr"
    output_position_paths = get_output_paths(input_position_dirpaths, output_dirpath)

    settings = yaml_to_model(config_filepath, DeconvolveSettings)

    input_dataset = open_ome_zarr(str(input_position_dirpaths[0]), mode="r")
    channel_names = input_dataset.channel_names
    shape = input_dataset.data.shape
    scale = input_dataset.scale
    T, C, Z, Y, X = shape

    click.echo("Creating empty output zarr...")
    version = settings.output_ome_zarr_version or get_ome_zarr_version(
        Path(input_position_dirpaths[0]).parents[2]
    )
    create_empty_plate(
        store_path=output_dirpath,
        position_keys=[Path(p).parts[-3:] for p in input_position_dirpaths],
        channel_names=channel_names,
        shape=shape,
        scale=scale,
        version=version,
    )

    click.echo("Computing transfer function...")
    psf_dataset = open_ome_zarr(Path(psf_dirpath, "0/0/0"), mode="r")
    if list(scale[-3:]) != list(psf_dataset.scale[-3:]):
        click.echo(
            f"Warning: PSF scale: {psf_dataset.scale[-3:]} does not match data "
            f"scale: {scale[-3:]}. Consider resampling the PSF."
        )
    psf_data = psf_dataset.data[0, 0]

    transfer_function = compute_transfer_function(psf_data, output_zyx_shape=shape[-3:])
    tf_store = open_ome_zarr(
        transfer_function_store_path, layout="fov", mode="w", channel_names=["PSF"]
    )
    tf_store.create_image(
        "0",
        transfer_function[None, None],
        chunks=(1, 1, min(Z, 256)) + tuple(shape[-2:]),
        transform=[TransformationMeta(type="scale", scale=psf_dataset.scale)],
    )

    _, num_cpus, gb_ram_per_cpu = estimate_resources(
        shape=(T, C, Z, Y, X), ram_multiplier=16, max_num_cpus=16
    )
    echo_resources(num_cpus, num_cpus * gb_ram_per_cpu, 60)

    resolved = resolve_cluster(None, local)
    click.echo(f"Running on-device batches (mode='{resolved}')")

    # Device kernel runs on the rfft half-spectrum of the (real) TF. The
    # filter arrangement for the fused engine (Tikhonov transform, radix
    # permutes, ky-major blocks) is hoisted out of the per-batch hot loop.
    tf_half = transfer_function[..., : X // 2 + 1]
    prepared = None
    from biahub_tpu.kernels.pallas_fft import (
        deconvolve_pallas_supported,
        prepare_fourier_filter,
    )

    if deconvolve_pallas_supported((Z, Y, X)):
        prepared = prepare_fourier_filter(
            (Z, Y, X), (tf_half,), float(settings.regularization_strength)
        )
    # The TF + prepared filter thread through the runner as broadcast
    # ARGUMENTS (device-put once, traced) — closure would embed them as
    # HLO constants (runtime/executor.py::_put_broadcast).
    kernel = partial(
        deconvolve_zyx,
        regularization_strength=float(settings.regularization_strength),
    )
    # Camera-dtype plates skip the device-side f32 cast: the fused engine's
    # pass A converts uint16 in VMEM (kernels/pallas_fft.py), and
    # deconvolve_zyx casts itself on the routes that need f32.
    kernel.native_ingest_dtypes = ("uint16",)
    broadcast = {"transfer_function_half": tf_half, "prepared": prepared}

    input_positions = [open_ome_zarr(p, mode="r") for p in input_position_dirpaths]
    output_positions = [open_ome_zarr(p, mode="r+") for p in output_position_paths]
    for out_pos in output_positions:
        out_pos.update_zattrs({"biahub-deconvolve": settings.model_dump()})

    runner = BatchRunner(cluster=resolved)

    # Spatial parallelism opt-in: with several local chips and a volume too
    # big to batch, BIAHUB_TPU_SHARDED_FFT=1 deconvolves EACH volume sharded
    # across all local devices via the distributed-transpose FFT
    # (parallel/sharded_fft.py) instead of one-volume-per-chip batching.
    import os

    import jax

    from biahub_tpu.parallel.sharded_fft import (
        deconvolve_zyx_sharded,
        sharded_fft_supported,
    )

    n_local = jax.local_device_count()
    if (
        os.environ.get("BIAHUB_TPU_SHARDED_FFT") == "1"
        and n_local > 1
        and sharded_fft_supported((Z, Y, X), n_local)
    ):
        import numpy as np
        from jax.sharding import Mesh

        from biahub_tpu.runtime.executor import stripe_units

        mesh = Mesh(np.asarray(jax.local_devices()), ("space",))
        click.echo(
            f"BIAHUB_TPU_SHARDED_FFT: each volume sharded over {n_local} "
            "local devices (per-volume spatial parallelism; the batch "
            "executor's job table is not available on this path)"
        )
        tf_d = jax.device_put(tf_half)
        units = stripe_units([
            (p_idx, t, c)
            for p_idx in range(len(input_positions))
            for t in range(T)
            for c in range(C)
        ])
        reg_strength = float(settings.regularization_strength)

        def start_read(u):
            p_idx, t, c = u
            return input_positions[p_idx].data.read_async((t, c))

        # Prefetch the next volume while the mesh computes the current one,
        # and let tensorstore writes complete asynchronously — mirrors the
        # batch executor's read-ahead/write-behind overlap.
        n = 0
        write_futures = []
        pending = start_read(units[0]) if units else None
        for i, (p_idx, t, c) in enumerate(units):
            vol = np.asarray(pending.result(), np.float32)
            pending = start_read(units[i + 1]) if i + 1 < len(units) else None
            out = deconvolve_zyx_sharded(
                jax.numpy.asarray(vol), tf_d, mesh,
                regularization_strength=reg_strength,
            )
            write_futures.append(
                output_positions[p_idx]["0"].write_async((t, c), np.asarray(out))
            )
            n += 1
            click.echo(f"  sharded deconvolve {n}/{len(units)}", err=True)
        for f in write_futures:
            f.result()
    else:
        n = runner.run_zyx(
            kernel,
            input_positions,
            output_positions,
            monitor=monitor and resolved != "debug",
            broadcast_params=broadcast,
        )
    click.echo(f"Deconvolved {n} (t, c) volumes across {len(input_positions)} positions")


@click.command("deconvolve")
@input_position_dirpaths()
@click.option(
    "--psf-dirpath",
    "-p",
    required=True,
    type=click.Path(exists=True, file_okay=False, dir_okay=True),
    callback=_str_to_path,
    help="Path to psf.zarr",
)
@config_filepath()
@output_dirpath()
@sbatch_filepath()
@local()
@monitor()
def deconvolve_cli(
    input_position_dirpaths: list[Path],
    psf_dirpath: Path,
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    local: bool = False,
    monitor: bool = True,
):
    """Deconvolve across T and C axes using a PSF and a configuration file.

    >>> biahub deconvolve \\
        -i ./input.zarr/*/*/* \\
        -p ./psf.zarr \\
        -c ./deconvolve_params.yml \\
        -o ./output.zarr
    """
    deconvolve(
        input_position_dirpaths=input_position_dirpaths,
        psf_dirpath=psf_dirpath,
        config_filepath=config_filepath,
        output_dirpath=output_dirpath,
        sbatch_filepath=sbatch_filepath,
        local=local,
        monitor=monitor,
    )


if __name__ == "__main__":
    deconvolve_cli()


# Reference-name compatibility (reference: biahub/deconvolve.py:34): the
# reference's typo spelling of the transfer-function builder.
from biahub_tpu.kernels.deconvolve import (  # noqa: E402,F401
    compute_tranfser_function,
)

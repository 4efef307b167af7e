"""``biahub apply-inv-tf``: apply inverse transfer functions to a dataset.

Mirrors the reference verb structure (reference:
biahub/apply_inverse_transfer_function.py:35-266) with the waveorder worker
replaced by the JAX reconstruction kernels: birefringence Stokes inversion,
weak-object phase Tikhonov inversion, and fluorescence OTF deconvolution run
as one fused device program per (position, timepoint).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import click
import jax.numpy as jnp
import numpy as np

from biahub_tpu.cli.parsing import (
    cluster,
    config_filepath,
    init_only,
    input_position_dirpaths,
    monitor,
    output_dirpath,
    sbatch_filepath,
)
from biahub_tpu.cli.utils import PROVENANCE_METADATA_KEYS, get_output_paths, yaml_to_model
from biahub_tpu.io.ngff import create_empty_plate, get_ome_zarr_version, open_ome_zarr
from biahub_tpu.recon.settings import ReconstructionSettings
from biahub_tpu.runtime import (
    BatchRunner,
    echo_resources,
    estimate_resources,
    resolve_cluster,
    settings_fingerprint,
)
from biahub_tpu.runtime.executor import WorkUnit

__all__ = ["apply_inverse_transfer_function", "apply_inverse_transfer_function_cli"]


def _load_transfer_functions(transfer_function_dirpath: Path) -> dict[str, np.ndarray]:
    tf_pos = open_ome_zarr(Path(transfer_function_dirpath) / "0/0/0", mode="r")
    names = tf_pos.channel_names
    data = tf_pos.data[0]
    out: dict[str, np.ndarray] = {}
    if "phase_tf_real" in names:
        out["phase"] = (
            data[names.index("phase_tf_real")] + 1j * data[names.index("phase_tf_imag")]
        )
    if "fluor_otf_real" in names:
        out["fluorescence"] = (
            data[names.index("fluor_otf_real")] + 1j * data[names.index("fluor_otf_imag")]
        )
    return out


def _make_recon_kernel(settings: ReconstructionSettings, tfs: dict[str, np.ndarray]):
    """Fused jittable CZYX kernel: input channels → reconstructed channels."""
    from biahub_tpu.recon.birefringence import (
        birefringence_from_stokes,
        stokes_from_intensities,
    )
    from biahub_tpu.recon.optics import tikhonov_inverse_3d

    phase_tf = jnp.asarray(tfs["phase"]) if "phase" in tfs else None
    fluor_tf = jnp.asarray(tfs["fluorescence"]) if "fluorescence" in tfs else None

    def kernel(czyx):
        czyx = czyx.astype(jnp.float32)
        outputs = []
        if settings.birefringence is not None:
            stokes = stokes_from_intensities(
                czyx, settings.birefringence.transfer_function.swing
            )
            biref = birefringence_from_stokes(
                stokes,
                wavelength_illumination=(
                    settings.birefringence.apply_inverse.wavelength_illumination
                ),
                flip_orientation=settings.birefringence.apply_inverse.flip_orientation,
                rotate_orientation=settings.birefringence.apply_inverse.rotate_orientation,
            )
            outputs.append(biref)
        if settings.phase is not None:
            bf = czyx[0]
            mean = jnp.mean(bf) + 1e-12
            i_norm = bf / mean - 1.0
            phase = tikhonov_inverse_3d(
                i_norm,
                phase_tf,
                settings.phase.apply_inverse.regularization_strength,
                # The WOTF is the FFT of a real defocus kernel, so the TPU
                # path may run on the rfft half-spectrum (Pallas engine).
                assume_hermitian=True,
            )
            outputs.append(phase[None])
        if settings.fluorescence is not None:
            reg = settings.fluorescence.apply_inverse.regularization_strength
            decon = jnp.stack(
                [
                    tikhonov_inverse_3d(czyx[c], fluor_tf, reg, assume_hermitian=True)
                    for c in range(czyx.shape[0])
                ]
            )
            outputs.append(decon)
        return jnp.concatenate(outputs, axis=0)

    return kernel


def apply_inverse_transfer_function(
    input_position_dirpaths: list[Path],
    transfer_function_dirpath: Path,
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = True,
    init_only: bool = False,
) -> None:
    """Apply an inverse transfer function to a dataset."""
    output_dirpath = Path(output_dirpath)
    settings = yaml_to_model(config_filepath, ReconstructionSettings)

    input_dataset = open_ome_zarr(str(input_position_dirpaths[0]), mode="r")
    input_shape = input_dataset.data.shape
    T, C, Z, Y, X = input_shape
    all_channel_names = input_dataset.channel_names
    scale = input_dataset.scale
    output_channels = settings.output_channel_names()

    if settings.time_indices == "all":
        time_indices = list(range(T))
    elif isinstance(settings.time_indices, list):
        time_indices = settings.time_indices
    else:
        time_indices = [settings.time_indices]

    input_plate = Path(input_position_dirpaths[0]).parents[2]
    create_empty_plate(
        store_path=output_dirpath,
        position_keys=[Path(p).parts[-3:] for p in input_position_dirpaths],
        channel_names=output_channels,
        shape=(len(time_indices), len(output_channels), Z, Y, X),
        scale=scale,
        dtype=np.float32,
        version=get_ome_zarr_version(input_plate),
        metadata_sources=input_plate,
        metadata_keys=PROVENANCE_METADATA_KEYS,
    )

    # Wall-time model matches the reference's calibration: 0.14-1.51 min/volume
    # observed, provisioned at 3.0 (reference: biahub/apply_inverse_transfer_
    # function.py:117-137).
    time_minutes, num_cpus, gb_ram_per_cpu = estimate_resources(
        shape=input_shape, ram_multiplier=16, time_multiplier=3.0, max_num_cpus=16
    )
    echo_resources(num_cpus, num_cpus * gb_ram_per_cpu, time_minutes)

    if init_only:
        click.echo(
            f"Initialized {output_dirpath} ({len(input_position_dirpaths)} positions)"
        )
        return

    tfs = _load_transfer_functions(transfer_function_dirpath)
    if settings.phase is not None and "phase" not in tfs:
        raise click.ClickException(
            "Config requests phase reconstruction but the transfer function store "
            "has no phase transfer function; re-run compute-tf with this config."
        )
    if settings.fluorescence is not None and "fluorescence" not in tfs:
        raise click.ClickException(
            "Config requests fluorescence deconvolution but the transfer function "
            "store has no fluorescence OTF; re-run compute-tf with this config."
        )

    kernel = _make_recon_kernel(settings, tfs)
    input_channel_indices = tuple(
        all_channel_names.index(name) for name in settings.input_channel_names
    )
    output_channel_indices = tuple(range(len(output_channels)))

    resolved = resolve_cluster(cluster=cluster)
    click.echo(f"Running on-device batches (mode='{resolved}')")

    input_positions = [open_ome_zarr(p, mode="r") for p in input_position_dirpaths]
    output_position_paths = get_output_paths(input_position_dirpaths, output_dirpath)
    output_positions = [open_ome_zarr(p, mode="r+") for p in output_position_paths]
    for out_pos in output_positions:
        out_pos.update_zattrs({"biahub-reconstruct": settings.model_dump()})

    units = [
        WorkUnit(p_idx, int(t), input_channel_indices, output_channel_indices, int(t_out))
        for p_idx in range(len(input_positions))
        for t_out, t in enumerate(time_indices)
    ]
    runner = BatchRunner(cluster=resolved)
    n = runner.run_units(
        kernel,
        units,
        input_positions,
        output_positions,
        resume=False,
        resume_token=settings_fingerprint(settings),
        monitor=monitor and resolved != "debug",
    )
    click.echo(f"Reconstructed {n} timepoints across {len(input_positions)} positions")
    for path in input_position_dirpaths:
        click.echo(f"Reconstruction complete: {path}")


@click.command("apply-inv-tf")
@input_position_dirpaths()
@click.option(
    "--transfer-function-dirpath",
    "-t",
    required=True,
    type=click.Path(exists=True, file_okay=False, dir_okay=True),
    help="Path to the transfer function zarr written by compute-tf",
)
@config_filepath()
@output_dirpath()
@sbatch_filepath()
@cluster()
@monitor()
@init_only()
def apply_inverse_transfer_function_cli(
    input_position_dirpaths: list[Path],
    transfer_function_dirpath: Path,
    config_filepath: Path,
    output_dirpath: Path,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = False,
    init_only: bool = False,
):
    """Apply an inverse transfer function to a dataset.

    >>> biahub apply-inv-tf \\
        -i ./input.zarr/*/*/* \\
        -t ./transfer_function.zarr \\
        -c ./recon_config.yml \\
        -o ./output.zarr
    """
    apply_inverse_transfer_function(
        input_position_dirpaths=input_position_dirpaths,
        transfer_function_dirpath=Path(transfer_function_dirpath),
        config_filepath=config_filepath,
        output_dirpath=output_dirpath,
        sbatch_filepath=sbatch_filepath,
        cluster=cluster,
        monitor=monitor,
        init_only=init_only,
    )


if __name__ == "__main__":
    apply_inverse_transfer_function_cli()

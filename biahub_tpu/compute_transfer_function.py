"""``biahub compute-tf``: compute reconstruction transfer functions.

The reference delegates to waveorder's CLI (reference:
biahub/compute_transfer_function.py:16-34); here the transfer functions are
computed by the JAX optics models in :mod:`biahub_tpu.recon.optics` and
written to a transfer-function zarr store consumed by ``apply-inv-tf``.
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from biahub_tpu.cli.parsing import config_filepath, input_position_dirpaths, output_dirpath
from biahub_tpu.cli.utils import yaml_to_model
from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr
from biahub_tpu.recon.settings import ReconstructionSettings

__all__ = ["compute_transfer_function", "compute_transfer_function_cli"]


def compute_transfer_function(
    input_position_dirpath: Path,
    config_filepath: Path,
    output_dirpath: Path,
) -> None:
    """Compute and store the transfer functions for the configured models."""
    from biahub_tpu.recon.optics import fluorescence_otf_3d, phase_wotf_3d

    settings = yaml_to_model(config_filepath, ReconstructionSettings)
    input_position = open_ome_zarr(input_position_dirpath, mode="r")
    T, C, Z, Y, X = input_position.data.shape
    scale = input_position.scale

    channels: list[str] = []
    arrays: list[np.ndarray] = []

    if settings.phase is not None:
        tf = settings.phase.transfer_function
        H = np.asarray(
            phase_wotf_3d(
                (Z, Y, X),
                yx_pixel_size=tf.yx_pixel_size,
                z_pixel_size=tf.z_pixel_size,
                wavelength_illumination=tf.wavelength_illumination,
                numerical_aperture_illumination=tf.numerical_aperture_illumination,
                numerical_aperture_detection=tf.numerical_aperture_detection,
                index_of_refraction_media=tf.index_of_refraction_media,
                invert_phase_contrast=tf.invert_phase_contrast,
            )
        )
        channels += ["phase_tf_real", "phase_tf_imag"]
        arrays += [H.real.astype(np.float32), H.imag.astype(np.float32)]

    if settings.fluorescence is not None:
        tf = settings.fluorescence.transfer_function
        otf = np.asarray(
            fluorescence_otf_3d(
                (Z, Y, X),
                yx_pixel_size=tf.yx_pixel_size,
                z_pixel_size=tf.z_pixel_size,
                wavelength_emission=tf.wavelength_emission,
                numerical_aperture_detection=tf.numerical_aperture_detection,
                index_of_refraction_media=tf.index_of_refraction_media,
            )
        )
        channels += ["fluor_otf_real", "fluor_otf_imag"]
        arrays += [otf.real.astype(np.float32), otf.imag.astype(np.float32)]

    # Birefringence needs no volumetric transfer function; the instrument
    # matrix is derived from the swing at apply time.
    if not channels:
        channels = ["identity"]
        arrays = [np.ones((Z, Y, X), dtype=np.float32)]

    plate = open_ome_zarr(output_dirpath, layout="hcs", mode="w", channel_names=channels)
    pos = plate.create_position("0", "0", "0")
    pos.create_image(
        "0",
        np.stack(arrays)[None],
        transform=[TransformationMeta(type="scale", scale=scale)],
    )
    pos.update_zattrs({"biahub-compute-tf": settings.model_dump()})


@click.command("compute-tf")
@input_position_dirpaths()
@config_filepath()
@output_dirpath()
def compute_transfer_function_cli(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
) -> None:
    """Compute a transfer function using a dataset and configuration file.

    Calculates the transfer function based on the shape of the first position
    in the list `input-position-dirpaths`.

    >>> biahub compute-tf \\
        -i ./input.zarr/0/0/0 \\
        -c ./examples/birefringence.yml \\
        -o ./transfer_function.zarr
    """
    compute_transfer_function(input_position_dirpaths[0], config_filepath, output_dirpath)
    click.echo(f"Transfer function computed and saved to {output_dirpath}.")


if __name__ == "__main__":
    compute_transfer_function_cli()

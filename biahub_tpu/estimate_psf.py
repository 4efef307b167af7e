"""``biahub estimate-psf``: average bead patches into a PSF volume.

Mirrors the reference (reference: biahub/estimate_psf.py:23-121): detect
beads, extract same-shape patches, peak-normalize, average, background-
subtract, and write psf.zarr. Peak detection runs on device.
"""

from __future__ import annotations

import time
from pathlib import Path

import click
import numpy as np

from biahub_tpu.cli.parsing import config_filepath, input_position_dirpaths, output_dirpath
from biahub_tpu.cli.utils import yaml_to_model
from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr
from biahub_tpu.kernels.peaks import detect_peaks
from biahub_tpu.psf.analysis import extract_beads
from biahub_tpu.settings import PsfFromBeadsSettings

__all__ = ["estimate_psf_cli"]


@click.command("estimate-psf")
@input_position_dirpaths()
@config_filepath()
@output_dirpath()
def estimate_psf_cli(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
):
    """Estimate the point spread function (PSF) from bead images.

    >>> biahub estimate-psf -i ./beads.zarr/*/*/* -c ./psf_params.yml -o ./psf.zarr
    """
    output_dirpath = Path(output_dirpath)

    click.echo("Loading data...")
    pzyx_data = []
    zyx_scale = (1.0, 1.0, 1.0)
    for input_position_dirpath in input_position_dirpaths:
        input_dataset = open_ome_zarr(str(input_position_dirpath), mode="r")
        pzyx_data.append(input_dataset["0"][0, 0])
        zyx_scale = input_dataset.scale[-3:]

    try:
        pzyx_data = np.array(pzyx_data)
    except Exception:
        raise ValueError("Concatenating position arrays failed.") from None

    settings = yaml_to_model(config_filepath, PsfFromBeadsSettings)
    patch_size_px = (
        settings.axis0_patch_size,
        settings.axis1_patch_size,
        settings.axis2_patch_size,
    )

    bead_detection_settings = {
        "block_size": (64, 64, 32),
        "blur_kernel_size": 3,
        "nms_distance": 32,
        "min_distance": 50,
        "threshold_abs": 200.0,
        "max_num_peaks": 2000,
        "exclude_border": (5, 10, 5),
    }

    pbzyx_data = []
    for zyx_data in pzyx_data:
        click.echo("Detecting beads...")
        t1 = time.time()
        peaks = detect_peaks(zyx_data, **bead_detection_settings, verbose=True)
        t2 = time.time()
        click.echo(f"Time to detect peaks: {t2 - t1}")

        beads, _ = extract_beads(
            zyx_data=zyx_data,
            points=peaks,
            scale=zyx_scale,
            patch_size=tuple(a * b for a, b in zip(patch_size_px, zyx_scale)),
        )
        if not beads:
            continue
        filtered = [b for b in beads if b.shape == beads[0].shape]
        pbzyx_data.append(np.stack(filtered))

    if not pbzyx_data:
        raise click.ClickException("No beads detected in any input position.")
    bzyx_data = np.concatenate(pbzyx_data)
    click.echo(f"Total beads: {bzyx_data.shape[0]}")

    normalized = bzyx_data / np.max(bzyx_data, axis=(-3, -2, -1))[:, None, None, None]
    average_psf = np.mean(normalized, axis=0)
    average_psf -= np.min(average_psf)
    average_psf /= np.max(average_psf)

    output_dataset = open_ome_zarr(
        output_dirpath, layout="hcs", mode="w", channel_names=["PSF"]
    )
    pos = output_dataset.create_position("0", "0", "0")
    pos.create_image(
        "0",
        average_psf[None, None].astype(np.float32),
        chunks=(1, 1) + average_psf.shape,
        transform=[TransformationMeta(type="scale", scale=(1, 1) + tuple(zyx_scale))],
    )


if __name__ == "__main__":
    estimate_psf_cli()

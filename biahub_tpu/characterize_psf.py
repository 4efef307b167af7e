"""``biahub characterize-psf``: bead detection + Gaussian PSF report.

Mirrors the reference verb (reference: biahub/characterize_psf.py:713-826):
detect peaks, extract bead patches, Gaussian-fit each, and emit an HTML
report with FWHM statistics, per-axis scatter plots, and CSV tables. The
torch peak detector is the device kernel in :mod:`biahub_tpu.kernels.peaks`;
fitting lives in :mod:`biahub_tpu.psf.analysis`.
"""

from __future__ import annotations

import pickle
import time
from pathlib import Path

import click
import numpy as np

from biahub_tpu.cli.parsing import config_filepath, input_position_dirpaths, output_dirpath
from biahub_tpu.cli.utils import yaml_to_model
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.kernels.peaks import detect_peaks
from biahub_tpu.psf.analysis import analyze_psf, compute_noise_level, extract_beads
from biahub_tpu.settings import CharacterizeSettings

__all__ = [
    "characterize_psf_cli",
    "detect_peaks",
    "generate_report",
    "calculate_peak_widths",
    "calculate_robust_peak_widths",
]


def _plot_fwhm_scatter(plots_dir, df_x, df_y, axis_labels):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    paths = []
    for i, label in enumerate(axis_labels):
        fig, ax = plt.subplots(figsize=(4, 3))
        for y_vals, name in zip(df_y, ("z", "y", "x")):
            ax.plot(df_x[i], y_vals, "o", markersize=2, label=f"{name} FWHM")
        ax.set_xlabel(f"{label} (um)")
        ax.set_ylabel("FWHM (um)")
        ax.legend(frameon=False)
        fig.tight_layout()
        path = plots_dir / f"fwhm_vs_{label}.png"
        fig.savefig(path, dpi=150)
        plt.close(fig)
        paths.append(path)
    return paths


def _plot_psf_slices(plots_dir, beads, scale, indices):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(beads)
    fig, axes = plt.subplots(3, max(n, 1), figsize=(3 * max(n, 1), 9))
    # n == 1 gives a 1-D (3,) axes array that atleast_2d would orient as
    # (1, 3); reshape keeps (row, bead) indexing valid for every n.
    axes = np.asarray(axes).reshape(3, max(n, 1))
    for i, bead in enumerate(beads):
        mid = [s // 2 for s in bead.shape]
        for row, (plane, title) in enumerate(
            ((bead[mid[0]], "XY"), (bead[:, mid[1]], "XZ"), (bead[:, :, mid[2]], "YZ"))
        ):
            ax = axes[row, i] if n > 1 else axes[row, 0]
            ax.imshow(plane, cmap="gray")
            ax.set_title(f"bead {indices[i]} {title}", fontsize=8)
            ax.axis("off")
    fig.tight_layout()
    path = plots_dir / "psf_slices.png"
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def generate_report(
    output_path: Path,
    data_dir: Path,
    dataset: str,
    beads: list,
    peaks: np.ndarray,
    df_gaussian_fit,
    df_1d_peak_width,
    scale: tuple,
    axis_labels: tuple,
    fwhm_plot_type: str,
) -> None:
    """Write the PSF analysis HTML report, plots, and CSV tables."""
    output_path = Path(output_path)
    output_path.mkdir(exist_ok=True, parents=True)
    plots_dir = output_path / "plots"
    plots_dir.mkdir(exist_ok=True)

    num_beads = len(beads)
    num_successful = len(df_gaussian_fit)
    num_failed = num_beads - num_successful

    rng = np.random.default_rng(0)
    sample = sorted(rng.choice(num_beads, min(5, num_beads), replace=False))
    slices_path = _plot_psf_slices(plots_dir, [beads[i] for i in sample], scale, sample)

    if fwhm_plot_type == "1D" and len(df_1d_peak_width):
        df_x = [df_1d_peak_width[c].values for c in ("x_mu", "y_mu", "z_mu")]
        df_y = [df_1d_peak_width[c].values for c in ("1d_z_fwhm", "1d_y_fwhm", "1d_x_fwhm")]
    else:
        df_x = [df_gaussian_fit[c].values for c in ("x_mu", "y_mu", "z_mu")]
        df_y = [
            df_gaussian_fit[c].values
            for c in ("zyx_z_fwhm", "zyx_y_fwhm", "zyx_x_fwhm")
        ]
    fwhm_paths = _plot_fwhm_scatter(plots_dir, df_x, df_y, axis_labels)

    fwhm_3d_mean = [
        df_gaussian_fit[c].mean() for c in ("zyx_z_fwhm", "zyx_y_fwhm", "zyx_x_fwhm")
    ]
    fwhm_3d_std = [
        df_gaussian_fit[c].std() for c in ("zyx_z_fwhm", "zyx_y_fwhm", "zyx_x_fwhm")
    ]
    fwhm_pc_mean = [
        df_gaussian_fit[c].mean()
        for c in ("zyx_pc3_fwhm", "zyx_pc2_fwhm", "zyx_pc1_fwhm")
    ]
    fwhm_1d_mean = [
        df_1d_peak_width[c].mean() for c in ("1d_z_fwhm", "1d_y_fwhm", "1d_x_fwhm")
    ]
    snr_mean = df_gaussian_fit["zyx_snr"].mean() if "zyx_snr" in df_gaussian_fit else 0

    with open(output_path / "peaks.pkl", "wb") as f:
        pickle.dump(peaks, f)
    df_gaussian_fit.to_csv(output_path / "psf_gaussian_fit.csv", index=False)
    df_1d_peak_width.to_csv(output_path / "psf_1d_peak_width.csv", index=False)

    def _fmt(vals):
        return ", ".join(f"{v:.3f}" for v in vals)

    html = f"""<!DOCTYPE html><html><head><title>PSF Analysis</title></head><body>
<h1>PSF Analysis Report</h1>
<p>Dataset: {dataset}<br>Path: {data_dir}<br>Scale (z, y, x): {tuple(scale)} um</p>
<h2>Detection</h2>
<p>Beads: {num_beads}, successful fits: {num_successful}, failed: {num_failed}<br>
Mean SNR: {snr_mean:.1f}</p>
<h2>FWHM (um)</h2>
<p>3D Gaussian fit (z, y, x): {_fmt(fwhm_3d_mean)} &plusmn; {_fmt(fwhm_3d_std)}<br>
Principal components: {_fmt(fwhm_pc_mean)}<br>
1D profiles (z, y, x): {_fmt(fwhm_1d_mean)}</p>
<h2>Plots</h2>
<img src="plots/{slices_path.name}" width="800"><br>
{''.join(f'<img src="plots/{p.name}" width="400">' for p in fwhm_paths)}
</body></html>"""
    with open(output_path / "psf_analysis_report.html", "w") as f:
        f.write(html)


def _characterize_psf(
    zyx_data: np.ndarray,
    zyx_scale: tuple,
    settings: CharacterizeSettings,
    output_report_path: Path,
    input_dataset_path: str,
    input_dataset_name: str,
):
    settings_dict = settings.model_dump()
    patch_size = settings_dict.pop("patch_size", None)
    axis_labels = settings_dict.pop("axis_labels")
    offset = settings_dict.pop("offset")
    gain = settings_dict.pop("gain")
    use_robust_1d_fwhm = settings_dict.pop("use_robust_1d_fwhm")
    fwhm_plot_type = settings_dict.pop("fwhm_plot_type")
    settings_dict.pop("device", None)

    click.echo("Detecting peaks...")
    t1 = time.time()
    peaks = detect_peaks(
        zyx_data,
        block_size=tuple(settings_dict["block_size"]),
        nms_distance=settings_dict["nms_distance"],
        min_distance=settings_dict["min_distance"],
        threshold_abs=settings_dict["threshold_abs"],
        max_num_peaks=settings_dict["max_num_peaks"],
        exclude_border=tuple(settings_dict["exclude_border"]),
        blur_kernel_size=settings_dict["blur_kernel_size"],
        verbose=True,
    )
    click.echo(f"Time to detect peaks: {time.time() - t1:.2f}s")
    if len(peaks) == 0:
        raise click.ClickException("No peaks detected.")

    beads, offsets = extract_beads(
        zyx_data=zyx_data, points=peaks, scale=zyx_scale, patch_size=patch_size
    )
    if not beads:
        raise click.ClickException("No beads could be extracted.")

    patch_size_pix = beads[0].shape
    noise = compute_noise_level(zyx_data, peaks, patch_size_pix)

    click.echo("Analyzing PSFs...")
    df_gaussian_fit, df_1d_peak_width = analyze_psf(
        zyx_patches=beads,
        peak_coordinates=offsets,
        scale=zyx_scale,
        offset=offset,
        gain=gain,
        noise=noise,
        use_robust_1d_fwhm=use_robust_1d_fwhm,
    )

    generate_report(
        output_report_path,
        input_dataset_path,
        input_dataset_name,
        beads,
        peaks,
        df_gaussian_fit,
        df_1d_peak_width,
        zyx_scale,
        axis_labels,
        fwhm_plot_type,
    )
    return peaks


@click.command("characterize-psf")
@input_position_dirpaths()
@config_filepath()
@output_dirpath()
def characterize_psf_cli(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
):
    """Characterize the point spread function (PSF) from bead images.

    >>> biahub characterize-psf -i ./beads.zarr/*/*/* -c ./characterize_params.yml -o ./
    """
    settings = yaml_to_model(config_filepath, CharacterizeSettings)

    dataset = open_ome_zarr(str(input_position_dirpaths[0]), mode="r")
    zyx_data = dataset["0"][0, 0]
    zyx_scale = tuple(dataset.scale[-3:])

    _characterize_psf(
        zyx_data=np.asarray(zyx_data),
        zyx_scale=zyx_scale,
        settings=settings,
        output_report_path=Path(output_dirpath),
        input_dataset_path=str(input_position_dirpaths[0]),
        input_dataset_name="/".join(Path(input_position_dirpaths[0]).parts[-3:]),
    )
    click.echo(f"Report saved to {output_dirpath}")


if __name__ == "__main__":
    characterize_psf_cli()


# Reference-name compatibility (reference: biahub/characterize_psf.py:87-170,
# 453-559): the plotting helpers live under private names in this module.
def plot_psf_slices(plots_dir, beads, zyx_scale, axis_labels, bead_numbers=None):
    return _plot_psf_slices(
        Path(plots_dir), beads, zyx_scale,
        bead_numbers if bead_numbers is not None else list(range(len(beads))),
    )


def plot_fwhm_vs_acq_axes(plots_dir, x, y, z, fwhm_x, fwhm_y, fwhm_z, axis_labels):
    import pandas as pd

    df = pd.DataFrame({"x": x, "y": y, "z": z,
                       "fwhm_x": fwhm_x, "fwhm_y": fwhm_y, "fwhm_z": fwhm_z})
    return _plot_fwhm_scatter(
        Path(plots_dir),
        df[["x", "y", "z"]],
        df[["fwhm_x", "fwhm_y", "fwhm_z"]].rename(
            columns={"fwhm_x": "x", "fwhm_y": "y", "fwhm_z": "z"}
        ),
        axis_labels,
    )


def plot_psf_amp(plots_dir, x, y, z, amp, axis_labels=("z", "y", "x")):
    """Bead amplitude vs position scatter (reference name)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plots_dir = Path(plots_dir)
    plots_dir.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.5))
    for ax, coord, label in zip(axes, (x, y, z), axis_labels[::-1]):
        ax.scatter(coord, amp, s=8)
        ax.set_xlabel(label)
        ax.set_ylabel("amplitude")
    fig.tight_layout()
    out = plots_dir / "psf_amp.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def calculate_peak_widths(zyx_data, zyx_scale: tuple) -> tuple:
    """FWHM of the central-axis profiles via half-max width estimation
    (reference: biahub/characterize_psf.py:335-348). Returns scaled
    (z_fwhm, y_fwhm, x_fwhm); 0.0 per axis on failure."""
    from scipy.signal import peak_widths as _peak_widths

    zyx_data = np.asarray(zyx_data)
    sz, sy, sx = (s // 2 for s in zyx_data.shape)
    profiles = (
        (zyx_data[:, sy, sx], sz, zyx_scale[0]),
        (zyx_data[sz, :, sx], sy, zyx_scale[1]),
        (zyx_data[sz, sy, :], sx, zyx_scale[2]),
    )
    widths = []
    for profile, center, scale in profiles:
        try:
            widths.append(float(_peak_widths(profile, [center])[0][0]) * scale)
        except Exception:
            widths.append(0.0)
    return tuple(widths)


def calculate_robust_peak_widths(zyx_data, zyx_scale: tuple) -> list:
    """FWHM of the central-axis profiles with sub-sample peak location
    (parabola through the maximum) and interp1d half-max crossings on each
    flank — algorithmically identical to the reference
    (reference: biahub/characterize_psf.py:295-332): 4-point fit window and
    extrapolating value->position interpolation on the quarter-max-filtered
    flanks. Returns [z_fwhm, y_fwhm, x_fwhm]; 0.0 per axis on failure."""
    from scipy.interpolate import interp1d

    zyx_data = np.asarray(zyx_data, dtype=np.float64)
    sz, sy, sx = (s // 2 for s in zyx_data.shape)
    profiles = (
        (zyx_data[:, sy, sx], zyx_scale[0]),
        (zyx_data[sz, :, sx], zyx_scale[1]),
        (zyx_data[sz, sy, :], zyx_scale[2]),
    )
    widths = []
    for profile, scale in profiles:
        try:
            n = profile.size
            x = np.arange(n, dtype=np.float64)
            peak = int(np.argmax(profile))
            window = slice(max(0, peak - 2), min(peak + 2, n))
            p = np.polyfit(x[window], profile[window], 2)
            peak_pos = -p[1] / (2 * p[0])
            half_max = np.polyval(p, peak_pos) / 2.0

            x_scaled = x * scale
            indices = np.where(profile >= half_max / 2)[0]
            left = indices[indices < peak_pos]
            right = indices[indices > peak_pos]
            f_left = interp1d(
                profile[left], x_scaled[left], kind="linear",
                fill_value="extrapolate",
            )
            f_right = interp1d(
                profile[right], x_scaled[right], kind="linear",
                fill_value="extrapolate",
            )
            widths.append(float(f_right(half_max)) - float(f_left(half_max)))
        except Exception:
            widths.append(0.0)
    return widths

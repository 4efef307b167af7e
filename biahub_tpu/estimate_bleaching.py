"""``biahub estimate-bleaching``: per-channel intensity vs time + decay fits.

Mirrors the reference (reference: biahub/estimate_bleaching.py:21-154):
per-timepoint channel mean/std plotted with an exponential curve fit whose
lifetime (minutes) labels each channel.
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path

import click
import numpy as np
from scipy.optimize import curve_fit

from biahub_tpu.cli.parsing import input_position_dirpaths, output_dirpath
from biahub_tpu.io.ngff import open_ome_zarr

__all__ = ["plot_bleaching_curves", "estimate_bleaching_cli"]

MSECS_PER_MINUTE = 60000

# Display colors for common channel names (the reference pulls these from
# iohub's channel display registry)
_CHANNEL_COLORS = {
    "GFP": "#00FF00",
    "RFP": "#FF0000",
    "mCherry": "#FF0000",
    "DAPI": "#0000FF",
    "BF": "#FFFFFF",
}


def plot_bleaching_curves(times, tczyx_data, channel_names, output_file, title=""):
    """Plot per-channel mean intensity over time with exponential decay fits."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    num_times = tczyx_data.shape[0]
    num_channels = tczyx_data.shape[1]

    means = np.zeros((num_times, num_channels))
    stds = np.zeros_like(means)
    for t in range(num_times):
        for c in range(num_channels):
            zyx = np.asarray(tczyx_data[t, c])
            means[t, c] = np.mean(zyx)
            stds[t, c] = np.std(zyx)

    f, ax = plt.subplots(1, 1, figsize=(4, 4))
    for c in range(num_channels):
        color = _CHANNEL_COLORS.get(channel_names[c], f"C{c}")
        xdata = times[:]
        ydata = means[:, c]
        yerr = stds[:, c]

        def func(x, a, b, cc):
            return a * np.exp(-x / b) + cc

        try:
            popt, _ = curve_fit(
                func,
                xdata,
                ydata,
                sigma=yerr,
                p0=(np.max(ydata) - np.min(ydata), 100, np.min(ydata)),
                maxfev=5000,
            )
            xx = np.linspace(0, np.max(xdata), 100)
            ax.plot(xx, func(xx, *popt), color=color, alpha=0.5)
            label = channel_names[c] + f" - {popt[1]:0.0f} minutes"
            print("Curve fit successful!")
            print(label)
        except Exception as e:  # noqa: BLE001 — fit failure only drops the label
            print(e)
            label = channel_names[c]
            print("Curve fit failed!")

        ax.plot(
            xdata, ydata, label=label, marker="o", markeredgewidth=0, linewidth=0,
            color=color,
        )

    ax.set_title(title, {"fontsize": 8})
    ax.set_xlabel("Time (minutes)")
    ax.set_ylabel("Mean Intensity (AU)")
    ax.legend(frameon=False, markerfirst=False)
    ax.spines["right"].set_visible(False)
    ax.spines["top"].set_visible(False)
    plt.savefig(output_file, bbox_inches="tight")
    plt.close()


@click.command("estimate-bleaching")
@input_position_dirpaths()
@output_dirpath()
def estimate_bleaching_cli(input_position_dirpaths, output_dirpath):
    """Estimate bleaching from raw data.

    >>> biahub estimate-bleaching -i ./input.zarr/0/0/0 -o ./bleaching-curves/
    """
    plate_zattrs = {}
    try:
        plate_path = Path(*Path(input_position_dirpaths[0]).parts[:-3])
        plate_zattrs = open_ome_zarr(plate_path).zattrs
    except Exception as e:  # noqa: BLE001 — missing plate metadata only drops times
        print(e)
        warnings.warn(
            "WARNING: this position has no plate metadata, so the time metadata "
            "will be missing.",
            stacklevel=2,
        )

    for input_position_dirpath in input_position_dirpaths:
        reader = open_ome_zarr(input_position_dirpath)
        well_name = "/".join(Path(input_position_dirpath).parts[-3:])
        tczyx_data = reader["0"]
        print(f"Generating bleaching curves for position {well_name}")

        T = tczyx_data.shape[0]
        try:
            dt = np.float32(plate_zattrs["Summary"]["Interval_ms"] / MSECS_PER_MINUTE)
        except Exception as e:  # noqa: BLE001
            print(e)
            warnings.warn(f"WARNING: missing time metadata for p={well_name}", stacklevel=2)
            dt = 1

        times = np.arange(0, T * dt, step=dt)
        output_file = os.path.join(output_dirpath, well_name)
        os.makedirs(output_file, exist_ok=True)
        title = str(input_position_dirpath) + f" - position = {well_name}"
        plot_bleaching_curves(
            times,
            tczyx_data,
            reader.channel_names,
            os.path.join(output_file, "bleaching.svg"),
            title,
        )


if __name__ == "__main__":
    estimate_bleaching_cli()

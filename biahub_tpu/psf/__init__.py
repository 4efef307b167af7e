"""PSF extraction and Gaussian characterization (replaces the vendored
napari-psf-analysis code in the reference, biahub/vendor/napari_psf_analysis/)."""

from biahub_tpu.psf.analysis import (
    analyze_psf,
    calculate_peak_widths,
    calculate_robust_peak_widths,
    compute_noise_level,
    extract_beads,
    fit_gaussian_3d,
)

__all__ = [
    "analyze_psf",
    "calculate_peak_widths",
    "calculate_robust_peak_widths",
    "compute_noise_level",
    "extract_beads",
    "fit_gaussian_3d",
]

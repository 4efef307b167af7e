"""In-focus slice detection from transverse mid-band spectral power.

Re-derivation of waveorder's ``focus_from_transverse_band`` used throughout
the reference for z-drift estimation and z-window selection (reference:
biahub/estimate_stabilization.py:899-999, biahub/track.py:296-335): the
in-focus z-slice maximizes the power of the transverse spatial-frequency
band between ``midband_fractions`` of the detection cutoff frequency
(fc = 2 NA / lambda). Batched over z as one 2D rFFT stack — a single XLA
program per volume, vmappable over (T, C).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["focus_from_transverse_band", "midband_power_zyx"]


def _midband_mask(
    shape_yx: tuple[int, int],
    NA_det: float,
    lambda_ill: float,
    pixel_size: float,
    midband_fractions: tuple[float, float],
) -> np.ndarray:
    fy = np.fft.fftfreq(shape_yx[0], d=pixel_size)
    fx = np.fft.rfftfreq(shape_yx[1], d=pixel_size)
    frr = np.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    cutoff = 2 * NA_det / lambda_ill
    return (frr > cutoff * midband_fractions[0]) & (frr < cutoff * midband_fractions[1])


@partial(
    jax.jit,
    static_argnames=("NA_det", "lambda_ill", "pixel_size", "midband_fractions"),
)
def midband_power_zyx(
    zyx: jax.Array,
    NA_det: float = 1.35,
    lambda_ill: float = 0.5,
    pixel_size: float = 0.1,
    midband_fractions: tuple[float, float] = (0.125, 0.25),
) -> jax.Array:
    """Per-z-slice mid-band spectral power (the focus metric), shape (Z,)."""
    zyx = zyx.astype(jnp.float32)
    mask = jnp.asarray(
        _midband_mask(zyx.shape[-2:], NA_det, lambda_ill, pixel_size, midband_fractions)
    )
    spectrum = jnp.abs(jnp.fft.rfftn(zyx, axes=(-2, -1)))
    return jnp.sum(jnp.log(spectrum + 1e-12) * mask, axis=(-2, -1))


def focus_from_transverse_band(
    zyx: np.ndarray,
    NA_det: float = 1.35,
    lambda_ill: float = 0.5,
    pixel_size: float = 0.1,
    midband_fractions: tuple[float, float] = (0.125, 0.25),
    mode: str = "max",
) -> int:
    """Index of the in-focus slice of a ZYX stack.

    Degenerate inputs (all-constant) return 0, matching the reference's
    empty-FOV handling (reference: biahub/estimate_stabilization.py:943-945).
    """
    zyx = np.asarray(zyx)
    if zyx.ndim != 3:
        raise ValueError("Input must be a ZYX stack")
    if zyx.shape[0] == 1:
        return 0
    if np.all(zyx == zyx.flat[0]):
        return 0
    power = np.asarray(
        midband_power_zyx(
            zyx,
            NA_det=NA_det,
            lambda_ill=lambda_ill,
            pixel_size=float(pixel_size),
            midband_fractions=tuple(midband_fractions),
        )
    )
    if mode == "min":
        return int(np.argmin(power))
    return int(np.argmax(power))


def focus_from_transverse_band_tzyx(
    tzyx: np.ndarray,
    NA_det: float = 1.35,
    lambda_ill: float = 0.5,
    pixel_size: float = 0.1,
    midband_fractions: tuple[float, float] = (0.125, 0.25),
    mode: str = "max",
) -> np.ndarray:
    """In-focus z-index for every timepoint of a (T, Z, Y, X) stack.

    One device program computes the whole stack's focus metric (the per-FOV
    timepoint loop of the reference becomes a batched 2D-rFFT sweep;
    reference: biahub/estimate_stabilization.py:899-999). Degenerate frames
    (all-constant) return 0 like the scalar variant.
    """
    tzyx = np.asarray(tzyx)
    if tzyx.ndim != 4:
        raise ValueError("Input must be a TZYX stack")
    T, Z = tzyx.shape[:2]
    if Z == 1:
        return np.zeros(T, dtype=int)
    power = np.asarray(
        midband_power_zyx(
            jnp.asarray(tzyx),
            NA_det=NA_det,
            lambda_ill=lambda_ill,
            pixel_size=float(pixel_size),
            midband_fractions=tuple(midband_fractions),
        )
    )  # (T, Z)
    idx = np.argmin(power, axis=1) if mode == "min" else np.argmax(power, axis=1)
    degenerate = (tzyx.reshape(T, -1) == tzyx.reshape(T, -1)[:, :1]).all(axis=1)
    idx[degenerate] = 0
    return idx

"""Birefringence reconstruction: Stokes inversion from polarization states.

Fills the waveorder birefringence role behind the reference's reconstruct
verbs (reference: biahub/compute_transfer_function.py:16-34,
biahub/reconstruct.py:27-74).

Re-derivation of the recOrder/waveorder polarized-light math: acquired
intensities under N liquid-crystal states relate to the Stokes vector through
the instrument matrix A (ideal, calibration-free form); inverting gives
S0..S3, from which retardance, slow-axis orientation, transmittance, and
degree of polarization follow.

Instrument matrices (swing chi, in fractions of a wave):
- 5-State (ext, 0, 45, 90, 135):
    [1,  0,          0,         -cos(2 pi chi)] ... per recOrder convention
- 4-State (ext, 0, 60, 120): rows [1, sin(2pi chi) cos(2 theta),
    sin(2pi chi) sin(2 theta), -cos(2pi chi)] for theta in {0, 60, 120}.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["instrument_matrix", "stokes_from_intensities", "birefringence_from_stokes"]


def instrument_matrix(n_states: int, swing: float) -> np.ndarray:
    """Ideal instrument matrix mapping Stokes (S0, S1, S2, S3) to intensities."""
    chi = 2 * np.pi * swing
    if n_states == 5:
        thetas = [0, 45, 90, 135]
    elif n_states == 4:
        thetas = [0, 60, 120]
    else:
        raise ValueError(f"Unsupported number of polarization states: {n_states}")
    rows = [[1.0, 0.0, 0.0, -1.0]]  # extinction state
    for theta_deg in thetas:
        theta = np.deg2rad(theta_deg)
        rows.append(
            [
                1.0,
                np.sin(chi) * np.cos(2 * theta),
                np.sin(chi) * np.sin(2 * theta),
                -np.cos(chi),
            ]
        )
    return np.asarray(rows, dtype=np.float32)


@partial(jax.jit, static_argnames=("swing",))
def stokes_from_intensities(czyx: jax.Array, swing: float) -> jax.Array:
    """(C=N states, Z, Y, X) intensities → (4, Z, Y, X) Stokes images."""
    n_states = czyx.shape[0]
    A = jnp.asarray(instrument_matrix(n_states, swing))
    A_inv = jnp.linalg.pinv(A)
    flat = czyx.reshape(n_states, -1).astype(jnp.float32)
    stokes = A_inv @ flat
    return stokes.reshape((4,) + czyx.shape[1:])


@partial(
    jax.jit,
    static_argnames=("wavelength_illumination", "flip_orientation", "rotate_orientation"),
)
def birefringence_from_stokes(
    stokes: jax.Array,
    wavelength_illumination: float = 0.532,
    flip_orientation: bool = False,
    rotate_orientation: bool = False,
) -> jax.Array:
    """(4, Z, Y, X) Stokes → (4, Z, Y, X): Retardance (um), Orientation (rad),
    BF (transmittance), Pol (degree of polarization)."""
    s0, s1, s2, s3 = stokes[0], stokes[1], stokes[2], stokes[3]
    eps = 1e-12
    transverse = jnp.sqrt(s1 * s1 + s2 * s2)
    retardance = jnp.arctan2(transverse, s3) * wavelength_illumination / (2 * jnp.pi)
    orientation = 0.5 * jnp.arctan2(s1, s2 + eps) % jnp.pi
    if rotate_orientation:
        orientation = (orientation + jnp.pi / 2) % jnp.pi
    if flip_orientation:
        orientation = jnp.pi - orientation
    bf = s0
    pol = jnp.sqrt(s1 * s1 + s2 * s2 + s3 * s3) / (jnp.abs(s0) + eps)
    return jnp.stack([retardance, orientation, bf, pol])

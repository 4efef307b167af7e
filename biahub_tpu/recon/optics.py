"""Optical transfer function models (JAX): pupils, widefield OTF, phase WOTF.

Fills the role of waveorder's transfer-function models behind the
reference's compute-tf / apply-inv-tf verbs (reference:
biahub/compute_transfer_function.py:16-34,
biahub/apply_inverse_transfer_function.py:117-201), re-derived from the
published optics rather than ported.

Physics: a circular detection pupil P(u) with cutoff NA_det/lambda; defocus
phase exp(i 2 pi z kz(u)) with kz = sqrt((n/lambda)^2 - |u|^2).

- Fluorescence (incoherent widefield): psf(z) = |IFFT2(P e^{i2pi z kz})|^2,
  OTF = FFT3(psf) normalized to 1 at DC.
- Phase (partially coherent brightfield, weak-object/Born): per-z transfer
  function from the source-pupil mutual-intensity correlation
      C(f, z) = sum_u S(u) P*(u) P(u+f) e^{i 2 pi z (kz(u+f) - kz(u))}
  (Streibl 1985); the absorption/phase parts are 2Re{C}/2Im{C}. Each z-slice
  is one FFT-based cross-correlation, so the whole 3D WOTF is a batch of 2D
  FFTs — ideal for the TPU. The 3D phase transfer function is the z-FFT of
  the phase part.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pupil",
    "fluorescence_otf_3d",
    "phase_wotf_3d",
    "tikhonov_inverse_3d",
]


def _frequency_grids(yx_shape, yx_pixel_size):
    fy = np.fft.fftfreq(yx_shape[0], d=yx_pixel_size)
    fx = np.fft.fftfreq(yx_shape[1], d=yx_pixel_size)
    return np.meshgrid(fy, fx, indexing="ij")


def pupil(
    yx_shape,
    yx_pixel_size: float,
    numerical_aperture: float,
    wavelength: float,
) -> np.ndarray:
    """Binary circular pupil on the fftfreq grid (cutoff NA/lambda)."""
    fyy, fxx = _frequency_grids(yx_shape, yx_pixel_size)
    frr = np.sqrt(fyy**2 + fxx**2)
    return (frr <= numerical_aperture / wavelength).astype(np.float32)


def _kz(yx_shape, yx_pixel_size, wavelength, n_media) -> np.ndarray:
    """Axial wavevector kz(u) = sqrt((n/lambda)^2 - |u|^2), zero outside."""
    fyy, fxx = _frequency_grids(yx_shape, yx_pixel_size)
    f2 = fyy**2 + fxx**2
    kz2 = (n_media / wavelength) ** 2 - f2
    return np.sqrt(np.maximum(kz2, 0.0)).astype(np.float32)


def _z_coords(n_z: int, z_pixel_size: float) -> np.ndarray:
    # fftfreq-style z coordinates so the OTF is centered at z=0 without shifts
    return (np.fft.fftfreq(n_z) * n_z * z_pixel_size).astype(np.float32)


@partial(
    jax.jit,
    static_argnames=(
        "zyx_shape",
        "yx_pixel_size",
        "z_pixel_size",
        "wavelength_emission",
        "numerical_aperture_detection",
        "index_of_refraction_media",
    ),
)
def fluorescence_otf_3d(
    zyx_shape: tuple[int, int, int],
    yx_pixel_size: float,
    z_pixel_size: float,
    wavelength_emission: float,
    numerical_aperture_detection: float,
    index_of_refraction_media: float,
) -> jax.Array:
    """Widefield incoherent 3D OTF, real, normalized to 1 at DC."""
    n_z = zyx_shape[0]
    P = jnp.asarray(
        pupil(zyx_shape[1:], yx_pixel_size, numerical_aperture_detection, wavelength_emission)
    )
    kz = jnp.asarray(
        _kz(zyx_shape[1:], yx_pixel_size, wavelength_emission, index_of_refraction_media)
    )
    z = jnp.asarray(_z_coords(n_z, z_pixel_size))

    defocused = P[None] * jnp.exp(2j * jnp.pi * z[:, None, None] * kz[None])
    asf = jnp.fft.ifft2(defocused, axes=(1, 2))
    psf = jnp.abs(asf) ** 2
    otf = jnp.fft.fftn(psf)
    return otf / otf[0, 0, 0]


@partial(
    jax.jit,
    static_argnames=(
        "zyx_shape",
        "yx_pixel_size",
        "z_pixel_size",
        "wavelength_illumination",
        "numerical_aperture_illumination",
        "numerical_aperture_detection",
        "index_of_refraction_media",
        "invert_phase_contrast",
    ),
)
def phase_wotf_3d(
    zyx_shape: tuple[int, int, int],
    yx_pixel_size: float,
    z_pixel_size: float,
    wavelength_illumination: float,
    numerical_aperture_illumination: float,
    numerical_aperture_detection: float,
    index_of_refraction_media: float,
    invert_phase_contrast: bool = False,
) -> jax.Array:
    """3D weak-object PHASE transfer function (complex), z-FFT of 2Im{C}.

    The returned H relates the normalized intensity spectrum to the phase
    spectrum: FFT3(I_norm) ≈ H * FFT3(phi).
    """
    n_z = zyx_shape[0]
    P = jnp.asarray(
        pupil(
            zyx_shape[1:], yx_pixel_size, numerical_aperture_detection,
            wavelength_illumination,
        )
    )
    S = jnp.asarray(
        pupil(
            zyx_shape[1:], yx_pixel_size, numerical_aperture_illumination,
            wavelength_illumination,
        )
    )
    kz = jnp.asarray(
        _kz(zyx_shape[1:], yx_pixel_size, wavelength_illumination, index_of_refraction_media)
    )
    z = jnp.asarray(_z_coords(n_z, z_pixel_size))
    norm = jnp.sum(S * P * P) + 1e-12

    def per_z(zi):
        # C(f, z) = sum_u A(u) B(u + f), with
        # A(u) = S P* e^{-i2pi z kz}, B(u) = P e^{+i2pi z kz}.
        # Writing A = conj(A') turns this into the standard cross-correlation
        # sum_u conj(A'(u)) B(u+f) whose spectrum is conj(FFT(A')) FFT(B).
        a_conj = S * P * jnp.exp(2j * jnp.pi * zi * kz)  # == conj(A)
        b = P * jnp.exp(2j * jnp.pi * zi * kz)
        corr = jnp.fft.ifft2(jnp.conj(jnp.fft.fft2(a_conj)) * jnp.fft.fft2(b))
        c = corr * (P.size / norm) / P.size  # normalize by source energy
        return 2.0 * jnp.imag(c)

    hp = jax.vmap(per_z)(z)  # (Z, Y, X) phase part per defocus
    H = jnp.fft.fft(hp, axis=0) * (1.0 if invert_phase_contrast else -1.0)
    # One z-FFT bin corresponds to dz spacing; fold the z sampling in so the
    # inverse filter is sampling-consistent.
    return H / n_z


@partial(jax.jit, static_argnames=("regularization_strength", "assume_hermitian"))
def tikhonov_inverse_3d(
    zyx_data: jax.Array,
    transfer_function: jax.Array,
    regularization_strength: float = 1e-3,
    assume_hermitian: bool = False,
) -> jax.Array:
    """f = Re{IFFT3( FFT3(data) conj(H) / (|H|^2 + reg) )}.

    With ``assume_hermitian=True`` (valid for the WOTFs built here — H is
    the FFT of a real defocus kernel) the TPU path runs the fused Pallas
    matmul-DFT pipeline on the rfft half-spectrum; otherwise (or on CPU /
    ineligible shapes) XLA's complex FFTs handle the general case.
    """
    zyx_data = zyx_data.astype(jnp.float32)
    if assume_hermitian:
        from biahub_tpu.kernels.pallas_fft import (
            deconvolve_pallas_supported,
            fourier_filter_zyx_pallas,
        )

        if deconvolve_pallas_supported(zyx_data.shape):
            xh = zyx_data.shape[-1] // 2 + 1
            H_half = transfer_function[..., :xh]
            filt = jnp.conj(H_half) / (
                jnp.abs(H_half) ** 2 + regularization_strength
            )
            return fourier_filter_zyx_pallas(
                zyx_data, jnp.real(filt), jnp.imag(filt)
            )
    data_hat = jnp.fft.fftn(zyx_data)
    H = transfer_function
    filt = jnp.conj(H) / (jnp.abs(H) ** 2 + regularization_strength)
    return jnp.real(jnp.fft.ifftn(data_hat * filt))

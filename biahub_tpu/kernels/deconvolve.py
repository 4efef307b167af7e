"""Fluorescence deconvolution: PSF transfer function + regularized inverse filter.

Re-derivation of the reference's math (reference: biahub/deconvolve.py:34-70,
backed by waveorder's isotropic_fluorescent_thick_3d model): the transfer
function is the normalized magnitude of the padded PSF's 3D FFT, and
deconvolution is a Tikhonov-regularized inverse filter

    out = real(ifftn(fftn(data) * TF / (TF^2 + reg)))

Because both the data and the TF are real, the device kernel runs on the
rfft half-spectrum — identical result, half the FFT work and memory traffic.

On TPU the filter dispatches to the fused VMEM-resident matmul-DFT kernel
(:mod:`biahub_tpu.kernels.pallas_fft`) — XLA's TPU FFT runs far below the
HBM roofline; the XLA rfftn path remains for CPU, ineligible shapes, and
``BIAHUB_TPU_NO_PALLAS=1``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["compute_transfer_function", "deconvolve_zyx", "deconvolve_czyx"]


def compute_transfer_function(
    psf_zyx_data: np.ndarray,
    output_zyx_shape: tuple[int, int, int],
) -> np.ndarray:
    """Normalized |FFT| of the PSF zero-padded (centered) to the output shape.

    Matches the reference bit-for-bit including the odd-padding split
    (reference: biahub/deconvolve.py:34-47).
    """
    padding = np.array(output_zyx_shape) - np.array(psf_zyx_data.shape)
    pad_width = [
        (x // 2, x // 2) if x % 2 == 0 else (x // 2, x // 2 + 1) for x in padding
    ]
    padded = np.pad(psf_zyx_data, pad_width=pad_width, mode="constant", constant_values=0)
    tf = np.abs(np.fft.fftn(padded))
    tf /= tf.max()
    return tf.astype(np.float32)


@partial(jax.jit, static_argnames=("regularization_strength",))
def deconvolve_zyx(
    zyx_data: jax.Array,
    transfer_function_half: jax.Array,
    regularization_strength: float = 1e-3,
    prepared=None,
) -> jax.Array:
    """Tikhonov inverse filter of one ZYX volume on the rfft half-spectrum.

    ``transfer_function_half`` is the full TF sliced to ``[..., : X // 2 + 1]``
    (the TF of a real PSF is Hermitian-symmetric in magnitude, so the half
    spectrum carries all information). ``prepared``: an optional
    pallas_fft.prepare_fourier_filter result for this shape — verbs hoist
    the per-call filter arrangement out of the hot loop with it (the XLA
    fallback ignores it and uses the raw TF).
    """
    from biahub_tpu.kernels.pallas_fft import (
        deconvolve_pallas_supported,
        deconvolve_zyx_pallas,
        pass_a_native_dtype_ok,
    )

    if deconvolve_pallas_supported(zyx_data.shape):
        # Camera-dtype volumes stay native into the fused engine: pass A
        # converts uint16 -> f32 in VMEM (half the read bytes, no cast
        # pass in front of the pipeline).
        if not pass_a_native_dtype_ok(zyx_data.shape, zyx_data.dtype):
            zyx_data = zyx_data.astype(jnp.float32)
        return deconvolve_zyx_pallas(
            zyx_data, transfer_function_half, regularization_strength,
            prepared=prepared,
        )
    zyx_data = zyx_data.astype(jnp.float32)
    data_hat = jnp.fft.rfftn(zyx_data)
    tf = transfer_function_half.astype(jnp.float32)
    filt = tf / (tf * tf + regularization_strength)
    return jnp.fft.irfftn(data_hat * filt, s=zyx_data.shape)


def deconvolve_czyx(
    czyx_data: jax.Array,
    transfer_function_half: jax.Array,
    regularization_strength: float = 1e-3,
) -> jax.Array:
    """vmap the inverse filter over the channel axis."""
    fn = partial(
        deconvolve_zyx, regularization_strength=regularization_strength
    )
    return jax.vmap(fn, in_axes=(0, None))(czyx_data, transfer_function_half)


# Reference-name compatibility, including the reference's typo
# (reference: biahub/deconvolve.py:34 ``compute_tranfser_function``).
compute_tranfser_function = compute_transfer_function

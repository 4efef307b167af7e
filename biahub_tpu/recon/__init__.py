"""Computational microscopy reconstruction: the waveorder-equivalent core.

The reference delegates reconstruction to the waveorder package (reference:
biahub/compute_transfer_function.py:16-34, biahub/apply_inverse_transfer_
function.py:8-13). Here the same models are re-derived as JAX programs:

- fluorescence: widefield incoherent 3D OTF from the defocused-pupil
  autocorrelation + Tikhonov inverse filtering,
- phase: weak-object (Born) 3D phase transfer function from partially
  coherent brightfield (Streibl-style source/pupil correlation integrals
  computed as per-z FFT cross-correlations) + Tikhonov inverse,
- birefringence: Stokes inversion with the ideal 4/5-state instrument matrix
  → retardance / orientation / transmittance / degree of polarization.
"""

from biahub_tpu.recon.settings import ReconstructionSettings

__all__ = ["ReconstructionSettings"]

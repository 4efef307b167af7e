"""Dump the optimized HLO of the spectral step (CPU backend, interpret off)
to identify large copies by shape."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os
os.environ["BIAHUB_TPU_FORCE_PALLAS"] = "1"

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from biahub_tpu.kernels.chain import deconvolve_then_deskew
from biahub_tpu.kernels.deconvolve import compute_transfer_function
from biahub_tpu.kernels.pallas_fft import prepare_fourier_filter
from biahub_tpu.kernels.pallas_spectral import prepare_spectral_deskew

shape = (256, 256, 1024)
ANGLE, PX, AVG = 36.17, 0.371, 3
batch = 4
vol = jnp.zeros((batch,) + shape, jnp.float32)
psf = np.zeros((9, 9, 9), np.float32); psf[4, 4, 4] = 1.0
tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

def step(v, tf, prep, table):
    out = jax.vmap(
        lambda vv: deconvolve_then_deskew(
            vv, tf, 1e-3, ANGLE, PX, keep_overhang=False, average_window=AVG,
            prepared=prep, skip_flip=True, deskew_table=table,
        )
    )(v)
    return out, jnp.sum(out[:, 0, 0, :8])

prep = jax.eval_shape(lambda tf: prepare_fourier_filter(shape, (tf,), 1e-3), tf_half)
prep = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), prep)
table = prepare_spectral_deskew(shape, ANGLE, PX, False, AVG)
lowered = jax.jit(step).lower(vol, tf_half, prep, table)
txt = lowered.compile().as_text()
import re
for line in txt.splitlines():
    if re.search(r"copy", line) and "f32" in line:
        print(line.strip()[:220])

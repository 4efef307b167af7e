"""Trace the fused deconvolution on real TPU; print per-fusion device times."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from biahub_tpu.kernels.deconvolve import compute_transfer_function, deconvolve_zyx
from biahub_tpu.runtime.profiling import summarize_device_trace

shape = (256, 256, 1024)
batch = 4
rng = np.random.default_rng(0)
vol = rng.random((batch,) + shape, dtype=np.float32)
psf = np.exp(-np.sum(np.square(np.mgrid[-4:5, -4:5, -4:5] / 1.5), axis=0)).astype(
    np.float32
)
tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]


from biahub_tpu.kernels.pallas_fft import prepare_fourier_filter


@jax.jit
def decon_with_probe(v, tf, prep):
    out = jax.vmap(
        lambda vv: deconvolve_zyx(vv, tf, regularization_strength=1e-3, prepared=prep)
    )(v)
    return out, jnp.sum(out[:, 0, 0, :8])


vol_d = jax.device_put(vol)
tf_d = jax.device_put(tf_half)
prep_d = jax.jit(lambda tf: prepare_fourier_filter(shape, (tf,), 1e-3))(tf_d)
out, probe = decon_with_probe(vol_d, tf_d, prep_d)
float(probe)

trace_dir = "/tmp/deconv_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        out, probe = decon_with_probe(vol_d, tf_d, prep_d)
    float(probe)

summarize_device_trace(trace_dir, top=20)

"""Quick real-TPU timing probe for the fused deconvolution kernel only."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from biahub_tpu.kernels.deconvolve import compute_transfer_function, deconvolve_zyx

shape = (256, 256, 1024)
batch = 4
iters = 10
rng = np.random.default_rng(0)
vol = rng.random((batch,) + shape, dtype=np.float32)
psf = np.exp(
    -np.sum(np.square(np.mgrid[-4:5, -4:5, -4:5] / 1.5), axis=0)
).astype(np.float32)
tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]


from biahub_tpu.kernels.pallas_fft import prepare_fourier_filter


@jax.jit
def decon_with_probe(v, tf, prep):
    out = jax.vmap(
        lambda vv: deconvolve_zyx(
            vv, tf, regularization_strength=1e-3, prepared=prep
        )
    )(v)
    return out, jnp.sum(out[:, 0, 0, :8])


vol_d = jax.device_put(vol)
tf_d = jax.device_put(tf_half)
prep_d = jax.jit(lambda tf: prepare_fourier_filter(shape, (tf,), 1e-3))(tf_d)
t0 = time.perf_counter()
out, probe = decon_with_probe(vol_d, tf_d, prep_d)
float(probe)
print(f"compile+first run: {time.perf_counter() - t0:.1f} s", flush=True)

t0 = time.perf_counter()
for _ in range(iters):
    out, probe = decon_with_probe(vol_d, tf_d, prep_d)
float(probe)
ms = (time.perf_counter() - t0) * 1e3 / (iters * batch)
print(f"deconvolve_ms per volume: {ms:.2f}")

# numeric sanity vs XLA on a small shape
import os

small = jnp.asarray(rng.random((32, 64, 96), np.float32))
tfs = jnp.asarray(rng.random((32, 64, 49), np.float32))
got = np.asarray(deconvolve_zyx(small, tfs))
os.environ["BIAHUB_TPU_NO_PALLAS"] = "1"
jax.clear_caches()
want = np.asarray(deconvolve_zyx(small, tfs))
rel = np.abs(got - want).max() / np.abs(want).max()
print(f"small-shape parity vs XLA rfftn: max rel {rel:.2e}")

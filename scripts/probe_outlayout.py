"""Does pinning the chain jit's output layout to default kill copy.32?"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.layout import Format, Layout

from biahub_tpu.kernels.deconvolve import compute_transfer_function
from biahub_tpu.kernels.pallas_fft import prepare_fourier_filter

shape = (256, 256, 1024)
batch = 4
rng = np.random.default_rng(0)
vol = rng.random((batch,) + shape, dtype=np.float32)
psf = np.exp(-np.sum(np.square(np.mgrid[-4:5, -4:5, -4:5] / 1.5), axis=0)).astype(
    np.float32
)
tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

theta = np.deg2rad(2.0)
reg_stab = np.eye(4, dtype=np.float32)
reg_stab[1:3, 1:3] = 1.01 * np.array(
    [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]], np.float32
)
reg_stab[:3, 3] = [0.5, -1.25, 2.0]


def full_chain(v, tf, prep):
    from biahub_tpu.kernels.chain import deconvolve_deskew_warp

    return deconvolve_deskew_warp(
        v, tf, 1e-3, 36.17, 0.371, reg_stab,
        keep_overhang=False, average_window=3, prepared=prep,
    )


def chain_with_probe(v, tf, prep):
    out = jax.vmap(full_chain, in_axes=(0, None, None))(v, tf, prep)
    return out, jnp.sum(out[:, 0, 0, :8])


vol_d = jax.device_put(vol)
tf_d = jax.device_put(tf_half)
prep_d = jax.jit(lambda tf: prepare_fourier_filter(shape, (tf,), 1e-3))(tf_d)

dev = jax.devices()[0]
sds = jax.sharding.SingleDeviceSharding(dev)
pinned = jax.jit(
    chain_with_probe,
    out_shardings=(
        Format(Layout(major_to_minor=(0, 1, 2, 3)), sds),
        Format(None, sds),
    ),
)
t0 = time.perf_counter()
out, probe = pinned(vol_d, tf_d, prep_d)
float(probe)
print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)

t0 = time.perf_counter()
for _ in range(5):
    out, probe = pinned(vol_d, tf_d, prep_d)
float(probe)
ms = (time.perf_counter() - t0) * 1e3 / (5 * batch)
print(f"chain ms/volume (default out layout pinned): {ms:.2f}")

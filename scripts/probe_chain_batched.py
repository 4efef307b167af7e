"""Real-chip A/B: vmapped chain vs the batched (manual-DMA deskew) chain."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from biahub_tpu.kernels.chain import (
    deconvolve_deskew_warp,
    deconvolve_deskew_warp_batched,
)
from biahub_tpu.kernels.deconvolve import compute_transfer_function
from biahub_tpu.kernels.pallas_fft import (
    deconvolve_pallas_supported,
    prepare_fourier_filter,
)

shape = (256, 256, 1024)
batch = 8
ls, px = 36.17, 0.371
rng = np.random.default_rng(0)
vol = rng.random((batch,) + shape, dtype=np.float32)
psf = np.exp(-np.sum(np.square(np.mgrid[-4:5, -4:5, -4:5] / 1.5), axis=0)).astype(
    np.float32
)
tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]
theta = np.deg2rad(2.0)
m = np.eye(4, dtype=np.float32)
m[1:3, 1:3] = 1.01 * np.array(
    [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]], np.float32
)
m[:3, 3] = [0.5, -1.25, 2.0]

from jax.experimental.layout import Format, Layout

sds = jax.sharding.SingleDeviceSharding(jax.devices()[0])


def pinned(fn):
    return jax.jit(
        fn,
        out_shardings=(Format(Layout((0, 1, 2, 3)), sds), Format(None, sds)),
    )


def chain_vmap(v, tf, prep):
    out = jax.vmap(
        lambda vv: deconvolve_deskew_warp(
            vv, tf, 1e-3, ls, px, m, keep_overhang=False, average_window=3,
            prepared=prep,
        )
    )(v)
    return out, jnp.sum(out[:, 0, 0, :8])


def chain_batched(v, tf, prep):
    out = deconvolve_deskew_warp_batched(
        v, tf, 1e-3, ls, px, m, keep_overhang=False, average_window=3,
        prepared=prep,
    )
    return out, jnp.sum(out[:, 0, 0, :8])


vol_d = jax.device_put(vol)
tf_d = jax.device_put(tf_half)
assert deconvolve_pallas_supported(shape)
prep_d = jax.jit(lambda tf: prepare_fourier_filter(shape, (tf,), 1e-3))(tf_d)


def timed(fn, name, iters=10, windows=5):
    f = pinned(fn)
    out, probe = f(vol_d, tf_d, prep_d)
    p0 = float(probe)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(vol_d, tf_d, prep_d)
        float(out[1])
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / (iters * batch)
    print(f"{name}: {ms:.3f} ms/vol  (probe {p0:.4f})")
    return ms, p0


t_b, p_b = timed(chain_batched, "chain_batched")
t_v, p_v = timed(chain_vmap, "chain_vmap   ")
print(f"delta: {t_v - t_b:.3f} ms/vol; probes equal: {p_b == p_v}")


# Full-array parity, reduced on device (the tunnel is too slow for a 1.4 GB
# fetch): max |diff| over the whole batch.
@jax.jit
def _maxdiff(v, tf, prep):
    a, _ = chain_batched(v, tf, prep)
    b, _ = chain_vmap(v, tf, prep)
    return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(b))

d, scale = _maxdiff(vol_d, tf_d, prep_d)
print(f"max abs diff {float(d):.3e}  (scale {float(scale):.3e})")

"""Trace the full 4-step chain (deconvolve+deskew+reg/stab warp) on TPU."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from biahub_tpu.kernels.deconvolve import compute_transfer_function, deconvolve_zyx
from biahub_tpu.kernels.deskew import deskew_zyx
from biahub_tpu.kernels.affine import affine_warp_auto
from biahub_tpu.runtime.profiling import summarize_device_trace

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


def _chain_with_probe(v, tf, prep):
    # Batched entry (manual-DMA deskew + warp stages), the bench/BatchRunner
    # route; falls back to an internal vmap off the handoff gate.
    from biahub_tpu.kernels.chain import deconvolve_deskew_warp_batched

    out = deconvolve_deskew_warp_batched(
        v, tf, 1e-3, 36.17, 0.371, reg_stab,
        keep_overhang=False, average_window=3, prepared=prep,
    )
    return out, jnp.sum(out[:, 0, 0, :8])


# Pin result layouts to row-major like bench.py/BatchRunner: XLA otherwise
# picks a zero-padding layout and adds a ~1 ms/vol copy after the last
# Pallas kernel (scripts/probe_outlayout.py).
from jax.experimental.layout import Format, Layout

_sds = jax.sharding.SingleDeviceSharding(jax.devices()[0])
chain_with_probe = jax.jit(
    _chain_with_probe,
    out_shardings=(Format(Layout((0, 1, 2, 3)), _sds), Format(None, _sds)),
)


vol_d = jax.device_put(vol)
tf_d = jax.device_put(tf_half)
from biahub_tpu.kernels.pallas_fft import prepare_fourier_filter
prep_d = jax.jit(lambda tf: prepare_fourier_filter(shape, (tf,), 1e-3))(tf_d)
t0 = time.perf_counter()
out, probe = chain_with_probe(vol_d, tf_d, prep_d)
float(probe)
print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)

t0 = time.perf_counter()
for _ in range(5):
    out, probe = chain_with_probe(vol_d, tf_d, prep_d)
float(probe)
ms = (time.perf_counter() - t0) * 1e3 / (5 * batch)
print(f"chain ms/volume: {ms:.2f}", flush=True)

trace_dir = "/tmp/chain_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        out, probe = chain_with_probe(vol_d, tf_d, prep_d)
    float(probe)

summarize_device_trace(trace_dir, top=30)

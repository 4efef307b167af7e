"""Trace the fused spectral deconvolve+deskew step on TPU (per-fusion device
times), to localize the gap vs the pass-C handoff composition."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from biahub_tpu.kernels.chain import deconvolve_then_deskew
from biahub_tpu.kernels.deconvolve import compute_transfer_function
from biahub_tpu.kernels.pallas_fft import prepare_fourier_filter
from biahub_tpu.kernels.pallas_spectral import prepare_spectral_deskew
from biahub_tpu.runtime.profiling import summarize_device_trace

shape = (256, 256, 1024)
ANGLE, PX, AVG = 36.17, 0.371, 3
batch = 4
rng = np.random.default_rng(0)
vol = rng.random((batch,) + shape, dtype=np.float32)
psf = np.exp(-np.sum(np.square(np.mgrid[-4:5, -4:5, -4:5] / 1.5), axis=0)).astype(
    np.float32
)
tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]


def _step(v, tf, prep, table):
    out = jax.vmap(
        lambda vv: deconvolve_then_deskew(
            vv, tf, 1e-3, ANGLE, PX, keep_overhang=False, average_window=AVG,
            prepared=prep, skip_flip=True, deskew_table=table,
        )
    )(v)
    return out, jnp.sum(out[:, 0, 0, :8])


# Pin the result layout to row-major (as bench.py / the BatchRunner do) so
# the trace matches production: XLA otherwise copies the final Pallas output
# into a zero-padding layout.
from jax.experimental.layout import Format, Layout

_sds = jax.sharding.SingleDeviceSharding(jax.devices()[0])
step = jax.jit(
    _step,
    out_shardings=(Format(Layout((0, 1, 2, 3)), _sds), Format(None, _sds)),
)


vol_d = jax.device_put(vol)
tf_d = jax.device_put(tf_half)
prep_d = jax.jit(lambda tf: prepare_fourier_filter(shape, (tf,), 1e-3))(tf_d)
table_d = jax.device_put(prepare_spectral_deskew(shape, ANGLE, PX, False, AVG))
t0 = time.perf_counter()
out, probe = step(vol_d, tf_d, prep_d, table_d)
float(probe)
print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)

t0 = time.perf_counter()
for _ in range(5):
    out, probe = step(vol_d, tf_d, prep_d, table_d)
float(probe)
ms = (time.perf_counter() - t0) * 1e3 / (5 * batch)
print(f"spectral ms/volume: {ms:.2f}", flush=True)

trace_dir = "/tmp/spectral_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        out, probe = step(vol_d, tf_d, prep_d, table_d)
    float(probe)

summarize_device_trace(trace_dir, top=30)

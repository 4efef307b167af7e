"""Real-chip probe for the fused spectral deconvolve+deskew engine.

Compares the spectral route against the pass-C handoff composition at the
flagship FOV (parity + steady-state per-volume time at batch 4). Run on the
TPU: `python scripts/probe_spectral.py`.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from biahub_tpu.kernels.chain import deconvolve_then_deskew
from biahub_tpu.kernels.deconvolve import compute_transfer_function
from biahub_tpu.kernels.pallas_fft import prepare_fourier_filter
from biahub_tpu.kernels.pallas_spectral import (
    prepare_spectral_deskew,
    spectral_deskew_supported,
)

SHAPE = (256, 256, 1024)
ANGLE, PX, AVG = 36.17, 0.371, 3
BATCH = 4


def main():
    print("device:", jax.devices()[0])
    assert spectral_deskew_supported(SHAPE, ANGLE, PX, False, AVG)
    rng = np.random.default_rng(0)
    vol = rng.random((BATCH,) + SHAPE, dtype=np.float32)
    psf = np.exp(
        -np.sum(np.square(np.mgrid[-4:5, -4:5, -4:5] / 1.5), axis=0)
    ).astype(np.float32)
    tf_half = compute_transfer_function(psf, SHAPE)[..., : SHAPE[-1] // 2 + 1]

    vol_d = jax.device_put(vol)
    tf_d = jax.device_put(tf_half)
    prep_d = jax.jit(lambda tf: prepare_fourier_filter(SHAPE, (tf,), 1e-3))(tf_d)
    t0 = time.perf_counter()
    table = prepare_spectral_deskew(SHAPE, ANGLE, PX, False, AVG)
    print(f"table build {time.perf_counter() - t0:.1f}s shape {table.mr.shape}")
    table_d = jax.device_put(table)

    from jax.experimental.layout import Format, Layout

    sds = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def pinned(fn):
        return jax.jit(fn, out_shardings=(Format(Layout((0, 1, 2, 3)), sds),
                                          Format(None, sds)))

    def spectral(v, tf, prep, table):
        # tf/prep/table MUST be jit arguments: closed-over device arrays
        # become HLO constants and the ~250 MB table blows the remote
        # compiler's request limit (HTTP 413; measured).
        out = jax.vmap(
            lambda vv: deconvolve_then_deskew(
                vv, tf, 1e-3, ANGLE, PX, keep_overhang=False,
                average_window=AVG, prepared=prep, skip_flip=True,
                deskew_table=table,
            ),
        )(v)
        return out, jnp.sum(out[:, 0, 0, :8])

    import os

    def run(fn, name):
        t0 = time.perf_counter()
        out, probe = fn(vol_d, tf_d, prep_d, table_d)
        float(probe)
        print(f"{name} compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(10):
            out, probe = fn(vol_d, tf_d, prep_d, table_d)
        float(probe)
        ms = (time.perf_counter() - t0) * 1e3 / (10 * BATCH)
        print(f"{name}: {ms:.2f} ms/volume", flush=True)
        return np.asarray(out[0])

    got = run(pinned(spectral), "spectral")

    os.environ["BIAHUB_TPU_SPECTRAL_DESKEW"] = "0"
    jax.clear_caches()
    want = run(pinned(spectral), "handoff ")
    scale = np.abs(want).max()
    rel = np.abs(got - want).max() / scale
    print(f"parity max rel {rel:.2e} (scale {scale:.3f})")


if __name__ == "__main__":
    main()

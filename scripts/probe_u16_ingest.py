"""Real-chip probe: native uint16 ingest through pass A vs f32 input.

Measures the fused deconvolve+deskew chain (the bench headline program) on
the flagship FOV fed (a) f32 volumes, (b) uint16 volumes with the in-VMEM
pass-A convert — plus parity. The u16 path should save ~the pass-A input
read halving (~0.16 ms/vol) in a steady-state batch; in the BatchRunner it
additionally removes the XLA cast pass (a full volume read+write).
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

SHAPE = (256, 256, 1024)
BATCH = 8
ITERS = 10


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 60000, size=(BATCH,) + SHAPE).astype(np.uint16)
    psf = np.exp(
        -np.sum(np.square(np.mgrid[-4:5, -4:5, -4:5] / 1.5), axis=0)
    ).astype(np.float32)
    tf_half = compute_transfer_function(psf, SHAPE)[..., : SHAPE[-1] // 2 + 1]
    tf_d = jax.device_put(tf_half)
    prep_d = jax.jit(lambda tf: prepare_fourier_filter(SHAPE, (tf,), 1e-3))(
        tf_d
    )

    from jax.experimental.layout import Format, Layout

    sds = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def step_fn(v, tf, prep):
        out = jax.vmap(
            lambda vv, t, p: deconvolve_then_deskew(
                vv, t, 1e-3, 36.17, 0.371, keep_overhang=False,
                average_window=3, prepared=p, skip_flip=True,
            ),
            in_axes=(0, None, None),
        )(v, tf, prep)
        return out, jnp.sum(out[:, 0, 0, :8])

    step = jax.jit(
        step_fn,
        out_shardings=(Format(Layout((0, 1, 2, 3)), sds), Format(None, sds)),
    )

    results = {}
    for name, vols in (
        ("f32 ", raw.astype(np.float32)),
        ("u16 ", raw),
    ):
        vol_d = jax.device_put(vols)
        t0 = time.perf_counter()
        out, probe = step(vol_d, tf_d, prep_d)
        float(probe)
        print(f"{name} compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out, probe = step(vol_d, tf_d, prep_d)
            float(probe)
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / (ITERS * BATCH)
        print(f"{name}: {ms:.3f} ms/vol", flush=True)
        results[name] = np.asarray(out[0])

    diff = np.abs(results["u16 "] - results["f32 "]).max()
    print(f"max abs diff u16 vs f32: {diff:.3e} (expect 0.0 — exact convert)",
          flush=True)


if __name__ == "__main__":
    main()

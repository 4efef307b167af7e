"""Probe headline-step batch-size amortization on the real chip: the
per-dispatch tunnel overhead (~2.5-3 ms) divides by the batch; HBM bounds
the ceiling. Informs the production BIAHUB_TPU_MAX_BATCH_BYTES guidance."""
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
ANGLE, PX = 36.17, 0.371

def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    psf = np.exp(
        -np.sum(np.square(np.mgrid[-4:5, -4:5, -4:5] / 1.5), axis=0)
    ).astype(np.float32)
    tf_half = compute_transfer_function(psf, SHAPE)[..., : SHAPE[-1] // 2 + 1]
    tf_d = jax.device_put(tf_half)
    prep_d = jax.jit(lambda tf: prepare_fourier_filter(SHAPE, (tf,), 1e-3))(tf_d)

    from jax.experimental.layout import Format, Layout
    sds = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def fused(v, tf, prep):
        out = jax.vmap(
            lambda vv: deconvolve_then_deskew(
                vv, tf, 1e-3, ANGLE, PX, keep_overhang=False,
                average_window=3, prepared=prep, skip_flip=True,
            )
        )(v)
        return out, jnp.sum(out[:, 0, 0, :8])

    for batch in (8, 12, 16):
        try:
            vol = rng.random((batch,) + SHAPE, dtype=np.float32)
            vol_d = jax.device_put(vol)
            step = jax.jit(fused, out_shardings=(
                Format(Layout((0, 1, 2, 3)), sds), Format(None, sds)))
            t0 = time.perf_counter()
            out, probe = step(vol_d, tf_d, prep_d)
            float(probe)
            print(f"batch {batch}: compile+first {time.perf_counter()-t0:.1f}s",
                  flush=True)
            iters = 80 // batch
            t0 = time.perf_counter()
            for _ in range(iters):
                out, probe = step(vol_d, tf_d, prep_d)
            float(probe)
            ms = (time.perf_counter() - t0) * 1e3 / (iters * batch)
            print(f"batch {batch}: {ms:.2f} ms/volume", flush=True)
            del vol_d, out
        except Exception as e:  # noqa: BLE001 - HBM OOM expected at the top end
            print(f"batch {batch}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

if __name__ == "__main__":
    main()

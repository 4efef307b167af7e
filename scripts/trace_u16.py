"""Device-time split: where does the u16-native pass A lose its 0.48 ms?

probe_u16_ingest measured the fused step at 5.195 ms/vol (f32 resident) vs
5.675 (uint16 resident, in-VMEM convert) — the OPPOSITE sign of the
expected ~0.16 ms input-read halving. Candidates: (a) the int16 -> f32
convert pays a sublane unpack relayout inside pass A (i16 tiles are
(16,128) packed, f32 (8,128)); (b) XLA materializes the u16 -> i16 bitcast
as a real copy before the pallas_call. The trace separates them: (a) shows
up as pass-A fusion time inflation, (b) as a standalone copy/fusion op.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from biahub_tpu.kernels.deconvolve import compute_transfer_function, deconvolve_zyx
from biahub_tpu.kernels.pallas_fft import prepare_fourier_filter
from biahub_tpu.runtime.profiling import summarize_device_trace

SHAPE = (256, 256, 1024)
BATCH = 4
ITERS = 5


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

    def decon(v, tf, prep):
        out = jax.vmap(
            lambda vv: deconvolve_zyx(
                vv, tf, regularization_strength=1e-3, prepared=prep
            )
        )(v)
        return out, jnp.sum(out[:, 0, 0, :8])

    step = jax.jit(
        decon,
        out_shardings=(Format(Layout((0, 1, 2, 3)), sds), Format(None, sds)),
    )

    for name, vols in (("f32", raw.astype(np.float32)), ("u16", raw)):
        vol_d = jax.device_put(vols)
        t0 = time.perf_counter()
        out, probe = step(vol_d, tf_d, prep_d)
        float(probe)
        print(f"[{name}] compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out, probe = step(vol_d, tf_d, prep_d)
            float(probe)
            best = min(best, time.perf_counter() - t0)
        print(f"[{name}] wall {best * 1e3 / (ITERS * BATCH):.3f} ms/vol",
              flush=True)
        td = f"/tmp/u16_trace_{name}"
        with jax.profiler.trace(td):
            for _ in range(ITERS):
                out, probe = step(vol_d, tf_d, prep_d)
            float(probe)
        print(f"--- {name} per-fusion device ms (over {ITERS * BATCH} vols)",
              flush=True)
        summarize_device_trace(td, top=12, file=sys.stdout)


if __name__ == "__main__":
    main()

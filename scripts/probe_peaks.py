"""Real-chip probe: fused Pallas peaks kernel vs the XLA formulation at the
flagship FOV (the bench peaks_kernel_ms configuration)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from biahub_tpu.kernels.pallas_peaks import block_max_candidates_pallas
from biahub_tpu.kernels.peaks import _block_max_candidates_xla

SHAPE = (256, 256, 1024)

def run(fn, vol_d, name):
    t0 = time.perf_counter()
    v, i = fn(vol_d)
    float(v[0]); int(i[0])
    print(f"{name} compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        v, i = fn(vol_d)
    float(v[0])
    print(f"{name}: {(time.perf_counter()-t0)*1e3/20:.2f} ms", flush=True)
    return np.asarray(v), np.asarray(i)

def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    vol = (10.0 * rng.random(SHAPE)).astype(np.float32)
    vol_d = jax.device_put(jnp.asarray(vol))
    float(vol_d[0, 0, 0])
    gv, gi = run(lambda v: block_max_candidates_pallas(v, blur_kernel_size=3),
                 vol_d, "pallas")
    wv, wi = run(lambda v: _block_max_candidates_xla(v, (8, 8, 8), 3),
                 vol_d, "xla   ")
    print("values max rel diff:",
          np.abs(gv - wv).max() / max(np.abs(wv).max(), 1e-12), flush=True)
    print("idx mismatches:", int((gi != wi).sum()), "/", gi.size, flush=True)

def main_big():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    shape = (64, 2048, 2048)
    vol = (10.0 * rng.random(shape)).astype(np.float32)
    vol_d = jax.device_put(jnp.asarray(vol))
    float(vol_d[0, 0, 0])
    gv, gi = run(lambda v: block_max_candidates_pallas(v, blur_kernel_size=3),
                 vol_d, "pallas 2048^2")
    wv, wi = run(lambda v: _block_max_candidates_xla(v, (8, 8, 8), 3),
                 vol_d, "xla    2048^2")
    print("idx mismatches:", int((gi != wi).sum()), "/", gi.size, flush=True)


if __name__ == "__main__":
    main()
    main_big()

"""Device-time split for the camera-frame peaks path (VERDICT r4 weak #3).

The flagship peaks path got the full trace treatment in round 4 (device
1.03 ms vs wall 2.65 at queue depth 20); the camera-frame geometry
(64 x 2048 x 2048 — the estimate-psf acquisition, reference:
biahub/characterize_psf.py:562-710) only had a wall number (10.39 ms at
queue depth 10). This traces the same `_block_max_topk` program and prints
per-fusion device times so kernel slack vs queue/tunnel overhead is
settled by measurement (read floor ~1.3 ms at 819 GB/s for the 1 GiB
volume + top-k).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from biahub_tpu.kernels.peaks import _block_max_topk
from biahub_tpu.runtime.profiling import summarize_device_trace

SHAPE = (64, 2048, 2048)
ITERS = 10


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    vol_d = jax.device_put(
        jnp.asarray((10.0 * rng.random(SHAPE)).astype(np.float32))
    )
    float(vol_d[0, 0, 0])

    t0 = time.perf_counter()
    v, i = _block_max_topk(vol_d, (8, 8, 8), 3, 500)
    float(v[0])
    print(f"compile+first {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        v, i = _block_max_topk(vol_d, (8, 8, 8), 3, 500)
    float(v[0])
    wall = (time.perf_counter() - t0) * 1e3 / ITERS
    print(f"wall (queue depth {ITERS}): {wall:.2f} ms/iter", flush=True)

    trace_dir = "/tmp/peaks_camera_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(ITERS):
            v, i = _block_max_topk(vol_d, (8, 8, 8), 3, 500)
        float(v[0])
    rows = summarize_device_trace(trace_dir, top=25, file=sys.stdout)
    # The outer jit span nests every inner op: it IS the per-iter device
    # time (summing rows would double-count).
    outer = max(ms for name, ms, _ in rows if name.startswith("jit_"))
    print(f"device (outer jit span): {outer / ITERS:.2f} ms/iter "
          f"(wall {wall:.2f})", flush=True)


if __name__ == "__main__":
    main()

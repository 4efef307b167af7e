"""Time the in-plane (register∘stabilize) warp at the chain's deskewed shape."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from biahub_tpu.deskew import get_deskewed_data_shape
from biahub_tpu.kernels.affine import affine_warp_auto

shape, _ = get_deskewed_data_shape((256, 256, 1024), 36.17, 0.371, keep_overhang=False)
shape = tuple(int(s) for s in shape)
print("deskewed shape:", shape, flush=True)

theta = np.deg2rad(2.0)
reg_stab = np.eye(4, dtype=np.float32)
reg_stab[1:3, 1:3] = 1.01 * np.array(
    [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]], np.float32
)
reg_stab[:3, 3] = [0.5, -1.25, 2.0]

batch = 4
rng = np.random.default_rng(0)
vol = rng.random((batch,) + tuple(shape), dtype=np.float32)


@jax.jit
def warp_with_probe(v):
    out = jax.vmap(lambda vv: affine_warp_auto(vv, reg_stab, tuple(shape)))(v)
    return out, jnp.sum(out[:, 0, 0, :8])


vol_d = jax.device_put(vol)
t0 = time.perf_counter()
out, probe = warp_with_probe(vol_d)
float(probe)
print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)

for trial in range(2):
    t0 = time.perf_counter()
    for _ in range(5):
        out, probe = warp_with_probe(vol_d)
    float(probe)
    ms = (time.perf_counter() - t0) * 1e3 / (5 * batch)
    print(f"inplane warp ms/volume: {ms:.3f}", flush=True)

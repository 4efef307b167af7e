import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from biahub_tpu.kernels.affine import affine_warp_auto
from biahub_tpu.runtime.profiling import summarize_device_trace

shape = (256, 1024, 484)
theta = np.deg2rad(2.0)
reg_stab = np.eye(4, dtype=np.float32)
reg_stab[1:3, 1:3] = 1.01 * np.array(
    [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]], np.float32)
reg_stab[:3, 3] = [0.5, -1.25, 2.0]
batch = 4
vol = np.random.default_rng(0).random((batch,) + shape, dtype=np.float32)

@jax.jit
def warp_with_probe(v):
    out = jax.vmap(lambda vv: affine_warp_auto(vv, reg_stab, shape))(v)
    return out, jnp.sum(out[:, 0, 0, :8])

vol_d = jax.device_put(vol)
out, probe = warp_with_probe(vol_d)
float(probe)
with jax.profiler.trace("/tmp/warp_trace"):
    for _ in range(3):
        out, probe = warp_with_probe(vol_d)
    float(probe)
summarize_device_trace("/tmp/warp_trace", top=15)

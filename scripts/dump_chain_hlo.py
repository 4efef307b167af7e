"""Dump the optimized HLO of the fused chain; print copy/pad/slice op shapes."""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from biahub_tpu.kernels.deconvolve import compute_transfer_function

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


def full_chain(v, tf):
    from biahub_tpu.kernels.chain import deconvolve_deskew_warp

    return deconvolve_deskew_warp(
        v, tf, 1e-3, 36.17, 0.371, reg_stab,
        keep_overhang=False, average_window=3,
    )


@jax.jit
def chain_with_probe(v, tf):
    out = jax.vmap(full_chain, in_axes=(0, None))(v, tf)
    return out, jnp.sum(out[:, 0, 0, :8])


txt = (
    chain_with_probe.lower(jnp.asarray(vol), jnp.asarray(tf_half))
    .compile()
    .as_text()
)
print(f"HLO: {len(txt)} chars")
for line in txt.splitlines():
    s = line.strip()
    m = re.match(r"%?((copy|pad|slice|bitcast|transpose)[.\w]*) = (\S+) (copy|pad|slice|transpose)\(", s)
    if m:
        print(s[:220])

"""Quick real-TPU timing of the 4-step chain + standalone deskew."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from biahub_tpu.kernels.deconvolve import compute_transfer_function, deconvolve_zyx
from biahub_tpu.kernels.deskew import deskew_zyx
from biahub_tpu.kernels.affine import affine_warp_auto

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
    decon = deconvolve_zyx(v, tf, regularization_strength=1e-3)
    deskewed = deskew_zyx(
        decon, ls_angle_deg=36.17, px_to_scan_ratio=0.371,
        keep_overhang=False, average_window=3,
    )
    return affine_warp_auto(deskewed, reg_stab, deskewed.shape)


@jax.jit
def chain_with_probe(v, tf):
    out = jax.vmap(full_chain, in_axes=(0, None))(v, tf)
    return out, jnp.sum(out[:, 0, 0, :8])


@jax.jit
def deskew_with_probe(v):
    out = jax.vmap(
        lambda vv: deskew_zyx(
            vv, ls_angle_deg=36.17, px_to_scan_ratio=0.371,
            keep_overhang=False, average_window=3,
        )
    )(v)
    return out, jnp.sum(out[:, 0, 0, :8])


vol_d = jax.device_put(vol)
tf_d = jax.device_put(tf_half)

t0 = time.perf_counter()
out, probe = deskew_with_probe(vol_d)
float(probe)
print(f"deskew compile: {time.perf_counter() - t0:.0f} s", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    out, probe = deskew_with_probe(vol_d)
float(probe)
print(f"deskew ms/volume: {(time.perf_counter() - t0) * 1e3 / 40:.2f}", flush=True)

t0 = time.perf_counter()
out, probe = chain_with_probe(vol_d, tf_d)
float(probe)
print(f"chain compile: {time.perf_counter() - t0:.0f} s", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    out, probe = chain_with_probe(vol_d, tf_d)
float(probe)
print(f"chain ms/volume: {(time.perf_counter() - t0) * 1e3 / 40:.2f}")

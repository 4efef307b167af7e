"""Staged (eager) compile probe for the spectral engine on the real chip.

Runs deconvolve_deskew_zyx_spectral OUTSIDE jit so each pallas_call
compiles and executes as its own program, isolating which pass the remote
compiler struggles with. Prints (unbuffered: run with python -u).
"""

import time

import jax
import numpy as np

SHAPE = (256, 256, 1024)
ANGLE, PX, AVG = 36.17, 0.371, 3


def main():
    t_all = time.time()
    print("device:", jax.devices()[0], flush=True)
    import jax.numpy as jnp

    from biahub_tpu.kernels.deconvolve import compute_transfer_function
    from biahub_tpu.kernels.pallas_spectral import (
        deconvolve_deskew_zyx_spectral,
        prepare_spectral_deskew,
        spectral_deskew_supported,
    )

    assert spectral_deskew_supported(SHAPE, ANGLE, PX, False, AVG)
    rng = np.random.default_rng(0)
    vol = rng.random(SHAPE, dtype=np.float32)
    psf = np.exp(
        -np.sum(np.square(np.mgrid[-4:5, -4:5, -4:5] / 1.5), axis=0)
    ).astype(np.float32)
    tf_half = compute_transfer_function(psf, SHAPE)[..., : SHAPE[-1] // 2 + 1]
    t0 = time.time()
    table = prepare_spectral_deskew(SHAPE, ANGLE, PX, False, AVG)
    print(f"table build {time.time() - t0:.1f}s", flush=True)
    vol_d = jax.device_put(jnp.asarray(vol))
    tf_d = jax.device_put(jnp.asarray(tf_half))
    table_d = jax.device_put(table)
    float(table_d.mr[0, 0, 0])
    print(f"uploads done {time.time() - t_all:.1f}s", flush=True)

    # Eager call: every pallas_call inside compiles as its own program.
    t0 = time.time()
    out = deconvolve_deskew_zyx_spectral(
        vol_d, tf_d, 1e-3, ls_angle_deg=ANGLE, px_to_scan_ratio=PX,
        keep_overhang=False, average_window=AVG, deskew_table=table_d,
    )
    probe = float(out[0, 0, 0])
    print(f"eager spectral run {time.time() - t0:.1f}s probe {probe:.4f}",
          flush=True)

    # Compare against the eager composition.
    from biahub_tpu.kernels.deconvolve import deconvolve_zyx
    from biahub_tpu.kernels.deskew import deskew_zyx

    t0 = time.time()
    decon = deconvolve_zyx(vol_d, tf_d, regularization_strength=1e-3)
    want = deskew_zyx(
        decon, ls_angle_deg=ANGLE, px_to_scan_ratio=PX, keep_overhang=False,
        average_window=AVG, skip_flip=True,
    )
    float(want[0, 0, 0])
    print(f"eager composition run {time.time() - t0:.1f}s", flush=True)
    g = np.asarray(out)
    w = np.asarray(want)
    rel = np.abs(g - w).max() / np.abs(w).max()
    print(f"parity max rel {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: fused deconvolve+deskew throughput on one chip.

Measures the headline metric from BASELINE.json — voxels/sec/chip for the
reconstruction core (Tikhonov deconvolution + light-sheet deskew) on a
mantis-like light-sheet FOV — and prints ONE JSON line.

Baseline: the reference processes one ZYX volume on a 16-CPU Slurm node in
~0.24 min (deskew, reference: biahub/deskew.py:691-697) plus ~0.75 min
(FFT-based deconvolution, mid-range of the 0.14-1.51 min/vol observed for
reconstruction, reference: biahub/apply_inverse_transfer_function.py:121-131),
i.e. ~60 s per (t, c) volume for this two-step chain. vs_baseline is the
speedup of one chip over that rate, normalized per raw voxel.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--z", type=int, default=256, help="raw scan steps")
    parser.add_argument("--y", type=int, default=256, help="raw tilted axis")
    parser.add_argument("--x", type=int, default=1024, help="raw coverslip axis")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()

    import jax

    from biahub_tpu.kernels.deconvolve import compute_transfer_function, deconvolve_zyx
    from biahub_tpu.kernels.deskew import deskew_zyx

    shape = (args.z, args.y, args.x)
    rng = np.random.default_rng(0)
    vol = rng.random((args.batch,) + shape, dtype=np.float32)
    psf = np.exp(
        -np.sum(np.square(np.mgrid[-4:5, -4:5, -4:5] / 1.5), axis=0)
    ).astype(np.float32)
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

    ls_angle_deg, px_to_scan_ratio = 36.17, 0.371

    from biahub_tpu.kernels.affine import affine_warp_auto

    # register + stabilize compose into ONE in-plane warp: small in-plane
    # rotation/scale (registration) times a per-timepoint translation.
    theta = np.deg2rad(2.0)
    reg_stab = np.eye(4, dtype=np.float32)
    reg_stab[1:3, 1:3] = 1.01 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        np.float32,
    )
    reg_stab[:3, 3] = [0.5, -1.25, 2.0]

    def fused(v, tf):
        decon = deconvolve_zyx(v, tf, regularization_strength=1e-3)
        return deskew_zyx(
            decon,
            ls_angle_deg=ls_angle_deg,
            px_to_scan_ratio=px_to_scan_ratio,
            keep_overhang=False,
            average_window=3,
        )

    def full_chain(v, tf):
        deskewed = fused(v, tf)
        # reg_stab is concrete, so the auto dispatch picks the Pallas
        # in-plane shear-resample kernel on TPU.
        return affine_warp_auto(deskewed, reg_stab, deskewed.shape)

    def step_with_probe(v, tf):
        out = jax.vmap(fused, in_axes=(0, None))(v, tf)
        # The probe scalar forces real device completion when fetched:
        # block_until_ready is not reliable over remote-attached devices.
        return out, jnp.sum(out[:, 0, 0, :8])

    import jax.numpy as jnp

    step = jax.jit(step_with_probe)
    vol_d = jax.device_put(vol)
    tf_d = jax.device_put(tf_half)

    # Warm-up compile, then force completion via a host fetch.
    out, probe = step(vol_d, tf_d)
    float(probe)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out, probe = step(vol_d, tf_d)
    # Device execution is ordered, so fetching the last probe waits for all.
    float(probe)
    elapsed = time.perf_counter() - t0

    # End-to-end chain (deconvolve + deskew + register∘stabilize warp)
    def chain_with_probe(v, tf):
        out = jax.vmap(full_chain, in_axes=(0, None))(v, tf)
        return out, jnp.sum(out[:, 0, 0, :8])

    chain = jax.jit(chain_with_probe)
    out, probe = chain(vol_d, tf_d)
    float(probe)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out, probe = chain(vol_d, tf_d)
    float(probe)
    chain_elapsed = time.perf_counter() - t0

    n_volumes = args.iters * args.batch
    sec_per_volume = elapsed / n_volumes
    chain_sec_per_volume = chain_elapsed / n_volumes
    voxels = int(np.prod(shape))
    voxels_per_sec = voxels / sec_per_volume

    baseline_sec_per_volume = 60.0  # 16-CPU Slurm node, deskew+deconvolve chain
    # Normalize the baseline to this FOV's voxel count: the reference's
    # calibration volumes are of the same class (mantis light-sheet FOV).
    vs_baseline = baseline_sec_per_volume / sec_per_volume
    # Full chain baseline: ~2 min/volume per BASELINE.md's derived
    # deconvolve+deskew+register+stabilize estimate (1-3 min/volume).
    chain_vs_baseline = 120.0 / chain_sec_per_volume

    print(
        json.dumps(
            {
                "metric": "deconvolve+deskew voxels/sec/chip",
                "value": round(voxels_per_sec, 1),
                "unit": "voxel/s",
                "vs_baseline": round(vs_baseline, 2),
                "detail": {
                    "fov_zyx": list(shape),
                    "sec_per_volume": round(sec_per_volume, 4),
                    "e2e_chain_sec_per_volume": round(chain_sec_per_volume, 4),
                    "e2e_chain_vs_baseline": round(chain_vs_baseline, 2),
                    "device": str(jax.devices()[0]),
                    "baseline": "16-CPU Slurm node @ ~60 s/volume for deskew+deconvolve; "
                    "~120 s/volume for the 4-step chain",
                },
            }
        )
    )


if __name__ == "__main__":
    main()

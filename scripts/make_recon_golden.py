"""Generate golden fixtures for the re-derived reconstruction math.

INDEPENDENT derivations — direct O(N^2) summations of the published optics
in float64, no FFT identities shared with biahub_tpu/recon/optics.py — so a
sign/normalization regression in the production re-derivation fails
tests/test_recon_golden.py rather than cancelling consistently in both
directions (the reference delegates this math to waveorder:
biahub/compute_transfer_function.py:16-34).

- Widefield incoherent OTF: asf(z, r) = (1/N) sum_u P(u) e^{i2pi z kz(u)}
  e^{+i2pi u.r/N}; psf = |asf|^2; OTF(q) = sum_r psf e^{-i2pi q.r/N},
  normalized at DC.
- Phase WOTF (Streibl 1985 weak-object): C(f, z) = sum_u S P e^{-i2pi z kz(u)}
  P(u+f) e^{+i2pi z kz(u+f)} / sum(S P P) with periodic u+f; phase part
  2 Im C; H = -(1/Nz) DFT_z.
- Birefringence: forward Mueller model from the recOrder convention
  (intensity rows [1, sin(chi) cos 2theta, sin(chi) sin 2theta, -cos(chi)];
  sample Stokes of a retarder with retardance delta, slow axis theta under
  the calibration convention S = S0 [1, p sin(delta) sin(2theta),
  p sin(delta) cos(2theta), p cos(delta)]) — the inversion must recover the
  physical parameters.

Run: python scripts/make_recon_golden.py  (writes tests/golden/recon_golden.npz)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

ZYX = (6, 8, 8)
YX_PX, Z_PX = 0.2, 0.25
WAVE = 0.532
NA_DET, NA_ILL = 0.9, 0.4
N_MEDIA = 1.3


def grids(yx_shape, px):
    fy = np.fft.fftfreq(yx_shape[0], d=px)
    fx = np.fft.fftfreq(yx_shape[1], d=px)
    return np.meshgrid(fy, fx, indexing="ij")


def pupil_np(yx_shape, px, na, wavelength):
    fyy, fxx = grids(yx_shape, px)
    return (np.sqrt(fyy**2 + fxx**2) <= na / wavelength).astype(np.float64)


def kz_np(yx_shape, px, wavelength, n_media):
    fyy, fxx = grids(yx_shape, px)
    return np.sqrt(
        np.maximum((n_media / wavelength) ** 2 - fyy**2 - fxx**2, 0.0)
    )


def z_coords(n_z, dz):
    return np.fft.fftfreq(n_z) * n_z * dz


def golden_fluorescence_otf():
    n_z, n_y, n_x = ZYX
    P = pupil_np(ZYX[1:], YX_PX, NA_DET, WAVE)
    kz = kz_np(ZYX[1:], YX_PX, WAVE, N_MEDIA)
    z = z_coords(n_z, Z_PX)
    iy = np.arange(n_y)
    ix = np.arange(n_x)
    # Direct inverse 2D DFT per z (index-domain, 1/N normalization).
    psf = np.empty(ZYX)
    for zi in range(n_z):
        field = P * np.exp(2j * np.pi * z[zi] * kz)
        ey = np.exp(2j * np.pi * np.outer(np.arange(n_y), iy) / n_y)
        ex = np.exp(2j * np.pi * np.outer(np.arange(n_x), ix) / n_x)
        asf = (ey.T @ field @ ex) / (n_y * n_x)
        psf[zi] = np.abs(asf) ** 2
    # Direct forward 3D DFT.
    qz = np.exp(-2j * np.pi * np.outer(np.arange(n_z), np.arange(n_z)) / n_z)
    qy = np.exp(-2j * np.pi * np.outer(np.arange(n_y), np.arange(n_y)) / n_y)
    qx = np.exp(-2j * np.pi * np.outer(np.arange(n_x), np.arange(n_x)) / n_x)
    otf = np.einsum("qz,ry,sx,zyx->qrs", qz, qy, qx, psf)
    return otf / otf[0, 0, 0]


def golden_phase_wotf():
    n_z, n_y, n_x = ZYX
    P = pupil_np(ZYX[1:], YX_PX, NA_DET, WAVE)
    S = pupil_np(ZYX[1:], YX_PX, NA_ILL, WAVE)
    kz = kz_np(ZYX[1:], YX_PX, WAVE, N_MEDIA)
    z = z_coords(n_z, Z_PX)
    norm = np.sum(S * P * P)
    hp = np.zeros(ZYX)
    for zi in range(n_z):
        c = np.zeros((n_y, n_x), np.complex128)
        for fy in range(n_y):
            for fx in range(n_x):
                acc = 0.0 + 0.0j
                for uy in range(n_y):
                    for ux in range(n_x):
                        vy, vx = (uy + fy) % n_y, (ux + fx) % n_x
                        acc += (
                            S[uy, ux]
                            * P[uy, ux]
                            * np.exp(-2j * np.pi * z[zi] * kz[uy, ux])
                            * P[vy, vx]
                            * np.exp(2j * np.pi * z[zi] * kz[vy, vx])
                        )
                c[fy, fx] = acc / norm
        hp[zi] = 2.0 * np.imag(c)
    qz = np.exp(-2j * np.pi * np.outer(np.arange(n_z), np.arange(n_z)) / n_z)
    H = -np.einsum("qz,zyx->qyx", qz, hp) / n_z
    return H


def golden_birefringence():
    """Forward Mueller model from published recOrder conventions."""
    swing = 0.03
    chi = 2 * np.pi * swing
    rng = np.random.default_rng(3)
    shape = (2, 3, 4)
    delta = rng.uniform(0.1, 2.5, shape)      # retardance, radians
    theta = rng.uniform(0.0, np.pi, shape)    # slow axis
    s0 = rng.uniform(0.5, 2.0, shape)         # transmittance
    p = rng.uniform(0.6, 1.0, shape)          # degree of polarization
    stokes = np.stack(
        [
            s0,
            s0 * p * np.sin(delta) * np.sin(2 * theta),
            s0 * p * np.sin(delta) * np.cos(2 * theta),
            s0 * p * np.cos(delta),
        ]
    )
    rows = [[1.0, 0.0, 0.0, -1.0]]
    for theta_deg in (0, 45, 90, 135):
        th = np.deg2rad(theta_deg)
        rows.append(
            [1.0, np.sin(chi) * np.cos(2 * th), np.sin(chi) * np.sin(2 * th),
             -np.cos(chi)]
        )
    A = np.asarray(rows)
    intensities = np.einsum("ns,szyx->nzyx", A, stokes)
    return dict(
        swing=np.float64(swing),
        intensities=intensities,
        retardance_rad=delta,
        orientation=theta,
        transmittance=s0,
        dop=p,
    )


def main():
    out = Path(__file__).resolve().parents[1] / "tests" / "golden"
    out.mkdir(parents=True, exist_ok=True)
    biref = golden_birefringence()
    np.savez_compressed(
        out / "recon_golden.npz",
        zyx_shape=np.asarray(ZYX),
        params=np.asarray([YX_PX, Z_PX, WAVE, NA_DET, NA_ILL, N_MEDIA]),
        fluorescence_otf=golden_fluorescence_otf(),
        phase_wotf=golden_phase_wotf(),
        **{f"biref_{k}": v for k, v in biref.items()},
    )
    print("wrote", out / "recon_golden.npz")


if __name__ == "__main__":
    main()

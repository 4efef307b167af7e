"""Per-item roofline floors for the fused chain (VERDICT r4 next #3).

For each chain item at the flagship geometry this computes, straight from
the pipeline's own geometry helpers:

- HBM bytes read+written  -> traffic floor at the v5e HBM rate (819 GB/s)
- MXU MACs actually issued -> compute floor at the v5e bf16 peak
  (197 TFLOP/s). The engine's `high` precision runs every matmul as a
  2-term bf16 split (3 MXU dots per product: hi*hi + hi*lo + lo*hi,
  pallas_fft._dot) and every complex matmul as the Karatsuba 3-dot form
  (pallas_fft._cdot) — the MAC counts below count the bf16 dots the MXU
  executes, not the algorithmic complex MACs.

The honest per-item floor is max(traffic, compute) under perfect DMA/MXU
overlap and traffic+compute with none; Mosaic's automatic grid pipelining
lands between the two. Measured device times (scripts/trace_chain.py on
the real chip, batch 4, pinned output layout) are pinned in MEASURED_MS —
update them when a kernel changes materially.

Prints the markdown table for docs/kernels.md.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

HBM_GBPS = 819.0
PEAK_BF16_TFLOPS = 197.0  # v5e MXU peak
SPLIT = 3  # bf16 dots per f32 product in `high` precision (pallas_fft._dot)
SHAPE = (256, 256, 1024)
AVG = 3
F32 = 4

# Device ms per volume from the round-5 trace (batch 4, f32 input, pinned
# output layout; scripts/trace_chain.py). The warp numbers are the fused
# two-pass in-plane warp of the bench chain (2 deg rotation x 1.01 scale).
MEASURED_MS = {
    "pass A (rfft_x + DFT_y)": 1.43,
    "Nyquist plane chain (XLA)": 0.10,  # pad.0 + the tiny 2D chain ops
    "pass B (DFT_z + filter + iDFT_z)": 1.19,
    "pass C (iDFT_y + irfft_x, yzx handoff)": 1.38,
    "deskew (one-hot MXU resample, xzy out)": 1.00,
    "warp pass 1 (z+y fused)": 0.94,
    "warp pass 2 (x)": 0.77,
}


def _fft_macs(g):
    """bf16 MACs issued by each FFT pass per volume (see module docstring).

    Counted from the kernel bodies (pallas_fft.py): a `_dot` at `high`
    precision issues SPLIT bf16 dots; a `_cdot`/`_cdot_r` issues 3 `_dot`s
    (Karatsuba). Pass A per z-slice with radix_x == 2 runs 11 `_dot`s of
    (y, x/4) @ (x/4, xw/4) for the rfft (f0: 2, f1/f2/f3: 3 each) and, with
    radix_y, 2 `_cdot`s of (y2, y2) @ (y2, xw) for the DFT_y. Pass B with
    radix_z runs 4 `_cdot`s of (z2, z2) @ (z2, xw) per ky row (E/O forward
    + s/d inverse, _radix_z_chain). Pass C mirrors pass A exactly (11
    inverse-X `_dot`s at the transposed dims + 2 `_cdot`s for the iDFT_y).
    """
    z, y, x, xw = g.z, g.y, g.x, g.xw
    if g.radix_x == 2:
        x_dots = 11 * y * (x // 4) * (xw // 4)
    elif g.radix_x:
        x_dots = 5 * y * (x // 2) * (xw // 2)
    else:
        x_dots = 2 * y * x * xw
    if g.radix_y:
        y_dots = 2 * 3 * g.y2 * g.y2 * xw
    else:
        y_dots = 3 * y * y * xw
    pass_a = (x_dots + y_dots) * SPLIT * z
    if g.radix_z:
        b_row = 4 * 3 * g.z2 * g.z2 * xw
    else:
        b_row = 2 * 3 * z * z * xw
    pass_b = b_row * SPLIT * y
    return pass_a, pass_b, pass_a  # pass C mirrors pass A


def _q(k):
    """MXU cycle cost of a K-deep contraction: depth quantizes to 128-row
    tiles, so a 64- or 160-wide banded window pays 128 or 256 rows of
    MXU time regardless of the MAC count."""
    return -(-k // 128) * 128


def _deskew_macs(dshape):
    """Deskew xzy chain kernel: per (group, member j, x-tile) one banded
    dot (K, Y_out) @ (tile_w, K) — MACs = Yp * Y_out * X_out * q(K) * SPLIT
    (pallas_deskew._deskew_kernel; K from deskew_zyx_pallas)."""
    z, y, x = SHAPE
    TILE_X = 128
    px = 0.371
    K = int(np.ceil(TILE_X * px)) + 2 + 8
    K = min(-(-K // 8) * 8, y)  # slab rows live on the ORIGINAL y axis
    groups = -(-y // AVG)
    groups8 = -(-groups // 8) * 8  # xzy chain mode pads to 8-group blocks
    yp = groups8 * AVG
    y_out, x_out = dshape[1], dshape[2]
    return yp * y_out * x_out * _q(K) * SPLIT, K


def _warp_macs(dshape, matrix):
    """Fused two-pass in-plane warp (affine.py:436-447): pass 1 contracts
    K_z (z axis) then K_y per element; pass 2 contracts K_x. K values from
    the same static_window_plan the kernel uses."""
    from biahub_tpu.kernels.pallas_resample import _k_window, static_window_plan

    m = np.asarray(matrix, np.float64)
    b1 = m[1, 2] / m[2, 2]
    params = np.zeros((1, 3, 3))
    params[0, 0] = (m[0, 0], 0.0, m[0, 3])
    params[0, 1] = (m[1, 1] - b1 * m[2, 1], b1, m[1, 3] - b1 * m[2, 3])
    params[0, 2] = (m[2, 2], m[2, 1], m[2, 3])
    k_bounds = [
        int(np.ceil(128 * abs(params[0, ax, 0]))) + 2 for ax in range(3)
    ]
    zo, yo, xo = (int(s) for s in dshape)
    kz = _k_window(k_bounds[0], zo)
    yw = static_window_plan(
        [tuple(float(c) for c in params[0, 1])], xo, yo, yo, order=1,
        k_dyn=_k_window(k_bounds[1], yo),
    )
    ky = yw[0] if yw else _k_window(k_bounds[1], yo)
    xw_ = static_window_plan(
        [tuple(float(c) for c in params[0, 2])], yo, xo, xo, order=1,
        k_dyn=_k_window(k_bounds[2], xo),
    )
    kx = xw_[0] if xw_ else _k_window(k_bounds[2], xo)
    e = zo * yo * xo
    return e * (_q(kz) + _q(ky)) * SPLIT, e * _q(kx) * SPLIT, (kz, ky, kx)


def floors(in_dtype=np.float32):
    from biahub_tpu.kernels.deskew import get_deskewed_data_shape
    from biahub_tpu.kernels.pallas_fft import _geometry

    z, y, x = SHAPE
    g = _geometry(z, y, x)
    nspec = g.nz * g.ny * 2
    spectra = nspec * g.yw * (g.z2 if g.radix_z else g.z) * g.xw * F32
    nyq = z * y * 128 * F32 if g.peel else 0
    # Prepared Tikhonov filter blocks: n_filt * ny arrays of (yw, z, xw).
    filt = 1 * g.ny * g.yw * z * g.xw * F32

    groups = -(-y // AVG)
    pad_front = -(-groups // 8) * 8 * AVG - y  # xzy chain mode
    yzx = (y + pad_front) * z * x * F32

    dshape, _ = get_deskewed_data_shape(SHAPE, 36.17, 0.371, False,
                                        average_n_slices=AVG)
    dbytes = int(np.prod(dshape)) * F32

    vol_in = z * y * x * np.dtype(in_dtype).itemsize
    ma, mb, mc = _fft_macs(g)
    mdesk, kdesk = _deskew_macs(dshape)
    theta = np.deg2rad(2.0)
    reg_stab = np.eye(4)
    reg_stab[1:3, 1:3] = 1.01 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    reg_stab[:3, 3] = [0.5, -1.25, 2.0]
    mw1, mw2, kw = _warp_macs(dshape, reg_stab)

    items = {
        "pass A (rfft_x + DFT_y)": (vol_in + spectra + nyq, ma),
        "Nyquist plane chain (XLA)": (2 * nyq // 128 * 8, 0),
        "pass B (DFT_z + filter + iDFT_z)": (spectra + filt + spectra, mb),
        "pass C (iDFT_y + irfft_x, yzx handoff)": (spectra + nyq + yzx, mc),
        "deskew (one-hot MXU resample, xzy out)": (yzx + dbytes, mdesk),
        "warp pass 1 (z+y fused)": (2 * dbytes, mw1),
        "warp pass 2 (x)": (2 * dbytes, mw2),
    }
    return items, dshape, {"K_deskew": kdesk, "K_warp_zyx": kw}


def main():
    items, dshape, ks = floors()
    print(f"flagship {SHAPE}, avg {AVG}, deskewed {tuple(dshape)}, "
          f"f32 in, windows {ks}")
    print()
    print("| chain item | MB moved | traffic floor | bf16 Tdots | compute"
          " floor | roofline max | traffic+compute | measured | x roofline |")
    print("|---|---|---|---|---|---|---|---|---|")
    tot = [0.0] * 5
    for name, (b, macs) in items.items():
        tf = b / 1e9 / HBM_GBPS * 1e3
        cf = macs * 2 / (PEAK_BF16_TFLOPS * 1e12) * 1e3
        roof, add = max(tf, cf), tf + cf
        m = MEASURED_MS.get(name)
        row = [tf, cf, roof, add, m or 0.0]
        tot = [a + v for a, v in zip(tot, row)]
        ms = f"{m:.2f}" if m else "—"
        ratio = f"{m / roof:.2f}" if m else "—"
        print(f"| {name} | {b / 1e6:.0f} | {tf:.2f} | {macs / 1e12:.2f} "
              f"| {cf:.2f} | {roof:.2f} | {add:.2f} | {ms} | {ratio} |")
    print(f"| **total** | | **{tot[0]:.2f}** | | **{tot[1]:.2f}** "
          f"| **{tot[2]:.2f}** | **{tot[3]:.2f}** | **{tot[4]:.2f}** | |")


if __name__ == "__main__":
    main()

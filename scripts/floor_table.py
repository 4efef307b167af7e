"""Per-item traffic floors for the fused chain (VERDICT r4 #5 / next #3).

Computes the HBM bytes each chain item reads+writes at the flagship
geometry straight from the pipeline's own geometry helpers, divides by the
v5e HBM rate (819 GB/s), and prints the markdown table for
docs/kernels.md. Measured device times (from scripts/trace_chain.py on the
real chip) are pinned in MEASURED_MS below — update them when a kernel
changes materially.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

HBM_GBPS = 819.0
SHAPE = (256, 256, 1024)
AVG = 3

# Device ms per volume from the round-5 trace (batch 8, uint16 ingest,
# pinned output layout; scripts/trace_chain.py).
MEASURED_MS = {
    "pass A (rfft_x + DFT_y)": None,
    "Nyquist plane chain (XLA)": None,
    "pass B (DFT_z + filter + iDFT_z)": None,
    "pass C (iDFT_y + irfft_x, yzx handoff)": None,
    "deskew (one-hot MXU resample, xzy out)": None,
    "warp pass 1 (z+y fused)": None,
    "warp pass 2 (x)": None,
}


def floors(in_dtype=np.uint16):
    from biahub_tpu.kernels.deskew import get_deskewed_data_shape
    from biahub_tpu.kernels.pallas_fft import _geometry

    z, y, x = SHAPE
    g = _geometry(z, y, x)
    nspec = g.nz * g.ny * 2
    f32 = 4
    spectra = nspec * g.yw * (g.z2 if g.radix_z else g.z) * g.xw * f32
    nyq = z * y * 128 * f32 if g.peel else 0
    # Prepared Tikhonov filter blocks: n_filt * ny arrays of (yw, z, xw).
    filt = 1 * g.ny * g.yw * z * g.xw * f32

    groups = -(-y // AVG)
    pad_front = groups * AVG - y
    yzx = (y + pad_front) * z * x * f32

    dshape, _ = get_deskewed_data_shape(SHAPE, 36.17, 0.371, False,
                                        average_n_slices=AVG)
    dbytes = int(np.prod(dshape)) * f32

    vol_in = z * y * x * np.dtype(in_dtype).itemsize
    items = {
        "pass A (rfft_x + DFT_y)": vol_in + spectra + nyq,
        "Nyquist plane chain (XLA)": 2 * nyq // 128 * 8,  # complex (z, y)
        "pass B (DFT_z + filter + iDFT_z)": spectra + filt + spectra,
        "pass C (iDFT_y + irfft_x, yzx handoff)": spectra + yzx,
        "deskew (one-hot MXU resample, xzy out)": yzx + dbytes,
        "warp pass 1 (z+y fused)": 2 * dbytes,
        "warp pass 2 (x)": 2 * dbytes,
    }
    return items, dshape


def main():
    items, dshape = floors()
    print(f"flagship {SHAPE}, avg {AVG}, deskewed {tuple(dshape)}, uint16 in")
    print()
    print("| chain item | bytes (MB) | floor (ms) | measured (ms) | x floor |")
    print("|---|---|---|---|---|")
    tot_f = tot_m = 0.0
    for name, b in items.items():
        fl = b / 1e9 / HBM_GBPS * 1e3
        m = MEASURED_MS.get(name)
        tot_f += fl
        ratio = f"{m / fl:.2f}" if m else "—"
        ms = f"{m:.2f}" if m else "—"
        if m:
            tot_m += m
        print(f"| {name} | {b / 1e6:.0f} | {fl:.2f} | {ms} | {ratio} |")
    print(f"| **total** | | **{tot_f:.2f}** | **{tot_m:.2f}** | |")


if __name__ == "__main__":
    main()

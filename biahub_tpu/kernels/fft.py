"""Phase cross-correlation and FFT-shape utilities.

Re-derivation of the dexp-style PCC the reference uses for volumetric drift
estimation and stitching (reference: biahub/estimate_stabilization.py:128-255,
biahub/vendor/stitch/_dexp_shim.py:57-182). The device kernel is a pure
function of two equal-shape arrays returning the integer-peak shift and the
correlation surface; subpixel refinement fits a parabola through the peak's
neighbors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.fft import next_fast_len

__all__ = [
    "phase_cross_corr",
    "phase_cross_corr_padding",
    "pad_to_shape",
    "center_crop",
    "match_shape",
    "subpixel_shift_2d",
]


def pad_to_shape(arr: np.ndarray, shape: tuple[int, ...], mode: str = "constant", **kwargs):
    """Center-pad an array to the given shape (host-side)."""
    assert arr.ndim == len(shape)
    dif = tuple(s - a for s, a in zip(shape, arr.shape))
    pad_width = [[s // 2, s - s // 2] for s in dif]
    return np.pad(arr, pad_width=pad_width, mode=mode, **kwargs)


def center_crop(arr: np.ndarray, shape: tuple[int, ...]) -> np.ndarray:
    """Center-crop an array to the given shape (host-side)."""
    assert arr.ndim == len(shape)
    starts = tuple((a - s) // 2 for a, s in zip(arr.shape, shape))
    slicing = tuple(slice(s, s + d) for s, d in zip(starts, shape))
    return arr[slicing]


def match_shape(arr: np.ndarray, shape: tuple[int, ...]) -> np.ndarray:
    """Pad then crop so the output has exactly the given shape, centered."""
    padded_shape = tuple(max(s, a) for s, a in zip(shape, arr.shape))
    return center_crop(pad_to_shape(arr, padded_shape), shape)


@partial(jax.jit, static_argnames=("normalization",))
def _pcc_core(ref_img: jax.Array, mov_img: jax.Array, normalization: str | None):
    f1 = jnp.fft.rfftn(ref_img.astype(jnp.float32))
    f2 = jnp.fft.rfftn(mov_img.astype(jnp.float32))
    prod = f1 * jnp.conj(f2)
    eps = jnp.finfo(jnp.float32).eps
    if normalization == "magnitude":
        prod = prod / jnp.maximum(jnp.abs(prod), eps)
    elif normalization == "classic":
        prod = prod / jnp.maximum(jnp.abs(f1) * jnp.abs(f2), eps)
    corr = jnp.fft.irfftn(prod, s=ref_img.shape)
    return corr


def _corr_surface(ref_img: jax.Array, mov_img: jax.Array,
                  normalization: str | None):
    """PCC correlation volume, routed through the fused matmul-DFT engine
    for supported 3D shapes (XLA's TPU FFT runs far below HBM speed —
    docs/kernels.md; the engine computes both forward transforms, the
    normalized cross-power, and the inverse in ~6 HBM round trips).
    Falls back to the XLA rfftn path for 2D inputs / unsupported shapes.
    The route decision is trace-time (static shape + env gates)."""
    if ref_img.ndim == 3 and ref_img.shape == mov_img.shape:
        from biahub_tpu.kernels.pallas_fft import (
            pcc_corr_pallas,
            pcc_pallas_supported,
        )

        if pcc_pallas_supported(tuple(int(s) for s in ref_img.shape)):
            return pcc_corr_pallas(ref_img, mov_img, normalization)
    return _pcc_core(ref_img, mov_img, normalization)


@partial(jax.jit, static_argnames=("normalization",))
def _pcc_peak_index_device(ref_img, mov_img, normalization: str | None = None):
    """Unshifted argmax index of |corr| computed on device (int32 (ndim,))."""
    corr = _corr_surface(ref_img, mov_img, normalization)
    flat = jnp.argmax(jnp.abs(corr))
    idx = []
    rem = flat
    for s in corr.shape[::-1]:
        idx.append(rem % s)
        rem = rem // s
    return jnp.stack(idx[::-1]).astype(jnp.int32)


@partial(jax.jit, static_argnames=("normalization",))
def _pcc_shift_device(ref_img, mov_img, normalization: str | None = None):
    """Wrap-corrected PCC peak computed entirely on device.

    Returns only the (z, y, x) shift — per-timepoint drift estimation never
    needs the correlation volume, and pulling it to the host costs a full
    volume transfer per pair.
    """
    corr = _corr_surface(ref_img, mov_img, normalization)
    a = jnp.abs(corr)
    flat = jnp.argmax(a)
    maxima = []
    rem = flat
    for s in corr.shape[::-1]:
        maxima.append(rem % s)
        rem = rem // s
    maxima = jnp.stack(maxima[::-1]).astype(jnp.float32)
    midpoint = jnp.asarray([np.fix(s / 2) for s in corr.shape], jnp.float32)
    sizes = jnp.asarray(corr.shape, jnp.float32)
    return jnp.where(maxima > midpoint, maxima - sizes, maxima)


def phase_cross_corr(
    ref_img,
    mov_img,
    normalization: str | None = None,
    output_path=None,
    verbose: bool = False,
):
    """Integer shift (z, y, x order of the input axes) between two arrays.

    Matches the reference semantics (reference:
    biahub/estimate_stabilization.py:198-255): the returned shift is the
    argmax of irfftn(F_ref * conj(F_mov)) with wrap-around correction, i.e.
    the translation that maps the MOVING image onto the REFERENCE.
    """
    if output_path is None:
        # Fast path: peak found on device, only 3 floats cross to the host.
        shift = np.asarray(
            _pcc_shift_device(jnp.asarray(ref_img), jnp.asarray(mov_img), normalization)
        )
        if verbose:
            print(f"phase cross corr. peak at {tuple(shift)}")
        return shift, None
    corr = np.asarray(_pcc_core(jnp.asarray(ref_img), jnp.asarray(mov_img), normalization))
    corr_shifted = np.fft.fftshift(np.abs(corr))
    maxima = np.unravel_index(np.argmax(np.abs(corr)), corr.shape)
    midpoint = np.array([np.fix(s / 2) for s in corr.shape])
    shift = np.asarray(maxima, dtype=np.float32)
    wrap = shift > midpoint
    shift[wrap] -= np.array(corr.shape)[wrap]
    if output_path is not None:
        _plot_corr(corr_shifted, output_path)
    if verbose:
        print(f"phase cross corr. peak at {tuple(shift)}")
    return shift, corr_shifted


def phase_cross_corr_padding(
    ref_img,
    mov_img,
    maximum_shift: float = 1.2,
    normalization: str | None = None,
    output_path=None,
    verbose: bool = False,
):
    """PCC with fast-FFT-length padding assuming a maximum relative shift.

    The padded variant of the reference (reference:
    biahub/estimate_stabilization.py:128-195); peak reported relative to the
    fftshifted center.
    """
    shape = tuple(
        int(next_fast_len(int(max(s1, s2) * maximum_shift)))
        for s1, s2 in zip(ref_img.shape, mov_img.shape)
    )
    if verbose:
        print(
            f"phase cross corr. fft shape of {shape} for arrays of shape "
            f"{ref_img.shape} and {mov_img.shape} with maximum shift of {maximum_shift}"
        )
    ref_m = match_shape(np.asarray(ref_img), shape)
    mov_m = match_shape(np.asarray(mov_img), shape)
    if output_path is None:
        # Device-side peak: fftshifted argmax p maps to the unshifted index
        # p0 via p = (p0 + s//2) % s, so peak = s//2 - p.
        p0 = np.asarray(
            _pcc_peak_index_device(jnp.asarray(ref_m), jnp.asarray(mov_m), normalization)
        ).astype(np.int64)
        peak = tuple(
            int(s // 2 - ((q + s // 2) % s)) for s, q in zip(shape, p0)
        )
        if verbose:
            print(f"phase cross corr. peak at {peak}")
        return np.asarray(peak, dtype=np.float32), None
    corr = np.asarray(_pcc_core(jnp.asarray(ref_m), jnp.asarray(mov_m), normalization))
    corr = np.fft.fftshift(np.abs(corr))
    argmax = np.argmax(corr)
    peak = np.unravel_index(argmax, corr.shape)
    peak = tuple(s // 2 - p for s, p in zip(corr.shape, peak))
    if output_path is not None:
        _plot_corr(corr, output_path)
    if verbose:
        print(f"phase cross corr. peak at {peak}")
    return np.asarray(peak, dtype=np.float32), corr


def subpixel_shift_2d(
    ref_img: np.ndarray, mov_img: np.ndarray, normalization: str | None = "magnitude"
) -> np.ndarray:
    """Subpixel 2D translation via PCC + parabolic peak interpolation.

    Replaces pystackreg's TRANSLATION stack registration
    (reference: biahub/estimate_stabilization.py:754-755). Returns the (y, x)
    shift mapping the moving image onto the reference.
    """
    corr = np.abs(
        np.asarray(_pcc_core(jnp.asarray(ref_img), jnp.asarray(mov_img), normalization))
    )
    peak = np.unravel_index(np.argmax(corr), corr.shape)
    shift = np.array(peak, dtype=np.float64)

    # Parabolic refinement per axis on the wrapped correlation surface
    refined = []
    for ax, p in enumerate(peak):
        n = corr.shape[ax]
        idx = [(p - 1) % n, p, (p + 1) % n]
        sel = [slice(None)] * corr.ndim
        vals = []
        for i in idx:
            sel[ax] = i
            other = list(peak)
            other[ax] = i
            vals.append(corr[tuple(other)])
        c_m, c_0, c_p = vals
        denom = c_m - 2 * c_0 + c_p
        delta = 0.0 if denom == 0 else 0.5 * (c_m - c_p) / denom
        refined.append(p + float(np.clip(delta, -1, 1)))

    shift = np.asarray(refined)
    midpoint = np.array([np.fix(s / 2) for s in corr.shape])
    wrap = shift > midpoint
    shift[wrap] -= np.array(corr.shape)[wrap]
    return shift


def _plot_corr(corr: np.ndarray, output_path) -> None:
    from pathlib import Path

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    corr_to_plot = np.max(corr, axis=0) if corr.ndim == 3 else corr
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(corr_to_plot, cmap="viridis")
    ax.set_title("Cross-Correlation")
    ax.set_xlabel("X shift (pixels)")
    ax.set_ylabel("Y shift (pixels)")
    fig.colorbar(im, ax=ax, label="Correlation strength")
    fig.tight_layout()
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, bbox_inches="tight")
    plt.close(fig)


@partial(jax.jit, static_argnames=("normalization",))
def pcc_shifts_vs_first(ref, movs, normalization: str | None = None):
    """Wrap-corrected PCC shifts of a (T, Z, Y, X) stack against one reference.

    XLA hoists the reference FFT out of the vmap, so the whole stack costs
    T+1 forward FFTs — the reference's per-timepoint loop (one Slurm job per
    pair) becomes a single device program.
    """
    return jax.vmap(lambda m: _pcc_shift_device(ref, m, normalization))(movs)


@partial(jax.jit, static_argnames=("normalization",))
def pcc_shifts_pairwise(refs, movs, normalization: str | None = None):
    """Wrap-corrected PCC shifts for matched (T, ...) reference/moving pairs."""
    return jax.vmap(lambda r, m: _pcc_shift_device(r, m, normalization))(refs, movs)


@partial(jax.jit, static_argnames=("normalization",))
def _pcc_peak_indices_vs_first(ref, movs, normalization: str | None = None):
    return jax.vmap(lambda m: _pcc_peak_index_device(ref, m, normalization))(movs)


@partial(jax.jit, static_argnames=("normalization",))
def _pcc_peak_indices_pairwise(refs, movs, normalization: str | None = None):
    return jax.vmap(lambda r, m: _pcc_peak_index_device(r, m, normalization))(refs, movs)

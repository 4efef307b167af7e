"""Bead/peak detection: blur + block-max on device, selection logic on host.

Re-derivation of the reference's torch peak detector (reference:
biahub/characterize_psf.py:562-710, an approximate peak_local_max): uniform
blur (hot-pixel suppression), strided block max-pool for candidates, top-k by
brightness, absolute threshold, pairwise NMS, min-distance rejection, border
exclusion. The dense image work runs as one XLA program; the candidate
filtering operates on <= max_num_peaks points in NumPy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["detect_peaks", "block_max_candidates"]


def block_max_candidates(
    zyx: jax.Array,
    block_size: tuple[int, int, int] = (8, 8, 8),
    blur_kernel_size: int = 3,
):
    """Blur, then per-block max value and flat argmax index.

    Matches torch ``max_pool3d(stride=block, padding=block//2)`` block
    geometry. Returns (values, flat_indices) of one candidate per block.

    On gated shapes the fused Pallas kernel (kernels/pallas_peaks.py) runs
    the whole dense chain in one volume pass (~7x less HBM traffic); the
    XLA formulation below covers everything else.
    """
    from biahub_tpu.kernels.pallas_peaks import (
        block_max_candidates_pallas,
        peaks_pallas_supported,
    )

    if peaks_pallas_supported(
        tuple(zyx.shape), tuple(block_size), int(blur_kernel_size)
    ):
        return block_max_candidates_pallas(
            zyx, blur_kernel_size=int(blur_kernel_size)
        )
    return _block_max_candidates_xla(
        zyx, block_size=tuple(block_size),
        blur_kernel_size=int(blur_kernel_size),
    )


@partial(jax.jit, static_argnames=("block_size", "blur_kernel_size"))
def _block_max_candidates_xla(
    zyx: jax.Array,
    block_size: tuple[int, int, int] = (8, 8, 8),
    blur_kernel_size: int = 3,
):
    """The XLA formulation (separable reduce_windows); general shapes."""
    zyx = zyx.astype(jnp.float32)
    shape = zyx.shape

    if blur_kernel_size:
        k = blur_kernel_size
        # Separable box sum: three k-point axis passes instead of one
        # k^3-point window (XLA lowers the cubic window as k^3 shifted
        # adds — ~9x the HBM traffic at k=3).
        sums = jax.lax.reduce_window(
            zyx, 0.0, jax.lax.add, (k, 1, 1), (1, 1, 1), "SAME"
        )
        sums = jax.lax.reduce_window(
            sums, 0.0, jax.lax.add, (1, k, 1), (1, 1, 1), "SAME"
        )
        sums = jax.lax.reduce_window(
            sums, 0.0, jax.lax.add, (1, 1, k), (1, 1, 1), "SAME"
        )
        # count_include_pad=False semantics. The divisor depends only on the
        # static shape: build it host-side as a separable outer product
        # instead of a second full-volume reduce_window pass.
        def c1(s):
            lo = (k - 1) // 2  # XLA SAME low pad for stride 1
            i = np.arange(s)
            return (
                np.minimum(i - lo + k - 1, s - 1) - np.maximum(i - lo, 0) + 1
            ).astype(np.float32)
        # Three 1-D device constants; XLA fuses the outer product into the
        # divide (a full-volume host-side counts constant blew past the
        # remote-compile request size limit over the axon tunnel).
        cz, cy, cx = (jnp.asarray(c1(s)) for s in shape)
        smooth = sums / ((cz[:, None, None] * cy[None, :, None]) * cx)
    else:
        smooth = zyx

    bz, by, bx = block_size
    pads = (bz // 2, by // 2, bx // 2)
    # torch output size: floor((size + 2*pad - block) / block) + 1
    out_sizes = [
        (s + 2 * p - b) // b + 1 for s, p, b in zip(shape, pads, block_size)
    ]
    padded_sizes = [o * b for o, b in zip(out_sizes, block_size)]
    # Virtual padding: the torch block geometry rides the reduce_windows'
    # explicit padding configs (negative high pad = crop, exactly like the
    # lax.pad formulation) instead of materializing a padded copy — one
    # full-volume pass saved.
    win_pads = [
        (p, ps - s - p) for s, p, ps in zip(shape, pads, padded_sizes)
    ]
    neg = jnp.finfo(jnp.float32).min

    oz, oy, ox = out_sizes
    big = jnp.iinfo(jnp.int32).max

    def pooled(arr, init, op):
        out = arr
        for axis, (b, wp) in enumerate(zip(block_size, win_pads)):
            window = [1, 1, 1]
            window[axis] = b
            padding = [(0, 0)] * 3
            padding[axis] = wp
            out = jax.lax.reduce_window(
                out, init, op, tuple(window), tuple(window), tuple(padding)
            )
        return out

    # SEPARABLE strided max-pool for the block maxima — three axis-wise
    # reduce_windows touch the volume once (the blocks-reshape
    # formulations all relayout the full volume at tiny strides on TPU's
    # tiled layouts, ~15 ms/volume measured three different ways).
    m = pooled(smooth, neg, jax.lax.max)

    # Argmax recovery: broadcast each block's max back to voxel resolution
    # — z/y by leading/middle-axis repeats (contiguous materializations)
    # cropped to the real extent, and the LANE axis by an exact one-hot
    # MXU matmul at HIGHEST precision whose matrix folds the block offset
    # in (a lane-axis repeat or a blocks reshape is the tiny-stride
    # relayout this formulation exists to avoid; the one-hot dot moves the
    # shuffle onto the MXU where it is free). Then mark cells equal to
    # their block max and take the per-block MINIMUM global flat index
    # with strided min-windows — identical tie-breaking to argmax over the
    # block's C-order scan (virtual padding never equals a real max, and
    # every block contains at least one real voxel since pad < block).
    z, y, x = shape
    # Covered extent per axis: a negative high pad (torch geometry crop on
    # non-divisible shapes) leaves tail voxels outside every block — they
    # are excluded from the compare exactly as the materialized-pad
    # formulation cropped them. Divisible (production) shapes crop nothing.
    cz_, cy_, cx_ = (
        min(s, ps - p) for s, p, ps in zip(shape, pads, padded_sizes)
    )
    sm = smooth[:cz_, :cy_, :cx_]
    mz = jnp.broadcast_to(m[:, None], (oz, bz, oy, ox)).reshape(
        padded_sizes[0], oy, ox
    )[pads[0] : pads[0] + cz_]
    mzy = jnp.broadcast_to(mz[:, :, None], (cz_, oy, by, ox)).reshape(
        cz_, padded_sizes[1], ox
    )[:, pads[1] : pads[1] + cy_]
    upx = jnp.zeros((ox, cx_), jnp.float32).at[
        (jnp.arange(cx_) + pads[2]) // bx, jnp.arange(cx_)
    ].set(1.0)
    m_up = jnp.dot(mzy, upx, precision=jax.lax.Precision.HIGHEST)

    cshape = (cz_, cy_, cx_)
    flat_full = (
        jax.lax.broadcasted_iota(jnp.int32, cshape, 0) * y
        + jax.lax.broadcasted_iota(jnp.int32, cshape, 1)
    ) * x + jax.lax.broadcasted_iota(jnp.int32, cshape, 2)
    idx_full = jnp.where(sm == m_up, flat_full, big)
    idx_pads = [
        (p, ps - c - p) for c, p, ps in zip(cshape, pads, padded_sizes)
    ]
    idx = idx_full
    for axis, (b, wp) in enumerate(zip(block_size, idx_pads)):
        window = [1, 1, 1]
        window[axis] = b
        padding = [(0, 0)] * 3
        padding[axis] = wp
        idx = jax.lax.reduce_window(
            idx, big, jax.lax.min, tuple(window), tuple(window),
            tuple(padding),
        )
    return m.ravel(), idx.ravel()


@partial(jax.jit, static_argnames=("block_size", "blur_kernel_size", "k"))
def _block_max_topk(
    zyx: jax.Array,
    block_size: tuple[int, int, int],
    blur_kernel_size: int,
    k: int,
):
    """Candidates + device-side brightness top-k in ONE dispatch.

    Keeping the sort on device means only 2*k scalars cross to the host —
    the host argsort over every block candidate cost an extra full-array
    fetch round trip per detection over the axon tunnel.
    """
    values, flat = block_max_candidates(
        zyx, block_size=block_size, blur_kernel_size=blur_kernel_size
    )
    kk = min(int(k), int(values.size))
    top_values, top_pos = jax.lax.top_k(values, kk)
    return top_values, flat[top_pos]


def detect_peaks(
    zyx_data: np.ndarray,
    block_size: int | tuple[int, int, int] = (8, 8, 8),
    nms_distance: int = 3,
    min_distance: int = 40,
    threshold_abs: float = 200.0,
    max_num_peaks: int = 500,
    exclude_border: tuple[int, int, int] | None = None,
    blur_kernel_size: int = 3,
    device: str = "cpu",
    verbose: bool = False,
) -> np.ndarray:
    """Detect local-maximum peaks; returns (N, 3) ZYX coordinates."""
    if isinstance(block_size, int):
        block_size = (block_size,) * 3
    zyx_shape = zyx_data.shape[-3:]

    if isinstance(zyx_data, jax.Array):
        vol = zyx_data.astype(jnp.float32)  # already on device; no round trip
    else:
        vol = jnp.asarray(np.asarray(zyx_data, dtype=np.float32))
    # Candidates + brightness top-k fused into one dispatch; a single
    # device_get fetches both tiny (k,) arrays together.
    values_d, idx_d = _block_max_topk(
        vol,
        block_size=tuple(int(b) for b in block_size),
        blur_kernel_size=int(blur_kernel_size),
        k=int(max_num_peaks),
    )
    peak_value, peak_idx = jax.device_get((values_d, idx_d))
    num_peaks = int(np.prod([
        (s + 2 * (b // 2) - b) // b + 1
        for s, b in zip(zyx_shape, block_size)
    ]))
    num_rejected_max_num_peaks = num_peaks - len(peak_value)

    num_rejected_threshold_abs = 0
    if threshold_abs:
        abs_mask = peak_value > threshold_abs
        peak_value = peak_value[abs_mask]
        peak_idx = peak_idx[abs_mask]
        num_rejected_threshold_abs = int(np.sum(~abs_mask))

    coords = np.stack(np.unravel_index(peak_idx, zyx_shape), -1)
    fcoords = coords.astype(np.float64)
    if len(coords):
        dist = np.linalg.norm(fcoords[:, None] - fcoords[None, :], axis=-1)
    else:
        dist = np.zeros((0, 0))
    dist_mask = np.ones(len(coords), dtype=bool)

    # NMS: of any candidate pair closer than nms_distance, drop the dimmer
    # (the one later in the brightness ordering).
    close = np.triu(dist < nms_distance, k=1)
    nearby_peaks = np.argwhere(close)
    dist_mask[nearby_peaks[:, 1]] = False
    num_rejected_nms_distance = int(np.sum(~dist_mask))

    num_rejected_min_distance = 0
    if min_distance:
        _dist_mask = dist < min_distance
        if len(nearby_peaks):
            _dist_mask[nearby_peaks[:, 0], nearby_peaks[:, 1]] = False
        dist_mask &= _dist_mask.sum(1) < 2
        num_rejected_min_distance = int(np.sum(~dist_mask)) - num_rejected_nms_distance
    coords = coords[dist_mask]

    num_rejected_exclude_border = 0
    if exclude_border is not None:
        if not (isinstance(exclude_border, (tuple, list)) and len(exclude_border) == 3):
            raise ValueError(f"invalid argument exclude_border={exclude_border}")
        for dim, size in enumerate(exclude_border):
            border_mask = (size < coords[:, dim]) & (
                coords[:, dim] < zyx_shape[dim] - size
            )
            num_rejected_exclude_border += int(np.sum(~border_mask))
            coords = coords[border_mask]

    if verbose:
        print(f"Number of peaks detected: {num_peaks}")
        print(f"Number of peaks rejected by max_num_peaks: {num_rejected_max_num_peaks}")
        print(f"Number of peaks rejected by threshold_abs: {num_rejected_threshold_abs}")
        print(f"Number of peaks rejected by nms_distance: {num_rejected_nms_distance}")
        print(f"Number of peaks rejected by min_distance: {num_rejected_min_distance}")
        print(f"Number of peaks rejected by exclude_border: {num_rejected_exclude_border}")
        print(f"Number of peaks returned: {len(coords)}")

    return coords

"""Fused Pallas peak-candidate kernel: blur + block-max + argmax in ONE pass.

The XLA formulation (kernels/peaks.py::block_max_candidates) is
bandwidth-bound at ~4.6 GB of HBM traffic per flagship volume: the separable
box blur (3 reduce_window passes), the strided block max-pool, and the
argmax-recovery broadcast/compare/min-window chain each re-touch the full
volume. This kernel reads the RAW volume once (each z block twice — the
halo), computes the blur, the z+y window maxima, and the per-column minimum
flat index entirely in VMEM, and emits only the tiny (oz, oy, X) candidate
planes; a small XLA epilogue pools the lane-axis windows. ~0.6 GB total
traffic, ~7x less than the XLA chain.

Semantics are IDENTICAL to block_max_candidates (reference geometry:
biahub/characterize_psf.py:562-710, torch ``max_pool3d(stride=block,
padding=block//2)``): block i covers voxels [8i-4, 8i+4), the box blur uses
count_include_pad=False divisors, ties resolve to the smallest flat C-order
index. Parity is pinned exactly on integer-valued volumes
(tests/test_pallas_peaks.py) where f32 sums are associativity-exact.

Grid: one program per output z block. The torch geometry offsets blocks by
-block/2, so program i needs raw rows [8i-5, 8i+5) (blur halo included) —
expressed as TWO input refs on the same array whose index maps clamp to
blocks i-1 and i (window row w holds global row g = 8(i-1)+w; rows with
g outside [0, Z) are masked, which also covers the clamped duplicates).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["peaks_pallas_supported", "block_max_candidates_pallas"]

_NEG = float(np.finfo(np.float32).min)
_BIG = np.iinfo(np.int32).max


def peaks_pallas_supported(
    shape: tuple[int, int, int],
    block_size: tuple[int, int, int],
    blur_kernel_size: int,
) -> bool:
    """Gate for the fused kernel; the XLA path covers everything else."""
    use_pallas = (
        jax.default_backend() == "tpu"
        or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
    ) and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
    if not use_pallas:
        return False
    z, y, x = (int(s) for s in shape)
    if tuple(block_size) != (8, 8, 8) or blur_kernel_size not in (0, 3):
        return False
    if z % 8 or y % 8 or x % 128 or z < 8 or y < 8 or x < 128:
        return False
    # Per-program working set: two (8, Y, X) input refs + ~10 (Y, X) f32
    # temporaries (blur rows, zmax/zidx, per-j scratch).
    if (2 * 8 + 10) * y * x * 4 > 100 * 1024 * 1024:
        return False
    return True


def _masked_roll(v, shift, axis):
    """Circular roll with the wrapped-in rows zeroed (shift in {-1, +1})."""
    size = v.shape[axis]
    rolled = pltpu.roll(v, shift % size, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    if shift > 0:
        mask = idx >= shift
    else:
        mask = idx < size + shift
    return jnp.where(mask, rolled, 0.0)


def _peaks_kernel(praw_ref, craw_ref, max_ref, idx_ref, *, Z, Y, X, oy, blur):
    """One output z block: blur + z window max/argmin-idx + y window pooling.

    Window row w in [0, 16) holds global raw row g = 8*(i-1) + w; validity
    g in [0, Z) masks both the out-of-volume rows and the index-map clamp
    duplicates at i = 0 and i = oz-1.
    """
    i = pl.program_id(0)
    gbase = 8 * (i - 1)

    def wrow(w):
        return praw_ref[w] if w < 8 else craw_ref[w - 8]

    def walid(w):  # validity of window row w as an f32 scalar
        g = gbase + w
        return jnp.where((g >= 0) & (g < Z), 1.0, 0.0).astype(jnp.float32)

    iota_y = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)

    if blur:
        # In-plane (y, x) box sums are the same for every output row; the
        # z taps then combine three of the 10 needed plane sums. Compute
        # the plane sums once per window row in scratch order.
        def plane_sum(v):
            s = v + _masked_roll(v, 1, 0) + _masked_roll(v, -1, 0)
            return s + _masked_roll(s, 1, 1) + _masked_roll(s, -1, 1)

        # Divisor: count_include_pad=False — per-axis tap counts.
        cy = jnp.where((iota_y > 0) & (iota_y < Y - 1), 3.0, 2.0)
        cx = jnp.where((iota_x > 0) & (iota_x < X - 1), 3.0, 2.0)
        plane = [plane_sum(wrow(w)) for w in range(3, 13)]
    else:
        plane = None

    # The block's 8 z rows: output row r is global z row 8*i - 4 + r,
    # window row wr = r + 4.
    zmax = None
    smooth_rows = []
    valid_rows = []
    for r in range(8):
        wr = r + 4
        vz = walid(wr)
        if blur:
            zs = plane[wr - 1 - 3] * walid(wr - 1) + plane[wr - 3]
            zs = zs + plane[wr + 1 - 3] * walid(wr + 1)
            czn = walid(wr - 1) + 1.0 + walid(wr + 1)
            sm = zs / (czn * cy * cx)
        else:
            sm = wrow(wr)
        smooth_rows.append(sm)
        valid_rows.append(vz)
        masked = sm * vz + (1.0 - vz) * _NEG
        zmax = masked if zmax is None else jnp.maximum(zmax, masked)

    # Per-(y, x) min flat index among the 8 z cells equal to the z max.
    zidx = None
    for r in range(8):
        wr = r + 4
        gz = gbase + wr
        flat = (gz * Y + iota_y) * X + iota_x
        vz = valid_rows[r]
        hit = (smooth_rows[r] == zmax) & (vz > 0.0)
        cand = jnp.where(hit, flat, _BIG)
        zidx = cand if zidx is None else jnp.minimum(zidx, cand)

    # y-window pooling: output row j covers y in [8j-4, 8j+4) ∩ [0, Y).
    for j in range(oy):
        ys, ye = max(0, 8 * j - 4), min(Y, 8 * j + 4)
        zm = zmax[ys:ye]
        jm = jnp.max(zm, axis=0, keepdims=True)  # (1, X)
        ji = jnp.min(
            jnp.where(zm == jm, zidx[ys:ye], _BIG), axis=0, keepdims=True
        )
        max_ref[0, j, :] = jm[0]
        idx_ref[0, j, :] = ji[0]


@partial(jax.jit, static_argnames=("blur_kernel_size",))
def block_max_candidates_pallas(zyx: jax.Array, blur_kernel_size: int = 3):
    """Fused (values, flat_indices) — drop-in for block_max_candidates with
    block_size (8, 8, 8) on gated shapes."""
    Z, Y, X = (int(s) for s in zyx.shape)
    oz, oy, ox = Z // 8 + 1, Y // 8 + 1, X // 8 + 1
    nzb = Z // 8
    v = zyx.astype(jnp.float32)

    from biahub_tpu.kernels.pallas_fft import _vmem_params

    interpret = jax.default_backend() != "tpu"
    zymax, idxzy = pl.pallas_call(
        partial(
            _peaks_kernel, Z=Z, Y=Y, X=X, oy=oy,
            blur=bool(blur_kernel_size),
        ),
        grid=(oz,),
        in_specs=[
            pl.BlockSpec(
                (8, Y, X),
                lambda i: (jnp.clip(i - 1, 0, nzb - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, Y, X),
                lambda i: (jnp.clip(i, 0, nzb - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, oy, X), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oy, X), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((oz, oy, X), jnp.float32),
            jax.ShapeDtypeStruct((oz, oy, X), jnp.int32),
        ],
        interpret=interpret,
        **_vmem_params(interpret),
    )(v, v)

    # Lane-window epilogue on the tiny candidate planes: block l covers
    # x in [8l-4, 8l+4), pad (4, 4) to the 8*ox extent.
    pad = ((0, 0), (0, 0), (4, 8 * ox - X - 4))
    m = jax.lax.reduce_window(
        zymax, _NEG, jax.lax.max, (1, 1, 8), (1, 1, 8), pad
    )
    m_up = jnp.repeat(m, 8, axis=-1)[..., 4 : 4 + X]
    qual = zymax == m_up
    idx = jax.lax.reduce_window(
        jnp.where(qual, idxzy, _BIG), _BIG, jax.lax.min, (1, 1, 8),
        (1, 1, 8), pad,
    )
    return m.ravel(), idx.ravel()

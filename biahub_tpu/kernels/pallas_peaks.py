"""Fused Pallas peak-candidate kernel: blur + block-max + argmax in ONE pass.

The XLA formulation (kernels/peaks.py::_block_max_candidates_xla) is
bandwidth-bound at ~4.6 GB of HBM traffic per flagship volume: the separable
box blur (3 reduce_window passes), the strided block max-pool, and the
argmax-recovery broadcast/compare/min-window chain each re-touch the full
volume. This kernel reads the RAW volume once per (z block, y tile) —
plus the clamped halo blocks — computes the blur, the z and y window
maxima, and the per-column minimum flat index entirely in VMEM, and emits
only tiny candidate planes; a small XLA epilogue pools the lane-axis
windows. ~0.6 GB total traffic; measured 2.10 vs 5.83 ms for the XLA chain
at the flagship FOV (same harness, exact parity).

Semantics are IDENTICAL to the XLA path (reference geometry:
biahub/characterize_psf.py:562-710, torch ``max_pool3d(stride=block,
padding=block//2)``): block i covers voxels [8i-4, 8i+4), the box blur uses
count_include_pad=False divisors, ties resolve to the smallest flat C-order
index. Parity is pinned exactly on integer-valued volumes
(tests/test_pallas_peaks.py) where f32 sums are associativity-exact; on
arbitrary float data the blur's addition order differs from the XLA
separable passes (in-plane sums before the z taps vs z first), so a
last-ulp smooth-value tie can pick a different — equally valid — argmax
cell (measured 1 flipped index in 594k blocks on a random 2048^2 frame).

Grid: (output z blocks, y tiles). The torch geometry offsets blocks by
-block/2 and the blur adds one more halo row, so a program needs raw rows
just below its block range on both axes — expressed as FOUR input refs on
the same array whose index maps clamp to the previous/current (z block,
y tile); rows whose global coordinate falls outside the volume are masked,
which also neutralizes the clamp duplicates at the edges. Each y tile owns
TY/8 output rows plus one trailing row that is only meaningful on the last
tile (the [Y-4, Y+4) block); the epilogue gathers each row from its owner.
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


def _pick_ty(y: int, x: int) -> int | None:
    """Largest y-tile (divisor of Y, multiple of 8) whose working set fits:
    4 halo refs of (8, TY, X) plus ~24 (TY+8, X) f32 temporaries."""
    for ty in range(y, 7, -8):
        if y % ty:
            continue
        if (4 * 8 * ty + 24 * (ty + 8)) * x * 4 <= 80 * 1024 * 1024:
            return ty
    return None


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
    return _pick_ty(y, x) is not None


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


def _peaks_kernel(*refs, Z, Y, X, TY, blur, single_tile=False):
    """One (z block, y tile): blur + z window max/argmin + y window pooling.

    z window row w in [0, 16) holds global row gz = 8*(i-1) + w; the y
    window holds global rows gy = TY*t - 8 + yy for yy in [0, TY+8) (the
    previous tile's last 8 rows are the left halo; blocks never need a
    right halo because the -4 offset ends them 4 rows before the tile
    boundary). Out-of-volume rows — including the index-map clamp
    duplicates — are zeroed before the blur (count_include_pad=False
    excludes them by construction) and -inf/invalid in the max/argmin.
    """
    if single_tile:
        # nyt == 1: the left y-halo is entirely below the volume (gy < 0,
        # masked to zero) — skip the redundant halo refs and pad instead
        # (halves the HBM reads; measured 2.10 vs 2.97 ms at the flagship).
        zp_yc_ref, zc_yc_ref, max_ref, idx_ref = refs
        zp_yp_ref = zc_yp_ref = None
    else:
        zp_yp_ref, zp_yc_ref, zc_yp_ref, zc_yc_ref, max_ref, idx_ref = refs
    i = pl.program_id(0)
    t = pl.program_id(1)
    gzbase = 8 * (i - 1)
    gy0 = TY * t - 8
    Yw = TY + 8
    q = TY // 8

    iota_y = jax.lax.broadcasted_iota(jnp.int32, (Yw, X), 0)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (Yw, X), 1)
    gy = iota_y + gy0
    yvalid = (gy >= 0) & (gy < Y)

    def wrow(w):
        """Window z-row w as the (Yw, X) y-window, out-of-volume rows
        zeroed."""
        yp, yc = (zp_yp_ref, zp_yc_ref) if w < 8 else (zc_yp_ref, zc_yc_ref)
        r = w if w < 8 else w - 8
        if single_tile:
            v = jnp.concatenate(
                [jnp.zeros((8, X), jnp.float32), yc[r]], axis=0
            )
        else:
            v = jnp.concatenate([yp[r, TY - 8 :, :], yc[r]], axis=0)
        return jnp.where(yvalid, v, 0.0)

    def walid(w):  # validity of window z-row w as an f32 scalar
        g = gzbase + w
        return jnp.where((g >= 0) & (g < Z), 1.0, 0.0).astype(jnp.float32)

    if blur:
        # In-plane (y, x) box sums once per window z-row; the z taps then
        # combine three plane sums per output row.
        def plane_sum(v):
            s = v + _masked_roll(v, 1, 0) + _masked_roll(v, -1, 0)
            return s + _masked_roll(s, 1, 1) + _masked_roll(s, -1, 1)

        # count_include_pad=False divisors from GLOBAL coordinates.
        cy = jnp.where((gy > 0) & (gy < Y - 1), 3.0, 2.0)
        cx = jnp.where((iota_x > 0) & (iota_x < X - 1), 3.0, 2.0)
        plane = [plane_sum(wrow(w)) for w in range(3, 13)]
    else:
        plane = None

    # The block's 8 z rows: output row r is global z row 8*i - 4 + r,
    # window z-row wr = r + 4.
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
        masked = jnp.where(yvalid & (vz > 0.0), sm, _NEG)
        zmax = masked if zmax is None else jnp.maximum(zmax, masked)

    # Per-(y, x) min flat index among the 8 z cells equal to the z max.
    zidx = None
    for r in range(8):
        wr = r + 4
        gz = gzbase + wr
        flat = (gz * Y + gy) * X + iota_x
        hit = (smooth_rows[r] == zmax) & yvalid & (valid_rows[r] > 0.0)
        cand = jnp.where(hit, flat, _BIG)
        zidx = cand if zidx is None else jnp.minimum(zidx, cand)

    # y-window pooling: local row j_l is global block j = t*q + j_l,
    # covering gy in [8j-4, 8j+4) = window rows [8*j_l+4, 8*j_l+12).
    # Row j_l == q straddles the tile boundary and is only meaningful on
    # the LAST tile (where the upper half is beyond Y and already -inf);
    # the epilogue discards it elsewhere.
    for j_l in range(q + 1):
        ys, ye = 8 * j_l + 4, min(8 * j_l + 12, Yw)
        zm = zmax[ys:ye]
        jm = jnp.max(zm, axis=0, keepdims=True)  # (1, X)
        ji = jnp.min(
            jnp.where(zm == jm, zidx[ys:ye], _BIG), axis=0, keepdims=True
        )
        max_ref[0, 0, j_l, :] = jm[0]
        idx_ref[0, 0, j_l, :] = ji[0]


@partial(jax.jit, static_argnames=("blur_kernel_size", "_ty_override"))
def block_max_candidates_pallas(
    zyx: jax.Array, blur_kernel_size: int = 3, _ty_override: int | None = None
):
    """Fused (values, flat_indices) — drop-in for block_max_candidates with
    block_size (8, 8, 8) on gated shapes. ``_ty_override`` pins the y-tile
    size (tests exercise the multi-tile halos on small volumes)."""
    Z, Y, X = (int(s) for s in zyx.shape)
    oz, oy, ox = Z // 8 + 1, Y // 8 + 1, X // 8 + 1
    nzb = Z // 8
    TY = _ty_override or _pick_ty(Y, X)
    nyt = Y // TY
    q = TY // 8
    v = zyx.astype(jnp.float32)

    from biahub_tpu.kernels.pallas_fft import _vmem_params

    def zspec(dz, dy):
        return pl.BlockSpec(
            (8, TY, X),
            lambda i, t, _dz=dz, _dy=dy: (
                jnp.clip(i - _dz, 0, nzb - 1),
                jnp.clip(t - _dy, 0, nyt - 1),
                0,
            ),
            memory_space=pltpu.VMEM,
        )

    interpret = jax.default_backend() != "tpu"
    single = nyt == 1
    in_specs = (
        [zspec(1, 0), zspec(0, 0)]
        if single
        else [zspec(1, 1), zspec(1, 0), zspec(0, 1), zspec(0, 0)]
    )
    zymax, idxzy = pl.pallas_call(
        partial(_peaks_kernel, Z=Z, Y=Y, X=X, TY=TY,
                blur=bool(blur_kernel_size), single_tile=single),
        grid=(oz, nyt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, q + 1, X), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q + 1, X), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((oz, nyt, q + 1, X), jnp.float32),
            jax.ShapeDtypeStruct((oz, nyt, q + 1, X), jnp.int32),
        ],
        interpret=interpret,
        **_vmem_params(interpret),
    )(*([v, v] if single else [v, v, v, v]))

    # Gather each output y row from its owning tile (the straddle row is
    # real only on the last tile), then pool the lane-axis windows on the
    # tiny candidate planes: block l covers x in [8l-4, 8l+4).
    ty_of = np.minimum(np.arange(oy) // q, nyt - 1)
    row_of = (ty_of * (q + 1) + np.arange(oy) - ty_of * q).astype(np.int32)
    zymax = jnp.take(zymax.reshape(oz, nyt * (q + 1), X), row_of, axis=1)
    idxzy = jnp.take(idxzy.reshape(oz, nyt * (q + 1), X), row_of, axis=1)

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

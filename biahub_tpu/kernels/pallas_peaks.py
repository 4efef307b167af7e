"""Fused Pallas peak-candidate kernel: blur + block-max + argmax in ONE pass.

The XLA formulation (kernels/peaks.py::_block_max_candidates_xla) is
bandwidth-bound at ~4.6 GB of HBM traffic per flagship volume: the separable
box blur (3 reduce_window passes), the strided block max-pool, and the
argmax-recovery broadcast/compare/min-window chain each re-touch the full
volume. This kernel reads the RAW volume approximately once — each program
owns a (KZ z-blocks, TY y-rows) chunk and its halos arrive as thin 8-row
refs, so the read amplification is (8*KZ + 8)*(TY + 8)/(8*KZ*TY) ≈ 1.25
at the production geometries — computes the blur, the z and y window
maxima, and the per-column minimum flat index entirely in VMEM, and emits
only tiny candidate planes; a small XLA epilogue pools the lane-axis
windows.

The round-4 version read FULL neighbor blocks as halos (4 refs of
(8, TY, X) per program): at the camera-frame geometry (64 x 2048 x 2048,
16 y tiles) that was 4.5x amplification — 4.8 GB of reads, 6.24 ms of
device time (measured, scripts/trace_peaks_camera.py) for a volume whose
read floor is 1.31 ms. The thin-halo chunked scheme cuts both production
geometries to ~1.25x.

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

Grid: (z chunks, y tiles); a program emits KZ+1 z output blocks x (q+1)
y output rows. The torch geometry offsets blocks by -block/2 and the blur
adds one more halo row, so block k needs raw rows [8k-5, 8k+5): the first
block of a chunk reaches 8 rows below it (the z-halo ref, clamped at the
volume edge and masked), and the straddle block k == KZ ends 4 rows past
the chunk — beyond the volume on the LAST chunk (masked) and owned by the
next chunk everywhere else (computed under ``pl.when`` only on the last
chunk; the epilogue gathers each output row from its owner). The y axis
uses the same construction with TY-row tiles and an 8-row left halo.
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


def _pick_tiles(z: int, y: int, x: int) -> tuple[int, int] | None:
    """(KZ, TY) minimizing read amplification subject to VMEM.

    Inputs per program: the (8*KZ, TY) main chunk, an 8-row z halo (when
    there is more than one chunk), and 8-column y halos (when more than one
    tile) — double-buffered by the pipeline — plus ~40 (TY+8, X) f32
    working rows (the liveness peak of the cached plane sums, smooth rows,
    and the max/argmin accumulators). Ties prefer the larger chunk (fewer
    programs, deeper DMA pipelining)."""
    nzb = z // 8
    best = None
    for kz in range(1, nzb + 1):
        if nzb % kz:
            continue
        ncz = nzb // kz
        for ty in range(8, y + 1, 8):
            if y % ty:
                continue
            nyt = y // ty
            rows_z = 8 * kz + (8 if ncz > 1 else 0)
            cols_y = ty + (8 if nyt > 1 else 0)
            in_bytes = rows_z * cols_y * x * 4
            work = in_bytes * 2 + 40 * (ty + 8) * x * 4
            if work > 88 * 1024 * 1024:
                continue
            amp = (rows_z * cols_y) / (8 * kz * ty)
            key = (amp, -(8 * kz * ty))
            if best is None or key < best[0]:
                best = (key, kz, ty)
    return (best[1], best[2]) if best else None


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
    return _pick_tiles(z, y, x) is not None


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


def _peaks_kernel(*refs, Z, Y, X, KZ, TY, ncz, nyt, blur):
    """One (z chunk, y tile): blur + z window max/argmin + y window pooling.

    Row accessors take a STATIC chunk-relative z offset ``off`` in
    [-8, 8*KZ+5): negative offsets come from the thin z-halo ref, offsets
    past the chunk exist only for the straddle block on the last chunk
    (where they are beyond Z and masked) — zeros are substituted so the
    unrolled code stays static. Out-of-volume rows — including the
    index-map clamp duplicates — are zeroed before the blur
    (count_include_pad=False excludes them by construction) and
    -inf/invalid in the max/argmin. Rows and plane sums are cached by
    offset: consecutive blocks share their boundary rows, and liveness
    frees each entry after its last (static) use.
    """
    it = iter(refs)
    zc_ref = next(it)
    zh_ref = next(it) if ncz > 1 else None
    zcy_ref = next(it) if nyt > 1 else None
    zhy_ref = next(it) if (ncz > 1 and nyt > 1) else None
    max_ref = next(it)
    idx_ref = next(it)
    ci = pl.program_id(0)
    t = pl.program_id(1)
    gz0 = 8 * KZ * ci  # global z of the chunk's first row
    gy0 = TY * t - 8
    Yw = TY + 8
    q = TY // 8

    iota_y = jax.lax.broadcasted_iota(jnp.int32, (Yw, X), 0)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (Yw, X), 1)
    gy = iota_y + gy0
    yvalid = (gy >= 0) & (gy < Y)

    rows: dict = {}
    planes: dict = {}

    def wrow(off):
        """Chunk-relative z row ``off`` as the (Yw, X) y-window,
        out-of-volume rows zeroed."""
        if off in rows:
            return rows[off]
        if off < 0:
            main = zh_ref[off + 8] if ncz > 1 else None
            halo = zhy_ref[off + 8] if (ncz > 1 and nyt > 1) else None
        elif off >= 8 * KZ:
            main = None  # straddle rows past the chunk: masked or discarded
            halo = None
        else:
            main = zc_ref[off]
            halo = zcy_ref[off] if nyt > 1 else None
        if main is None:
            v = jnp.zeros((Yw, X), jnp.float32)
        else:
            left = halo if halo is not None else jnp.zeros((8, X), jnp.float32)
            v = jnp.where(yvalid, jnp.concatenate([left, main], axis=0), 0.0)
        rows[off] = v
        return v

    def walid(off):  # validity of chunk z row ``off`` as an f32 scalar
        g = gz0 + off
        return jnp.where((g >= 0) & (g < Z), 1.0, 0.0).astype(jnp.float32)

    if blur:
        # count_include_pad=False divisors from GLOBAL coordinates.
        cy = jnp.where((gy > 0) & (gy < Y - 1), 3.0, 2.0)
        cx = jnp.where((iota_x > 0) & (iota_x < X - 1), 3.0, 2.0)

        def plane_at(off):
            """In-plane (y, x) box sum of z row ``off`` (cached: adjacent
            blocks share two boundary rows)."""
            if off not in planes:
                v = wrow(off)
                s = v + _masked_roll(v, 1, 0) + _masked_roll(v, -1, 0)
                planes[off] = s + _masked_roll(s, 1, 1) + _masked_roll(s, -1, 1)
            return planes[off]

    def emit_block(k):
        """Output z block k: rows gz = gz0 + 8k - 4 + r for r in [0, 8)."""
        zmax = None
        smooth_rows = []
        valid_rows = []
        for r in range(8):
            off = 8 * k + r - 4
            vz = walid(off)
            if blur:
                zs = plane_at(off - 1) * walid(off - 1) + plane_at(off)
                zs = zs + plane_at(off + 1) * walid(off + 1)
                czn = walid(off - 1) + 1.0 + walid(off + 1)
                sm = zs / (czn * cy * cx)
            else:
                sm = wrow(off)
            smooth_rows.append(sm)
            valid_rows.append(vz)
            masked = jnp.where(yvalid & (vz > 0.0), sm, _NEG)
            zmax = masked if zmax is None else jnp.maximum(zmax, masked)

        # Per-(y, x) min flat index among the 8 z cells equal to the z max.
        zidx = None
        for r in range(8):
            off = 8 * k + r - 4
            gz = gz0 + off
            flat = (gz * Y + gy) * X + iota_x
            hit = (smooth_rows[r] == zmax) & yvalid & (valid_rows[r] > 0.0)
            cand = jnp.where(hit, flat, _BIG)
            zidx = cand if zidx is None else jnp.minimum(zidx, cand)

        # y-window pooling: local row j_l is global block j = t*q + j_l,
        # covering gy in [8j-4, 8j+4) = window rows [8*j_l+4, 8*j_l+12).
        # Row j_l == q straddles the tile boundary and is only meaningful
        # on the LAST tile (where the upper half is beyond Y and already
        # -inf); the epilogue discards it elsewhere.
        for j_l in range(q + 1):
            ys, ye = 8 * j_l + 4, min(8 * j_l + 12, Yw)
            zm = zmax[ys:ye]
            jm = jnp.max(zm, axis=0, keepdims=True)  # (1, X)
            ji = jnp.min(
                jnp.where(zm == jm, zidx[ys:ye], _BIG), axis=0, keepdims=True
            )
            max_ref[0, 0, k * (q + 1) + j_l, :] = jm[0]
            idx_ref[0, 0, k * (q + 1) + j_l, :] = ji[0]

    for k in range(KZ):
        emit_block(k)
    # The z straddle block is real only on the LAST chunk (its rows past
    # the chunk are beyond Z there); elsewhere its output rows are
    # discarded by the epilogue gather — skip the wasted VPU work.
    if ncz > 1:
        @pl.when(ci == ncz - 1)
        def _():
            emit_block(KZ)
    else:
        emit_block(KZ)


@partial(
    jax.jit, static_argnames=("blur_kernel_size", "_ty_override", "_kz_override")
)
def block_max_candidates_pallas(
    zyx: jax.Array,
    blur_kernel_size: int = 3,
    _ty_override: int | None = None,
    _kz_override: int | None = None,
):
    """Fused (values, flat_indices) — drop-in for block_max_candidates with
    block_size (8, 8, 8) on gated shapes. ``_ty_override``/``_kz_override``
    pin the tile sizes (tests exercise the cross-chunk halos and straddle
    ownership on small volumes)."""
    Z, Y, X = (int(s) for s in zyx.shape)
    oz, oy, ox = Z // 8 + 1, Y // 8 + 1, X // 8 + 1
    nzb = Z // 8
    if _ty_override or _kz_override:
        TY = _ty_override or Y
        KZ = _kz_override or nzb
    else:
        KZ, TY = _pick_tiles(Z, Y, X)
    nyt = Y // TY
    ncz = nzb // KZ
    q = TY // 8
    v = zyx.astype(jnp.float32)

    from biahub_tpu.kernels.pallas_fft import _vmem_params

    def spec(rows, cols, zmap, ymap):
        return pl.BlockSpec(
            (rows, cols, X),
            lambda i, t, _zm=zmap, _ym=ymap: (_zm(i), _ym(t), 0),
            memory_space=pltpu.VMEM,
        )

    z_cur = lambda i: i
    z_halo = lambda i: jnp.clip(KZ * i - 1, 0, nzb - 1)
    y_cur = lambda t: t
    y_halo = lambda t: jnp.clip(t * q - 1, 0, Y // 8 - 1)

    in_specs = [spec(8 * KZ, TY, z_cur, y_cur)]
    if ncz > 1:
        in_specs.append(spec(8, TY, z_halo, y_cur))
    if nyt > 1:
        in_specs.append(spec(8 * KZ, 8, z_cur, y_halo))
        if ncz > 1:
            in_specs.append(spec(8, 8, z_halo, y_halo))

    interpret = jax.default_backend() != "tpu"
    out_rows = (KZ + 1) * (q + 1)
    zymax, idxzy = pl.pallas_call(
        partial(_peaks_kernel, Z=Z, Y=Y, X=X, KZ=KZ, TY=TY, ncz=ncz,
                nyt=nyt, blur=bool(blur_kernel_size)),
        grid=(ncz, nyt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, out_rows, X), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, out_rows, X), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ncz, nyt, out_rows, X), jnp.float32),
            jax.ShapeDtypeStruct((ncz, nyt, out_rows, X), jnp.int32),
        ],
        interpret=interpret,
        **_vmem_params(interpret),
    )(*([v] * len(in_specs)))

    # Gather each output (z block, y row) from its owning program — the
    # straddle entries (z block KZ, y row q) are real only on the last
    # chunk/tile — then pool the lane-axis windows on the tiny candidate
    # planes: block l covers x in [8l-4, 8l+4).
    cz_of = np.minimum(np.arange(oz) // KZ, ncz - 1)
    zrow_of = (cz_of * (KZ + 1) + np.arange(oz) - cz_of * KZ).astype(np.int32)
    ty_of = np.minimum(np.arange(oy) // q, nyt - 1)
    row_of = (ty_of * (q + 1) + np.arange(oy) - ty_of * q).astype(np.int32)
    # (ncz, nyt, KZ+1, q+1, X) -> rows indexed (chunk, k) and (tile, j).
    zymax = zymax.reshape(ncz, nyt, KZ + 1, q + 1, X)
    idxzy = idxzy.reshape(ncz, nyt, KZ + 1, q + 1, X)
    zymax = zymax.transpose(0, 2, 1, 3, 4).reshape(
        ncz * (KZ + 1), nyt * (q + 1), X
    )
    idxzy = idxzy.transpose(0, 2, 1, 3, 4).reshape(
        ncz * (KZ + 1), nyt * (q + 1), X
    )
    zymax = jnp.take(jnp.take(zymax, zrow_of, axis=0), row_of, axis=1)
    idxzy = jnp.take(jnp.take(idxzy, zrow_of, axis=0), row_of, axis=1)

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

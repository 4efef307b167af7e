"""Fused Pallas deskew kernel: the scan-axis lerp as one-hot MXU matmuls.

The TPU-native replacement for the reference's torch ``grid_sample`` fast
path (reference: biahub/deskew.py:459-545) and its 2D-grid trick
(reference: biahub/deskew.py:102-157).

The XLA formulation in :mod:`biahub_tpu.kernels.deskew` lowers to transpose →
gather → transpose, three full passes over HBM (~21 ms per 256x256x1024
volume on v5e); a row-at-a-time VPU kernel reaches ~14 ms. This kernel gets
the resample onto the MXU: for a tile of 128 output-x positions, the
fractional scan coordinates span at most ceil(128 * px_to_scan_ratio) + 2
input rows, so the whole tile is one (128, K) @ (K, Y) matmul where the
(128, K) weight matrix holds the two-banded interpolation weights, built
on-the-fly from broadcasted iota comparisons. Out-of-range samples fall out
naturally: their one-hot columns land outside the [0, K) slab window.

Grid: one program per AVERAGED output z group (= ``average_window``
consecutive input tilt rows). Each program DMAs its (average_window, Z_in,
X_in) slab block (the input is pre-transposed and x-flipped by XLA in the
same pass), accumulates the per-row banded matmuls, and emits the averaged
(Y_out, X_out) output block directly — the z slice-averaging that the XLA
path runs as a separate 508 MB round trip is free here. Front edge-padding
of the tilt axis reproduces ``average_n_slices``'s edge-padded tail group
exactly (the padded rows replicate tilt row 0 = output z slice Z_out - 1).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from biahub_tpu.kernels.deskew import get_deskewed_data_shape

__all__ = ["deskew_zyx_pallas", "deskew_zyx_pallas_batched"]

TILE_X = 128


def _deskew_kernel(raw_ref, out_ref, *, params):
    Z_in, X_in, X_out, K, n_tiles, ct, px, offset, avg, Yp, Z_out = params
    k = pl.program_id(0)

    for tile in range(n_tiles):
        tile_w = min(TILE_X, X_out - tile * TILE_X)
        # Fractional scan coordinate for each of the tile's x positions
        xo = (
            tile * TILE_X
            + jax.lax.broadcasted_iota(jnp.int32, (tile_w, 1), 0)
        ).astype(jnp.float32)

        acc = jnp.zeros((X_in, tile_w), jnp.float32)
        for j in range(avg):
            # Output z of this group member: tilt rows arrive in natural
            # order, so z runs in reverse — zo = Yp - 1 - (k * avg + j).
            # Front-padded rows replicate the z = Z_out - 1 slice, so their
            # resample coordinate clamps to it (average_n_slices tail
            # semantics).
            zo = Yp - 1 - j - k * avg
            zo_f = jnp.minimum(zo, Z_out - 1).astype(jnp.float32)
            in_z = px * xo - px * ct * zo_f + offset  # (tile_w, 1)
            i0 = jnp.floor(in_z)
            frac = in_z - i0
            i0 = i0.astype(jnp.int32)

            # Slab window start: in_z is increasing in xo, so the tile's rows
            # fit in [start, start + K). Mosaic requires sublane slice starts
            # to be provably 8-aligned, so round down (K has an 8-row margin).
            start = jnp.clip(i0[0, 0], 0, max(Z_in - K, 0))
            start = pl.multiple_of((start // 8) * 8, 8)
            offs = i0 - start  # (tile_w, 1); outside [0, K) for invalid rows

            cols = jax.lax.broadcasted_iota(jnp.int32, (tile_w, K), 1)
            w = (1.0 - frac) * (cols == offs) + frac * (cols == offs + 1)

            slab = raw_ref[j, pl.ds(start, K), :]  # (K, Y)
            # Contract K on both operands -> (Y, tile_w): the MXU consumes
            # the transposed layouts natively, so no explicit VMEM transpose
            # is needed. Precision follows BIAHUB_TPU_WARP_PRECISION
            # (default 'high': 3-term bf16 split, ~1e-5 rel; 'highest' for
            # f32-mantissa parity with the XLA formulation).
            from biahub_tpu.kernels.pallas_resample import _banded_dot

            acc = acc + _banded_dot(slab, w)
        out_ref[0, :, pl.ds(tile * TILE_X, tile_w)] = (
            acc if avg == 1 else acc * (1.0 / avg)
        )


def _deskew_kernel_t(raw_ref, out_ref, *, params):
    """Transposed-output deskew: 8 averaged z groups per program, blocks
    written directly in (X_out, Z_out_groups, Y_out) order — the fused
    in-plane warp's input layout (affine.py ``input_xzy``), killing the
    chain's warp-input transpose. The banded dot runs in the mirrored
    orientation (w @ slab), so the transposed tile is free on the MXU;
    stores go to static ``[:, s, :]`` sublane slots (the fast direction).
    The input carries ``extra`` more front-pad groups so every reversed
    8-group input block is aligned; their slots land past the out array's
    ragged last block and are masked away.
    """
    (Z_in, X_in, X_out, K, ct, px, offset, avg, yp8, Z_out, groups8) = params
    from biahub_tpu.kernels.pallas_resample import _banded_dot_left

    g = pl.program_id(0)
    tile = pl.program_id(1)
    # The x tiles ride the grid, so every program computes a full TILE_X
    # stripe; the ragged last x block is masked by the out spec.
    xo = (
        tile * TILE_X
        + jax.lax.broadcasted_iota(jnp.int32, (TILE_X, 1), 0)
    ).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_X, K), 1)
    for s in range(8):
        kprime = groups8 - 1 - (g * 8 + s)  # natural padded group index
        acc = jnp.zeros((TILE_X, X_in), jnp.float32)
        for j in range(avg):
            zo_val = yp8 - 1 - j - kprime * avg
            zo_f = jnp.minimum(zo_val, Z_out - 1).astype(jnp.float32)
            in_z = px * xo - px * ct * zo_f + offset
            i0 = jnp.floor(in_z)
            frac = in_z - i0
            i0 = i0.astype(jnp.int32)
            start = jnp.clip(i0[0, 0], 0, max(Z_in - K, 0))
            start = pl.multiple_of((start // 8) * 8, 8)
            offs = i0 - start
            w = (1.0 - frac) * (cols == offs) + frac * (cols == offs + 1)
            slab = raw_ref[(7 - s) * avg + j, pl.ds(start, K), :]  # (K, Y)
            acc = acc + _banded_dot_left(w, slab)
        out_ref[:, s, :] = acc if avg == 1 else acc * (1.0 / avg)


def _deskew_kernel_manual(hbm_ref, out_ref, slab_ref, sem_ref, *, params):
    """Manually double-buffered xzy deskew: batch on the grid, input in HBM.

    Mosaic's automatic pipeline prefetches changed input blocks one program
    ahead; with 4 x-tile programs per 25 MB group block the fetch for block
    g+1 starts at (g, t=3) and must hide behind ONE ~15 us tile program —
    it cannot, so the automatic kernel runs at DMA + compute (measured
    0.99 ms/vol vs a 0.66 ms/vol DMA floor, scripts/probe_deskew_overlap.py).
    Here the DMA chain advances only at tile 0: the fetch for group block
    i+1 overlaps all of block i's tile programs (~60 us of MXU work vs a
    ~40 us fetch) and the kernel measures at the DMA floor with exact bit
    parity. Pallas requires ANY-space inputs be whole-array with a trivial
    index map, so the batch axis rides the grid (callers must NOT vmap —
    see :func:`deskew_zyx_pallas_batched`).
    """
    (Z_in, X_in, X_out, K, ct, px, offset, avg, yp, Z_out, groups8, n_g8,
     batch, n_tiles) = params
    from biahub_tpu.kernels.pallas_resample import _banded_dot_left

    b = pl.program_id(0)
    g = pl.program_id(1)
    tile = pl.program_id(2)
    rows = 8 * avg
    i = b * n_g8 + g

    def dma(slot, bb, blk):
        # Natural group-block order is reversed (tilt rows arrive in
        # natural order, z runs in reverse).
        return pltpu.make_async_copy(
            hbm_ref.at[bb, pl.ds((n_g8 - 1 - blk) * rows, rows)],
            slab_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(tile == 0)
    def _():
        @pl.when(i == 0)
        def _():
            dma(0, 0, 0).start()

        nxt = i + 1

        @pl.when(nxt < batch * n_g8)
        def _():
            dma(nxt % 2, nxt // n_g8, nxt % n_g8).start()

        dma(i % 2, b, g).wait()

    slot = i % 2
    xo = (
        tile * TILE_X
        + jax.lax.broadcasted_iota(jnp.int32, (TILE_X, 1), 0)
    ).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_X, K), 1)
    for s in range(8):
        kprime = groups8 - 1 - (g * 8 + s)
        acc = jnp.zeros((TILE_X, X_in), jnp.float32)
        for j in range(avg):
            zo_val = yp - 1 - j - kprime * avg
            zo_f = jnp.minimum(zo_val, Z_out - 1).astype(jnp.float32)
            in_z = px * xo - px * ct * zo_f + offset
            i0 = jnp.floor(in_z)
            frac = in_z - i0
            i0 = i0.astype(jnp.int32)
            start = jnp.clip(i0[0, 0], 0, max(Z_in - K, 0))
            start = pl.multiple_of((start // 8) * 8, 8)
            offs = i0 - start
            w = (1.0 - frac) * (cols == offs) + frac * (cols == offs + 1)
            slab = slab_ref[slot, (7 - s) * avg + j, pl.ds(start, K), :]
            acc = acc + _banded_dot_left(w, slab)
        out_ref[:, s, :] = acc if avg == 1 else acc * (1.0 / avg)


def _deskew_kernel_manual_zyx(hbm_ref, out_ref, slab_ref, sem_ref, *,
                              params):
    """Manually double-buffered ZYX deskew — :func:`_deskew_kernel_manual`
    with the store side in the standard (Z, Y, X) output layout.

    Identical DMA chain and resample math (same zo/kprime mapping, so the
    8-aligned groups8 front pad lands past the ragged last out block and is
    masked); the banded dot runs in the automatic zyx kernel's orientation
    (``_banded_dot(slab, w)`` -> (Y_out, tile_w)) for bit parity with it,
    and each z slot stores to the out block's static major index
    ``out_ref[s]``. Out blocks are (8, Y_out, TILE_X): the ragged X_out
    lane tile and the ragged groups block are both masked by the spec.
    """
    (Z_in, X_in, X_out, K, ct, px, offset, avg, yp, Z_out, groups8, n_g8,
     batch, n_tiles) = params
    from biahub_tpu.kernels.pallas_resample import _banded_dot

    b = pl.program_id(0)
    g = pl.program_id(1)
    tile = pl.program_id(2)
    rows = 8 * avg
    i = b * n_g8 + g

    def dma(slot, bb, blk):
        return pltpu.make_async_copy(
            hbm_ref.at[bb, pl.ds((n_g8 - 1 - blk) * rows, rows)],
            slab_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(tile == 0)
    def _():
        @pl.when(i == 0)
        def _():
            dma(0, 0, 0).start()

        nxt = i + 1

        @pl.when(nxt < batch * n_g8)
        def _():
            dma(nxt % 2, nxt // n_g8, nxt % n_g8).start()

        dma(i % 2, b, g).wait()

    slot = i % 2
    xo = (
        tile * TILE_X
        + jax.lax.broadcasted_iota(jnp.int32, (TILE_X, 1), 0)
    ).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_X, K), 1)
    for s in range(8):
        kprime = groups8 - 1 - (g * 8 + s)
        acc = jnp.zeros((X_in, TILE_X), jnp.float32)
        for j in range(avg):
            zo_val = yp - 1 - j - kprime * avg
            zo_f = jnp.minimum(zo_val, Z_out - 1).astype(jnp.float32)
            in_z = px * xo - px * ct * zo_f + offset
            i0 = jnp.floor(in_z)
            frac = in_z - i0
            i0 = i0.astype(jnp.int32)
            start = jnp.clip(i0[0, 0], 0, max(Z_in - K, 0))
            start = pl.multiple_of((start // 8) * 8, 8)
            offs = i0 - start
            w = (1.0 - frac) * (cols == offs) + frac * (cols == offs + 1)
            slab = slab_ref[slot, (7 - s) * avg + j, pl.ds(start, K), :]
            acc = acc + _banded_dot(slab, w)
        out_ref[s, :, :] = acc if avg == 1 else acc * (1.0 / avg)


# Double-buffered manual slab scratch budget: 2 x (8 * avg * Z_in * X_in)
# f32 rows must fit VMEM next to the pipelined output blocks (the flagship
# is 2 x 25 MB). Past this the automatic kernel takes over.
_MANUAL_SCRATCH_BYTES = 56 * 1024 * 1024


def manual_dma_deskew_supported(
    zyx_shape: tuple[int, int, int],
    average_window: int,
    out_layout: str,
    tpu: bool | None = None,
) -> bool:
    """Gate for the manually pipelined batched kernels (xzy and zyx
    layouts; the zyx form additionally requires ``skip_flip=True`` at the
    call site — see :func:`deskew_zyx_pallas_batched`)."""
    if os.environ.get("BIAHUB_TPU_NO_MANUAL_DMA") == "1":
        return False
    if out_layout not in ("xzy", "zyx"):
        return False
    Z_in, Y_in, X_in = zyx_shape
    # Mosaic requires the dynamic (slot, row) scratch slices' LANE extent
    # (X_in) be 128-aligned on TPU (pallas_resample._manual_batched_ok has
    # the full note); interpret mode (CPU tests) is exempt.
    if tpu is None:
        tpu = jax.default_backend() == "tpu"
    if tpu and X_in % 128 != 0:
        return False
    scratch = 2 * 8 * int(average_window) * Z_in * X_in * 4
    return scratch <= _MANUAL_SCRATCH_BYTES


@partial(
    jax.jit,
    static_argnames=(
        "ls_angle_deg",
        "px_to_scan_ratio",
        "keep_overhang",
        "average_window",
        "skip_flip",
        "pre_transposed_zyx_shape",
        "out_layout",
        "pad_groups8",
    ),
)
def deskew_zyx_pallas_batched(
    raw_data: jax.Array,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int = 1,
    skip_flip: bool = False,
    pre_transposed_zyx_shape: tuple[int, int, int] | None = None,
    out_layout: str = "zyx",
    pad_groups8: bool = False,
) -> jax.Array:
    """Deskew a BATCH of ZYX volumes — batch axis on the Pallas grid.

    Semantically ``jax.vmap(deskew_zyx_pallas)(raw_data)`` (bit-exact), but
    the xzy path runs :func:`_deskew_kernel_manual`, whose double-buffered
    HBM DMAs overlap the banded matmuls (0.99 -> 0.67 ms/vol measured on
    v5e, scripts/probe_deskew_overlap.py). Pallas forbids non-trivial block
    indexing of ANY-space inputs, which a vmapped kernel would need — hence
    the explicit batch entry point. Falls back to the vmapped automatic
    kernel off this path (zyx layout, oversized working sets,
    BIAHUB_TPU_NO_MANUAL_DMA=1).

    ``pad_groups8`` (xzy only): emit the z-groups axis padded up to a
    multiple of 8 (physical ``groups8`` slices instead of ``groups``). The
    pad slices are finite clamped-edge resamples, never NaN; a downstream
    batched warp needs the 8-aligned sublane extent for its manual-DMA slab
    slices (pallas_resample._manual_batched_ok) and masks the pad through
    its logical-domain mask — the same contract as the spectral engine's
    z-padded xzy handoff.

    ``out_layout="zyx"`` runs :func:`_deskew_kernel_manual_zyx` (same DMA
    chain, standard output frame; the headline deconvolve+deskew step and
    the deskew verb's batches). Its pre-transposed input contract is the
    GROUPS8-padded (B, groups8*avg, Z, X) layout (pass C's ``yzx_pad``
    sized for 8-group blocks) — the vmap fallback slices the extra front
    pad back off, so callers pad for the manual contract unconditionally.

    Single-device only: the batch grid axis cannot be partitioned by SPMD;
    multi-device callers keep ``jax.vmap(deskew_zyx_pallas)``.
    """
    assert raw_data.ndim == 4, raw_data.shape
    zyx_shape = (
        pre_transposed_zyx_shape
        if pre_transposed_zyx_shape is not None
        else tuple(int(s) for s in raw_data.shape[1:])
    )
    if not manual_dma_deskew_supported(
        zyx_shape, average_window, out_layout
    ):
        pre = raw_data
        if (
            pre_transposed_zyx_shape is not None
            and out_layout == "zyx"
        ):
            # Batched-zyx callers pad for the manual kernel's groups8
            # contract; the per-volume kernel wants groups*avg rows.
            avg_w = int(average_window)
            groups = -(-zyx_shape[1] // avg_w)
            extra = int(pre.shape[1]) - groups * avg_w
            if extra:
                pre = pre[:, extra:]
        out = jax.vmap(
            lambda v: deskew_zyx_pallas(
                v, ls_angle_deg, px_to_scan_ratio, keep_overhang,
                average_window=average_window, skip_flip=skip_flip,
                pre_transposed_zyx_shape=pre_transposed_zyx_shape,
                out_layout=out_layout,
            )
        )(pre)
        if pad_groups8:
            g = out.shape[2]
            out = jnp.pad(
                out, ((0, 0), (0, 0), (0, -g % 8), (0, 0))
            )
        return out

    if out_layout == "xzy":
        assert skip_flip, "out_layout='xzy' requires skip_flip=True"
    else:
        assert not pad_groups8, "pad_groups8 is an xzy-only contract"
    Z_in, Y_in, X_in = zyx_shape
    output_shape, _ = get_deskewed_data_shape(
        (Z_in, Y_in, X_in), ls_angle_deg, px_to_scan_ratio, keep_overhang
    )
    Z_out, Y_out, X_out = Y_in, X_in, output_shape[2]

    ct = float(np.cos(ls_angle_deg * np.pi / 180))
    px = float(px_to_scan_ratio)
    offset = px * ct * (Z_out - 1) / 2 - px * (X_out - 1) / 2 + (Z_in - 1) / 2

    K = int(np.ceil(TILE_X * px)) + 2 + 8
    K = min(-(-K // 8) * 8, Z_in)
    n_tiles = -(-X_out // TILE_X)

    avg = int(average_window)
    groups = -(-Y_in // avg)
    groups8 = -(-groups // 8) * 8
    pad_front = groups8 * avg - Y_in
    yp = Y_in + pad_front
    n_g8 = groups8 // 8
    batch = int(raw_data.shape[0])

    if pre_transposed_zyx_shape is not None:
        assert raw_data.shape == (batch, yp, Z_in, X_in), (
            raw_data.shape, (batch, yp, Z_in, X_in)
        )
        data = raw_data.astype(jnp.float32)
    else:
        data = jnp.transpose(raw_data.astype(jnp.float32), (0, 2, 1, 3))
        if pad_front:
            data = jnp.pad(
                data, ((0, 0), (pad_front, 0), (0, 0), (0, 0)), mode="edge"
            )

    interpret = jax.default_backend() != "tpu"
    params = (Z_in, X_in, X_out, K, ct, px, offset, avg, yp, Z_out,
              groups8, n_g8, batch, n_tiles)
    vmem_params = (
        {}
        if interpret
        else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            )
        }
    )
    if out_layout == "zyx":
        out = pl.pallas_call(
            partial(_deskew_kernel_manual_zyx, params=params),
            interpret=interpret,
            grid=(batch, n_g8, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            # Batch squeezed out of the block (see the xzy spec note
            # below); the ragged groups block (major) and ragged X_out
            # lane tile are masked by the spec.
            out_specs=pl.BlockSpec(
                (None, 8, Y_out, TILE_X),
                lambda b, g, t: (b, g, 0, t),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (batch, groups, Y_out, X_out), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 8 * avg, Z_in, X_in), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            **vmem_params,
        )(data)
        # Mirrors the per-volume kernel's epilogue: the unflipped input
        # lanes leave Y_out reversed (a sublane-axis rev here).
        return out if skip_flip else jnp.flip(out, axis=2)
    return pl.pallas_call(
        partial(_deskew_kernel_manual, params=params),
        interpret=interpret,
        grid=(batch, n_g8, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        # Batch dim squeezed out of the block: the kernel sees a 3D out ref
        # (a leading-1 block + [0, ...] indexing lowers to a memref_slice
        # whose ragged lane extent Mosaic rejects on other geometries —
        # see pallas_resample.shear_resample2_pallas_t_batched).
        out_specs=pl.BlockSpec(
            (None, TILE_X, 8, Y_out),
            lambda b, g, t: (b, t, g, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, X_out, groups8 if pad_groups8 else groups, Y_out),
            jnp.float32,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8 * avg, Z_in, X_in), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        **vmem_params,
    )(data)


@partial(
    jax.jit,
    static_argnames=(
        "ls_angle_deg",
        "px_to_scan_ratio",
        "keep_overhang",
        "average_window",
        "skip_flip",
        "pre_transposed_zyx_shape",
        "out_layout",
    ),
)
def deskew_zyx_pallas(
    raw_data: jax.Array,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int = 1,
    skip_flip: bool = False,
    pre_transposed_zyx_shape: tuple[int, int, int] | None = None,
    out_layout: str = "zyx",
) -> jax.Array:
    """Deskew one ZYX volume with the fused MXU kernel.

    ``average_window > 1`` emits the z slice-averaged output directly
    (bit-matching ``average_n_slices`` applied to the unaveraged result,
    including its edge-padded tail group) without materializing the
    unaveraged volume in HBM.

    ``skip_flip`` returns the volume with the Y (coverslip) axis REVERSED —
    for fused chains that fold the flip into the next warp's affine
    (kernels/chain.py): the downstream warp transposes X to the major axis,
    which strands the flip on the lane axis where XLA's rev costs
    ~1.3 ms/volume instead of fusing.

    ``pre_transposed_zyx_shape``: chain mode — ``raw_data`` already arrives
    as the (Y + pad_front, Z, X) tilt-major, front-edge-padded layout this
    kernel's prep would otherwise build (emitted natively by deconvolve's
    pass C, pallas_fft.py ``yzx_pad``); the tuple carries the ORIGINAL
    (Z, Y, X) shape. The pad must equal :func:`deskew_pad_front`.

    ``out_layout="xzy"`` (requires ``skip_flip``) emits (X_out, Z_out,
    Y_out) — the fused in-plane warp's input layout — via the transposed
    kernel (:func:`_deskew_kernel_t`), killing the chain's warp-input
    transpose.
    """
    assert out_layout in ("zyx", "xzy"), out_layout
    if out_layout == "xzy":
        # A zyx-frame Y flip would land on the xzy lane axis — callers fold
        # it into the downstream warp instead.
        assert skip_flip, "out_layout='xzy' requires skip_flip=True"
    if pre_transposed_zyx_shape is not None:
        Z_in, Y_in, X_in = pre_transposed_zyx_shape
    else:
        Z_in, Y_in, X_in = raw_data.shape
    output_shape, _ = get_deskewed_data_shape(
        (Z_in, Y_in, X_in), ls_angle_deg, px_to_scan_ratio, keep_overhang
    )
    Z_out, Y_out, X_out = Y_in, X_in, output_shape[2]

    ct = float(np.cos(ls_angle_deg * np.pi / 180))
    px = float(px_to_scan_ratio)
    offset = px * ct * (Z_out - 1) / 2 - px * (X_out - 1) / 2 + (Z_in - 1) / 2

    # Slab rows one x-tile can touch, plus an 8-row margin for the 8-aligned
    # window start, rounded to sublanes; clamped to Z_in.
    K = int(np.ceil(TILE_X * px)) + 2 + 8
    K = min(-(-K // 8) * 8, Z_in)
    n_tiles = -(-X_out // TILE_X)

    avg = int(average_window)
    groups = -(-Y_in // avg)
    if out_layout == "xzy":
        # Extra front-pad groups align every reversed 8-group input block;
        # their output slots fall past the ragged last out block (masked).
        groups8 = -(-groups // 8) * 8
        pad_front = groups8 * avg - Y_in
    else:
        pad_front = groups * avg - Y_in
    yp = Y_in + pad_front

    kernel = partial(
        _deskew_kernel,
        params=(Z_in, X_in, X_out, K, n_tiles, ct, px, offset, avg, yp, Z_out),
    )
    # Tilt rows in natural order; front edge-pad makes the reversed z groups
    # block-aligned AND replicates the z = Z_out - 1 slice into the tail
    # group, exactly as average_n_slices edge-pads the unaveraged output.
    # The coverslip-axis flip moves to the OUTPUT's sublane axis below: a
    # lane-axis rev on the input costs ~1.65 ms/volume standalone (measured;
    # XLA lane reversals run far below copy speed), while the sublane-axis
    # rev on the averaged output is ~3x smaller and fuses into consumers.
    if pre_transposed_zyx_shape is not None:
        assert raw_data.shape == (yp, Z_in, X_in), (
            raw_data.shape, (yp, Z_in, X_in)
        )
        data = raw_data.astype(jnp.float32)
    else:
        data = jnp.transpose(raw_data.astype(jnp.float32), (1, 0, 2))
        if pad_front:
            data = jnp.pad(data, ((pad_front, 0), (0, 0), (0, 0)), mode="edge")

    # Mosaic compiles on TPU only; CPU (tests, debug mode) runs the interpreter.
    interpret = jax.default_backend() != "tpu"
    # The caller's fused-averaging gate admits double-buffered working sets up
    # to 64 MiB — past the ~16 MB default scoped-VMEM budget — so raise the
    # limit explicitly (mirrors kernels/pallas_fft.py; without this, large
    # average_window blocks would fail Mosaic compilation instead of running).
    vmem_params = (
        {}
        if interpret
        else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024
            )
        }
    )
    if out_layout == "xzy":
        groups8 = yp // avg  # multiple of 8 by construction
        n_g8 = groups8 // 8
        kernel_t = partial(
            _deskew_kernel_t,
            params=(Z_in, X_in, X_out, K, ct, px, offset, avg, yp, Z_out,
                    groups8),
        )
        return pl.pallas_call(
            kernel_t,
            interpret=interpret,
            grid=(n_g8, n_tiles),
            in_specs=[
                # 8 reversed z groups per program; x tiles revisit the block.
                pl.BlockSpec(
                    (8 * avg, Z_in, X_in),
                    lambda g, t: (n_g8 - 1 - g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (TILE_X, 8, Y_out),
                lambda g, t: (t, g, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((X_out, groups, Y_out), jnp.float32),
            **vmem_params,
        )(data)

    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(groups,),
        in_specs=[
            # One (avg, Z_in, X_in) block per program: tilt rows
            # [k*avg, (k+1)*avg) of the padded (Yp, Z_in, X_in) volume.
            pl.BlockSpec(
                (avg, Z_in, X_in),
                lambda k: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        # Natural tilt order means descending z, so block k owns averaged
        # group groups - 1 - k.
        out_specs=pl.BlockSpec(
            (1, Y_out, X_out),
            lambda k: (groups - 1 - k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((groups, Y_out, X_out), jnp.float32),
        **vmem_params,
    )(data)
    # Unflipped input lanes mean the kernel emitted Y_out (= the coverslip
    # axis) in reverse; flip it here on the sublane axis (see prep above),
    # unless the caller folds the flip into a downstream warp.
    return out if skip_flip else jnp.flip(out, axis=1)

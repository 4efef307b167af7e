"""Fused Pallas shear-resample: one elementary warp pass as banded MXU matmuls.

The shared engine beneath every resampler role the reference fills with
torch/ANTs/scipy native code (reference: biahub/deskew.py:430-544,
biahub/register.py:205-284, biahub/core/transform.py:374-396).

Generalizes the deskew kernel (kernels/pallas_deskew.py): an elementary
multipass-warp pass resamples axis ``r`` at coords = cr*i_r + co*i_o + tau —
the same "fractional coordinate affine in the output position" structure as
deskew's scan-axis lerp. For a 128-wide tile of output r positions the coords
span at most ceil(128*|cr|) + interp-support input rows, so the tile is one
(K, T) x (K, 128) contraction whose weight matrix holds the banded
interpolation weights (2 bands linear, 4 bands Catmull-Rom), built on the fly
from iota comparisons.

Layout: the caller provides data in (O, R_in, T) layout (o axis major, the
resampled axis in the middle, any third axis as lanes); the kernel emits
(O, T, R_out) — the resampled axis lands on lanes. XLA handles the
transposes between chained passes and fuses them with neighbors.

Used by kernels/multipass_warp.py for concrete-matrix warps on TPU; the XLA
take_along_axis formulation remains the fallback (CPU, traced coefficients).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "shear_resample_pallas",
    "shear_resample_pallas_dyn",
    "shear_resample_pallas_t",
    "shear_resample_pallas_t_dyn",
    "shear_resample2_pallas",
    "shear_resample2_pallas_dyn",
    "shear_resample2_pallas_t",
    "shear_resample2_pallas_t_dyn",
    "static_window_plan",
]

TILE_R = 128


def static_window_plan(
    coeff_sets,
    O: int,
    r_out: int,
    axis_in: int,
    order: int,
    k_dyn: int | None = None,
):
    """Per-tile STATIC slab-window starts covering every coefficient set.

    Dynamic (scalar-dependent) sublane slices of VMEM cost real time on TPU
    (measured ~0.7 ms/volume in the fused kernel's pass 2 — scripts/
    probe_fused_variants.py), while Python-int starts compile to plain
    offsets. Coords are affine in (r, o), so each 128-tile's coordinate range
    over all ``(cr, co, tau)`` sets and all o is attained at the corners;
    this returns ``(K, starts)`` — one window width and a per-tile start —
    or ``None`` when the widened window would cost more MXU than the
    dynamic-slice saving (K > 2x the dynamic window, and not full-size).
    Frame-edge band clamping matches the dynamic kernels: a window only
    abuts a frame edge when the coords leave the frame there.
    """
    support_lo = 0 if order == 1 else 1
    support_hi = 1 if order == 1 else 2
    n_tiles = -(-r_out // TILE_R)
    starts, need_hi = [], []
    for t in range(n_tiles):
        r0 = t * TILE_R
        r1 = min(r_out, r0 + TILE_R) - 1
        cs = [
            cr * r + co * o + tau
            for (cr, co, tau) in coeff_sets
            for r in (r0, r1)
            for o in (0, max(O - 1, 0))
        ]
        lo_row = int(np.floor(min(cs))) - support_lo
        hi_row = int(np.floor(max(cs))) + support_hi
        starts.append(max(0, (lo_row // 8) * 8))
        need_hi.append(hi_row)
    K = max(hi - s + 1 for hi, s in zip(need_hi, starts))
    K = min(-(-K // 8) * 8, axis_in)
    if k_dyn is not None and K > min(axis_in, 2 * k_dyn):
        return None
    starts = tuple(int(np.clip(s, 0, max(axis_in - K, 0))) for s in starts)
    return K, starts


def _warp_precision() -> str:
    """``BIAHUB_TPU_WARP_PRECISION``: ``high`` (default; 3-term bf16-split
    dots, ~1e-5 rel — far below the multipass chain's own interpolation
    tolerance, and ~2x the MXU throughput of HIGHEST's 6 passes) or
    ``highest`` (full f32 mantissa, scipy bit-parity). Read at trace time."""
    name = os.environ.get("BIAHUB_TPU_WARP_PRECISION", "high").lower()
    assert name in ("high", "highest"), name
    return name


def _banded_dot(slab, w):
    """(K, T) x (tile_w, K) -> (T, tile_w) contraction at the configured
    warp precision (see :func:`_warp_precision`)."""
    w = w.astype(jnp.float32)
    dn = (((0,), (1,)), ((), ()))
    if _warp_precision() == "high":
        ah = slab.astype(jnp.bfloat16)
        al = (slab - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = w.astype(jnp.bfloat16)
        bl = (w - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(x, y, dn, preferred_element_type=jnp.float32)

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return jax.lax.dot_general(
        slab, w, dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _resample_kernel(data_ref, out_ref, *, params, mask=None, starts=None):
    R_in, T, R_out, K, n_tiles, cr, co, tau, order = params
    o_idx = pl.program_id(0).astype(jnp.float32)

    for tile in range(n_tiles):
        tile_w = min(TILE_R, R_out - tile * TILE_R)
        ro = (
            tile * TILE_R
            + jax.lax.broadcasted_iota(jnp.int32, (tile_w, 1), 0)
        ).astype(jnp.float32)
        coords = cr * ro + co * o_idx + tau  # (tile_w, 1)
        i0 = jnp.floor(coords)
        frac = coords - i0
        i0 = i0.astype(jnp.int32)

        if starts is not None:
            start = starts[tile]  # static Python int (static_window_plan)
        else:
            # Slab window covering every band the tile touches. coords is
            # monotonic in ro (sign of cr): extremes sit at the tile ends.
            lo = jnp.minimum(i0[0, 0], i0[tile_w - 1, 0]) - 1
            start = jnp.clip(lo, 0, max(R_in - K, 0))
            start = pl.multiple_of((start // 8) * 8, 8)
        offs = i0 - start  # (tile_w, 1)

        # Bands clamp to the window edge (edge-value extension, matching the
        # XLA formulation's index clip); the window only abuts the frame edge
        # when the coords do, so this equals clamping at the frame bounds.
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_w, K), 1)

        def band(k, wk):
            return wk * (cols == jnp.clip(offs + k, 0, K - 1))

        if order == 1:
            w = band(0, 1.0 - frac) + band(1, frac)
        else:  # Catmull-Rom
            t2 = frac * frac
            t3 = t2 * frac
            w = (
                band(-1, -0.5 * t3 + t2 - 0.5 * frac)
                + band(0, 1.5 * t3 - 2.5 * t2 + 1.0)
                + band(1, -1.5 * t3 + 2.0 * t2 + 0.5 * frac)
                + band(2, 0.5 * t3 - 0.5 * t2)
            )

        slab = data_ref[0, pl.ds(start, K), :]  # (K, T)
        res = _banded_dot(slab, w)
        if mask is not None:
            # Fold the exact whole-sample domain mask of the ORIGINAL affine
            # into the chain's final pass: per output voxel at (o=program,
            # t=sublane, r=lane), input coord i is A[i] . (o, t, r, 1); out
            # of [0, in_shape[i]-1] on any axis means constant fill — the
            # _exact_domain_mask semantics without its own 2x-volume pass.
            a_flat, in_shape, fill = mask
            t_io = jax.lax.broadcasted_iota(
                jnp.int32, (T, tile_w), 0
            ).astype(jnp.float32)
            r_io = (
                tile * TILE_R
                + jax.lax.broadcasted_iota(jnp.int32, (T, tile_w), 1)
            ).astype(jnp.float32)
            inside = None
            for i in range(3):
                ao, at, ar, ac = a_flat[4 * i : 4 * i + 4]
                c = ao * o_idx + at * t_io + ar * r_io + ac
                ok = (c >= 0.0) & (c <= in_shape[i] - 1.0)
                inside = ok if inside is None else inside & ok
            res = jnp.where(inside, res, fill)
        out_ref[0, :, pl.ds(tile * TILE_R, tile_w)] = res


@partial(jax.jit, static_argnames=("r_out", "cr", "co", "tau", "order", "mask"))
def shear_resample_pallas(
    data_ort: jax.Array,
    r_out: int,
    cr: float,
    co: float,
    tau: float,
    order: int = 3,
    mask=None,
) -> jax.Array:
    """Resample axis 1 of (O, R_in, T) data at coords cr*r + co*o + tau.

    Returns (O, T, r_out) — the resampled axis moves to lanes. Out-of-window
    samples contribute zero weight (the caller's frame padding guarantees
    interior coords never reach the frame edge).

    ``mask`` (static): ``(a_flat, in_shape, fill)`` folds the original
    affine's whole-sample domain mask into this pass (see _resample_kernel)
    — chains pass it on their FINAL pass to skip the separate
    _exact_domain_mask volume pass.
    """
    O, R_in, T = data_ort.shape
    support = 2 if order == 1 else 4
    K = int(np.ceil(TILE_R * abs(cr))) + support + 8
    K = min(-(-K // 8) * 8, R_in)
    n_tiles = -(-r_out // TILE_R)

    plan = static_window_plan(
        [(float(cr), float(co), float(tau))], O, r_out, R_in, order, k_dyn=K
    )
    starts = None
    if plan is not None:
        K, starts = plan

    kernel = partial(
        _resample_kernel,
        params=(R_in, T, r_out, K, n_tiles, float(cr), float(co), float(tau),
                int(order)),
        mask=mask,
        starts=starts,
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(O,),
        in_specs=[
            pl.BlockSpec((1, R_in, T), lambda o: (o, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, r_out), lambda o: (o, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((O, T, r_out), jnp.float32),
    )(data_ort.astype(jnp.float32))


def _resample_kernel_dyn(coeffs_ref, data_ref, out_ref, *, params, starts=None):
    """Like :func:`_resample_kernel`, with (cr, co, tau) read from SMEM so the
    coefficients can be traced (per-matrix parameters in batched kernels)."""
    R_in, T, R_out, K, n_tiles, order, mask_oob = params
    cr = coeffs_ref[0, 0]
    co = coeffs_ref[0, 1]
    tau = coeffs_ref[0, 2]
    o_idx = pl.program_id(0).astype(jnp.float32)

    for tile in range(n_tiles):
        tile_w = min(TILE_R, R_out - tile * TILE_R)
        ro = (
            tile * TILE_R
            + jax.lax.broadcasted_iota(jnp.int32, (tile_w, 1), 0)
        ).astype(jnp.float32)
        coords = cr * ro + co * o_idx + tau
        i0 = jnp.floor(coords)
        frac = coords - i0
        i0 = i0.astype(jnp.int32)

        if starts is not None:
            start = starts[tile]  # static int; window covers every coeff set
        else:
            lo = jnp.minimum(i0[0, 0], i0[tile_w - 1, 0]) - 1
            start = jnp.clip(lo, 0, max(R_in - K, 0))
            start = pl.multiple_of((start // 8) * 8, 8)
        offs = i0 - start

        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_w, K), 1)

        def band(k, wk):
            return wk * (cols == jnp.clip(offs + k, 0, K - 1))

        if order == 1:
            w = band(0, 1.0 - frac) + band(1, frac)
        else:
            t2 = frac * frac
            t3 = t2 * frac
            w = (
                band(-1, -0.5 * t3 + t2 - 0.5 * frac)
                + band(0, 1.5 * t3 - 2.5 * t2 + 1.0)
                + band(1, -1.5 * t3 + 2.0 * t2 + 0.5 * frac)
                + band(2, 0.5 * t3 - 0.5 * t2)
            )

        if mask_oob:
            # scipy-style whole-sample constant fill (fill = 0): zero every
            # band of samples whose coordinate leaves the input domain.
            w = w * ((coords >= 0) & (coords <= R_in - 1)).astype(w.dtype)

        slab = data_ref[0, pl.ds(start, K), :]
        out_ref[0, :, pl.ds(tile * TILE_R, tile_w)] = _banded_dot(slab, w)


@partial(jax.jit, static_argnames=("r_out", "k_bound", "order", "mask_oob",
                                   "window"))
def shear_resample_pallas_dyn(
    data_ort: jax.Array,
    r_out: int,
    coeffs: jax.Array,
    k_bound: int,
    order: int = 3,
    mask_oob: bool = False,
    window=None,
) -> jax.Array:
    """Resample axis 1 of (O, R_in, T) data at traced (cr, co, tau) coeffs.

    ``k_bound`` must statically bound ceil(TILE_R*|cr|) + support over every
    coefficient set this kernel will see (the batched multipass factory
    computes it from the concrete matrix batch). ``window`` (static) is an
    optional ``(K, starts)`` from :func:`static_window_plan` over those same
    coefficient sets — static slab windows skip the dynamic-slice cost.
    """
    O, R_in, T = data_ort.shape
    starts = None
    if window is not None:
        K, starts = window
        K = min(K, R_in)
    else:
        K = min(-(-(k_bound + 8) // 8) * 8, R_in)
    n_tiles = -(-r_out // TILE_R)

    kernel = partial(
        _resample_kernel_dyn,
        params=(R_in, T, r_out, K, n_tiles, int(order), bool(mask_oob)),
        starts=starts,
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(O,),
        in_specs=[
            # Rank-2 (1, 3) so a vmap batch dim lands beyond the last-two-dims
            # tiling rule (it gets squeezed) — rank-1 SMEM operands fail
            # Mosaic's block check once batched.
            pl.BlockSpec((1, 3), lambda o: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R_in, T), lambda o: (o, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, r_out), lambda o: (o, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((O, T, r_out), jnp.float32),
    )(coeffs.astype(jnp.float32).reshape(1, 3), data_ort.astype(jnp.float32))


O8 = 8


def _resample_t_body(data_ref, out_ref, coeffs, params, starts, mask,
                     o8=None, read_row=None):
    """Transposed-output resample: 8 o-rows per program, blocks written
    directly in (T, O, R_out) order.

    The warp chains otherwise pay a full-volume XLA transpose to move the
    final pass's (O, T, R) output into (T, O, R) = (Zo, Yo, Xo) order
    (~1.5 ms/volume — scripts/probe_xpass8.py); emitting (T, 8, R_out)
    blocks at 8-Yo granularity makes that layout native. Requires STATIC
    window starts (a dynamic slab slice per (o-row, tile) would cost 8x the
    already-measured dynamic-slice penalty).

    ``o8``/``read_row`` override the o8-block program id and the slab read
    (``(oo, row_slice) -> (K, T) array``) for the manually double-buffered
    batched kernel, whose slab lives in scratch VMEM. Reads must stay a
    SINGLE indexer expression: a chained ``.at[oo][slice]`` lowers through
    an intermediate memref_slice whose ragged lane extent Mosaic rejects
    (needs 128-aligned; measured, real chip).
    """
    R_in, T, R_out, K, n_tiles, order, mask_oob = params
    cr, co, tau = coeffs
    if o8 is None:
        o8 = pl.program_id(0)
    if read_row is None:
        read_row = lambda oo, sl: data_ref[oo, sl, :]  # noqa: E731
    for oo in range(O8):
        o_val = (o8 * O8 + oo).astype(jnp.float32)
        for tile in range(n_tiles):
            tile_w = min(TILE_R, R_out - tile * TILE_R)
            ro = (
                tile * TILE_R
                + jax.lax.broadcasted_iota(jnp.int32, (tile_w, 1), 0)
            ).astype(jnp.float32)
            coords = cr * ro + co * o_val + tau
            i0 = jnp.floor(coords).astype(jnp.int32)
            start = starts[tile]
            cols = jax.lax.broadcasted_iota(jnp.int32, (tile_w, K), 1)
            w = _band_weights(coords, i0 - start, cols, order, K)
            if mask_oob:
                w = w * ((coords >= 0) & (coords <= R_in - 1)).astype(w.dtype)
            slab = read_row(oo, slice(start, start + K))  # (K, T)
            res = _banded_dot(slab, w)  # (T, tile_w)
            if mask is not None:
                a_flat, in_shape, fill = mask
                t_io = jax.lax.broadcasted_iota(
                    jnp.int32, (T, tile_w), 0
                ).astype(jnp.float32)
                r_io = (
                    tile * TILE_R
                    + jax.lax.broadcasted_iota(jnp.int32, (T, tile_w), 1)
                ).astype(jnp.float32)
                inside = None
                for i in range(3):
                    ao, at, ar, ac = a_flat[4 * i : 4 * i + 4]
                    c = ao * o_val + at * t_io + ar * r_io + ac
                    ok = (c >= 0.0) & (c <= in_shape[i] - 1.0)
                    inside = ok if inside is None else inside & ok
                res = jnp.where(inside, res, fill)
            out_ref[:, oo, tile * TILE_R : tile * TILE_R + tile_w] = res


def _resample_kernel_t(data_ref, out_ref, *, params, coeffs, starts, mask=None):
    _resample_t_body(data_ref, out_ref, coeffs, params, starts, mask)


def _resample_kernel_t_dyn(coeffs_ref, data_ref, out_ref, *, params, starts):
    coeffs = tuple(coeffs_ref[0, i] for i in range(3))
    _resample_t_body(data_ref, out_ref, coeffs, params, starts, None)


def _resample_t_specs(O, R_in, T, r_out):
    n_o8 = -(-O // O8)
    return (
        (n_o8,),
        pl.BlockSpec((O8, R_in, T), lambda o: (o, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, O8, r_out), lambda o: (0, o, 0),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((T, O, r_out), jnp.float32),
    )


@partial(jax.jit, static_argnames=("r_out", "cr", "co", "tau", "order", "mask"))
def shear_resample_pallas_t(
    data_ort: jax.Array,
    r_out: int,
    cr: float,
    co: float,
    tau: float,
    order: int = 3,
    mask=None,
) -> jax.Array:
    """:func:`shear_resample_pallas` emitting (T, O, r_out) natively.

    The layout the warp chains' FINAL pass needs — (Zo, Yo, Xo) — without
    the separate full-volume transpose. Falls back to the regular kernel +
    XLA transpose when no static window plan fits (extreme slopes/shears).
    """
    O, R_in, T = data_ort.shape
    support = 2 if order == 1 else 4
    K_dyn = min(
        -(-(int(np.ceil(TILE_R * abs(cr))) + support + 8) // 8) * 8, R_in
    )
    plan = static_window_plan(
        [(float(cr), float(co), float(tau))], O, r_out, R_in, order,
        k_dyn=K_dyn,
    )
    if plan is None:
        out = shear_resample_pallas(data_ort, r_out, cr, co, tau, order=order,
                                    mask=mask)
        return jnp.transpose(out, (1, 0, 2))
    K, starts = plan
    n_tiles = -(-r_out // TILE_R)
    grid, data_spec, out_spec, out_shape = _resample_t_specs(O, R_in, T, r_out)
    kernel = partial(
        _resample_kernel_t,
        params=(R_in, T, r_out, K, n_tiles, int(order), False),
        coeffs=(float(cr), float(co), float(tau)),
        starts=starts,
        mask=mask,
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=[data_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(data_ort.astype(jnp.float32))


@partial(jax.jit, static_argnames=("r_out", "order", "mask_oob", "window"))
def shear_resample_pallas_t_dyn(
    data_ort: jax.Array,
    r_out: int,
    coeffs: jax.Array,
    window,
    order: int = 3,
    mask_oob: bool = False,
) -> jax.Array:
    """:func:`shear_resample_pallas_dyn` emitting (T, O, r_out) natively.

    ``window`` is a REQUIRED static ``(K, starts)`` plan covering every
    coefficient set (callers without one use the regular kernel + an XLA
    transpose instead).
    """
    O, R_in, T = data_ort.shape
    K, starts = window
    K = min(K, R_in)
    n_tiles = -(-r_out // TILE_R)
    grid, data_spec, out_spec, out_shape = _resample_t_specs(O, R_in, T, r_out)
    kernel = partial(
        _resample_kernel_t_dyn,
        params=(R_in, T, r_out, K, n_tiles, int(order), bool(mask_oob)),
        starts=starts,
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda o: (0, 0), memory_space=pltpu.SMEM),
            data_spec,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(coeffs.astype(jnp.float32).reshape(1, 3), data_ort.astype(jnp.float32))


def _banded_dot_left(w, slab):
    """(tile_w, K) x (K, T) -> (tile_w, T) contraction at the configured
    warp precision — the mirrored orientation of :func:`_banded_dot`, used
    for the lane-axis resample of the fused two-axis kernel."""
    w = w.astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    if _warp_precision() == "high":
        ah = w.astype(jnp.bfloat16)
        al = (w - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = slab.astype(jnp.bfloat16)
        bl = (slab - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(x, y, dn, preferred_element_type=jnp.float32)

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return jax.lax.dot_general(
        w, slab, dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _band_weights(coords, offs, cols, order, K):
    """Banded interpolation weight matrix shared by both fused-pass matmuls."""
    i0 = jnp.floor(coords)
    frac = coords - i0

    def band(k, wk):
        return wk * (cols == jnp.clip(offs + k, 0, K - 1))

    if order == 1:
        return band(0, 1.0 - frac) + band(1, frac)
    t2 = frac * frac
    t3 = t2 * frac
    return (
        band(-1, -0.5 * t3 + t2 - 0.5 * frac)
        + band(0, 1.5 * t3 - 2.5 * t2 + 1.0)
        + band(1, -1.5 * t3 + 2.0 * t2 + 0.5 * frac)
        + band(2, 0.5 * t3 - 0.5 * t2)
    )


def _resample2_body(data_ref, out_ref, res_ref, coeffs, params, t_starts=None):
    """Shared body of the fused two-axis resample (static and SMEM coeffs).

    Pass 1 resamples the sublane axis R of the (1, R_in, T_in) data block
    into a (T_in, TILE_R) VMEM scratch (one banded MXU dot, exactly
    :func:`_resample_kernel`'s tile). Pass 2 resamples the scratch's sublane
    axis — the original LANE axis T — with a second banded dot per 128-row
    output stripe: windows slice the scratch at 8-aligned sublane starts, the
    fast pattern (no lane-axis gathers anywhere). One kernel thus applies two
    elementary warp passes for a single HBM round trip. ``t_starts`` (static
    per-tile ints from :func:`static_window_plan`) replaces pass 2's dynamic
    window starts — the dynamic scalar-dependent VMEM slices cost ~0.7 ms/
    volume on TPU (scripts/probe_fused_variants.py).
    """
    (R_in, T_in, R_out, T_out, K_r, K_t, n_t_tiles, order, mask_oob) = params
    cr, co, tau, dr, do_, dtau = coeffs
    o_idx = pl.program_id(0).astype(jnp.float32)
    rt = pl.program_id(1)

    # ---- pass 1: resample R (data sublanes) -> res (T_in, TILE_R)
    ro = (
        rt * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, 1), 0)
    ).astype(jnp.float32)
    coords = cr * ro + co * o_idx + tau  # (TILE_R, 1)
    i0 = jnp.floor(coords).astype(jnp.int32)
    lo = jnp.minimum(i0[0, 0], i0[TILE_R - 1, 0]) - 1
    start = jnp.clip(lo, 0, max(R_in - K_r, 0))
    start = pl.multiple_of((start // 8) * 8, 8)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, K_r), 1)
    w = _band_weights(coords, i0 - start, cols, order, K_r)
    if mask_oob:
        w = w * ((coords >= 0) & (coords <= R_in - 1)).astype(w.dtype)
    slab = data_ref[0, pl.ds(start, K_r), :]  # (K_r, T_in)
    res_ref[:, :] = _banded_dot(slab, w)  # (T_in, TILE_R)

    # ---- pass 2: resample T (scratch sublanes) per 128-row output stripe
    for t_i in range(n_t_tiles):
        tw = min(TILE_R, T_out - t_i * TILE_R)
        to = (
            t_i * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0)
        ).astype(jnp.float32)
        c2 = dr * to + do_ * o_idx + dtau
        j0 = jnp.floor(c2).astype(jnp.int32)
        if t_starts is not None:
            start2 = t_starts[t_i]  # static Python int
            win = res_ref[start2 : start2 + K_t, :]  # (K_t, TILE_R)
        else:
            lo2 = jnp.minimum(j0[0, 0], j0[tw - 1, 0]) - 1
            start2 = jnp.clip(lo2, 0, max(T_in - K_t, 0))
            start2 = pl.multiple_of((start2 // 8) * 8, 8)
            win = res_ref[pl.ds(start2, K_t), :]  # (K_t, TILE_R)
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (tw, K_t), 1)
        w2 = _band_weights(c2, j0 - start2, cols2, order, K_t)
        if mask_oob:
            w2 = w2 * ((c2 >= 0) & (c2 <= T_in - 1)).astype(w2.dtype)
        out_ref[0, t_i * TILE_R : t_i * TILE_R + tw, :] = _banded_dot_left(w2, win)


def _resample2_kernel(data_ref, out_ref, res_ref, *, params, coeffs,
                      t_starts=None):
    _resample2_body(data_ref, out_ref, res_ref, coeffs, params, t_starts)


def _resample2_kernel_dyn(coeffs_ref, data_ref, out_ref, res_ref, *, params,
                          t_starts=None):
    coeffs = tuple(coeffs_ref[0, i] for i in range(6))
    _resample2_body(data_ref, out_ref, res_ref, coeffs, params, t_starts)


def _resample2_specs(O, R_in, T_in, R_out, T_out):
    n_r_tiles = -(-R_out // TILE_R)
    data_spec = pl.BlockSpec(
        (1, R_in, T_in), lambda o, r: (o, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, T_out, TILE_R), lambda o, r: (o, 0, r), memory_space=pltpu.VMEM
    )
    return (
        (O, n_r_tiles),
        data_spec,
        out_spec,
        [pltpu.VMEM((T_in, TILE_R), jnp.float32)],
        jax.ShapeDtypeStruct((O, T_out, R_out), jnp.float32),
    )


def _k_window(k_bound: int, axis_size: int) -> int:
    return min(-(-(k_bound + 8) // 8) * 8, axis_size)


@partial(jax.jit, static_argnames=("r_out", "t_out", "rc", "tc", "order",
                                   "mask_oob"))
def shear_resample2_pallas(
    data_ort: jax.Array,
    r_out: int,
    t_out: int,
    rc: tuple[float, float, float],
    tc: tuple[float, float, float],
    order: int = 3,
    mask_oob: bool = False,
) -> jax.Array:
    """Fused two-axis resample of (O, R_in, T_in) data -> (O, t_out, r_out).

    Applies TWO elementary warp passes in one kernel (one HBM round trip):
    the sublane axis R at coords ``rc[0]*r + rc[1]*o + rc[2]``, then the lane
    axis T at coords ``tc[0]*t + tc[1]*o + tc[2]``. Both passes' coordinates
    may depend on the grid axis ``o`` but not on each other — exactly the
    structure of a z-decoupled (in-plane) affine's z+y passes, which is the
    caller this serves (kernels/affine.py). ``mask_oob`` zeroes out-of-domain
    samples per axis (scipy whole-sample constant fill with fill = 0).
    """
    O, R_in, T_in = data_ort.shape
    support = 2 if order == 1 else 4
    K_r = _k_window(int(np.ceil(TILE_R * abs(rc[0]))) + support, R_in)
    K_t = _k_window(int(np.ceil(TILE_R * abs(tc[0]))) + support, T_in)
    n_t_tiles = -(-t_out // TILE_R)

    t_plan = static_window_plan(
        [tuple(float(c) for c in tc)], O, t_out, T_in, order, k_dyn=K_t
    )
    t_starts = None
    if t_plan is not None:
        K_t, t_starts = t_plan

    grid, data_spec, out_spec, scratch, out_shape = _resample2_specs(
        O, R_in, T_in, r_out, t_out
    )
    kernel = partial(
        _resample2_kernel,
        params=(R_in, T_in, r_out, t_out, K_r, K_t, n_t_tiles, int(order),
                bool(mask_oob)),
        coeffs=tuple(float(c) for c in rc) + tuple(float(c) for c in tc),
        t_starts=t_starts,
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=[data_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(data_ort.astype(jnp.float32))


@partial(jax.jit, static_argnames=("r_out", "t_out", "k_bound_r", "k_bound_t",
                                   "order", "mask_oob", "t_window"))
def shear_resample2_pallas_dyn(
    data_ort: jax.Array,
    r_out: int,
    t_out: int,
    coeffs: jax.Array,
    k_bound_r: int,
    k_bound_t: int,
    order: int = 3,
    mask_oob: bool = False,
    t_window=None,
) -> jax.Array:
    """Fused two-axis resample with TRACED coefficients.

    ``coeffs`` is a length-6 array (cr, co, tau, dr, do, dtau) read from
    SMEM; ``k_bound_r``/``k_bound_t`` statically bound
    ceil(TILE_R*|slope|) + support over every coefficient set (per-matrix
    parameters in batched stabilize/register kernels). ``t_window`` (static)
    is an optional ``(K_t, starts)`` from :func:`static_window_plan` over
    those same coefficient sets — static pass-2 windows skip the dynamic
    VMEM-slice cost.
    """
    O, R_in, T_in = data_ort.shape
    K_r = _k_window(k_bound_r, R_in)
    t_starts = None
    if t_window is not None:
        K_t, t_starts = t_window
        K_t = min(K_t, T_in)
    else:
        K_t = _k_window(k_bound_t, T_in)
    n_t_tiles = -(-t_out // TILE_R)

    grid, data_spec, out_spec, scratch, out_shape = _resample2_specs(
        O, R_in, T_in, r_out, t_out
    )
    kernel = partial(
        _resample2_kernel_dyn,
        params=(R_in, T_in, r_out, t_out, K_r, K_t, n_t_tiles, int(order),
                bool(mask_oob)),
        t_starts=t_starts,
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 6), lambda o, r: (0, 0), memory_space=pltpu.SMEM),
            data_spec,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(coeffs.astype(jnp.float32).reshape(1, 6), data_ort.astype(jnp.float32))


def _resample2_t_body(data_ref, out_ref, res_ref, coeffs, params, t_starts,
                      o8=None, rt=None, read_row=None):
    """Transposed-output fused two-axis resample: 8 o-rows per program,
    blocks written directly in (T_out, O, R_out) order.

    Pass 1 fills an (T_in, 8*TILE_R) scratch with one o-strip of lanes per
    o-row; pass 2's banded dots then write (T_out, 8, TILE_R) output blocks
    — the layout the warp chain's NEXT pass consumes, killing the mid-chain
    full-volume transpose (~1.5 ms/volume; scripts/probe_fused8.py measures
    the 8-o body FASTER than the regular fused kernel, 2.51 vs 2.88 ms,
    bit-exact). Pass 2 requires STATIC window starts.

    ``o8``/``rt``/``read_row`` override the program ids and the slab read
    (``(oo, row_slice) -> (K_r, T_in) array``) for the manually
    double-buffered batched kernel, whose slab lives in scratch VMEM (the
    read must stay a single indexer — see :func:`_resample_t_body`).
    """
    (R_in, T_in, R_out, T_out, K_r, K_t, n_t_tiles, order, mask_oob) = params
    cr, co, tau, dr, do_, dtau = coeffs
    if o8 is None:
        o8 = pl.program_id(0)
    if rt is None:
        rt = pl.program_id(1)
    if read_row is None:
        read_row = lambda oo, sl: data_ref[oo, sl, :]  # noqa: E731

    ro = (
        rt * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, 1), 0)
    ).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, K_r), 1)
    for oo in range(O8):
        o_val = (o8 * O8 + oo).astype(jnp.float32)
        coords = cr * ro + co * o_val + tau
        i0 = jnp.floor(coords).astype(jnp.int32)
        lo = jnp.minimum(i0[0, 0], i0[TILE_R - 1, 0]) - 1
        start = jnp.clip(lo, 0, max(R_in - K_r, 0))
        start = pl.multiple_of((start // 8) * 8, 8)
        w = _band_weights(coords, i0 - start, cols, order, K_r)
        if mask_oob:
            w = w * ((coords >= 0) & (coords <= R_in - 1)).astype(w.dtype)
        slab = read_row(oo, pl.ds(start, K_r))
        res_ref[:, oo * TILE_R : (oo + 1) * TILE_R] = _banded_dot(slab, w)

    for t_i in range(n_t_tiles):
        tw = min(TILE_R, T_out - t_i * TILE_R)
        s2 = t_starts[t_i]
        to = (
            t_i * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0)
        ).astype(jnp.float32)
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (tw, K_t), 1)
        for oo in range(O8):
            o_val = (o8 * O8 + oo).astype(jnp.float32)
            c2 = dr * to + do_ * o_val + dtau
            j0 = jnp.floor(c2).astype(jnp.int32)
            w2 = _band_weights(c2, j0 - s2, cols2, order, K_t)
            if mask_oob:
                w2 = w2 * ((c2 >= 0) & (c2 <= T_in - 1)).astype(w2.dtype)
            win = res_ref[s2 : s2 + K_t, oo * TILE_R : (oo + 1) * TILE_R]
            out_ref[t_i * TILE_R : t_i * TILE_R + tw, oo, :] = _banded_dot_left(
                w2, win
            )


def _resample2_kernel_t(data_ref, out_ref, res_ref, *, params, coeffs,
                        t_starts):
    _resample2_t_body(data_ref, out_ref, res_ref, coeffs, params, t_starts)


def _resample2_kernel_t_dyn(coeffs_ref, data_ref, out_ref, res_ref, *,
                            params, t_starts):
    coeffs = tuple(coeffs_ref[0, i] for i in range(6))
    _resample2_t_body(data_ref, out_ref, res_ref, coeffs, params, t_starts)


def _resample2_t_specs(O, R_in, T_in, R_out, T_out):
    n_o8 = -(-O // O8)
    n_r_tiles = -(-R_out // TILE_R)
    return (
        (n_o8, n_r_tiles),
        pl.BlockSpec((O8, R_in, T_in), lambda o, r: (o, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T_out, O8, TILE_R), lambda o, r: (0, o, r),
                     memory_space=pltpu.VMEM),
        [pltpu.VMEM((T_in, O8 * TILE_R), jnp.float32)],
        jax.ShapeDtypeStruct((T_out, O, R_out), jnp.float32),
    )


@partial(jax.jit, static_argnames=("r_out", "t_out", "rc", "tc", "order",
                                   "mask_oob"))
def shear_resample2_pallas_t(
    data_ort: jax.Array,
    r_out: int,
    t_out: int,
    rc: tuple[float, float, float],
    tc: tuple[float, float, float],
    order: int = 3,
    mask_oob: bool = False,
) -> jax.Array:
    """:func:`shear_resample2_pallas` emitting (t_out, O, r_out) natively.

    Falls back to the regular fused kernel + XLA transpose when no static
    pass-2 window plan fits.
    """
    O, R_in, T_in = data_ort.shape
    support = 2 if order == 1 else 4
    K_r = _k_window(int(np.ceil(TILE_R * abs(rc[0]))) + support, R_in)
    K_t_dyn = _k_window(int(np.ceil(TILE_R * abs(tc[0]))) + support, T_in)
    t_plan = static_window_plan(
        [tuple(float(c) for c in tc)], O, t_out, T_in, order, k_dyn=K_t_dyn
    )
    if t_plan is None:
        out = shear_resample2_pallas(data_ort, r_out, t_out, rc, tc,
                                     order=order, mask_oob=mask_oob)
        return jnp.transpose(out, (1, 0, 2))
    K_t, t_starts = t_plan
    n_t_tiles = -(-t_out // TILE_R)
    grid, data_spec, out_spec, scratch, out_shape = _resample2_t_specs(
        O, R_in, T_in, r_out, t_out
    )
    kernel = partial(
        _resample2_kernel_t,
        params=(R_in, T_in, r_out, t_out, K_r, K_t, n_t_tiles, int(order),
                bool(mask_oob)),
        coeffs=tuple(float(c) for c in rc) + tuple(float(c) for c in tc),
        t_starts=t_starts,
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=[data_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(data_ort.astype(jnp.float32))


@partial(jax.jit, static_argnames=("r_out", "t_out", "k_bound_r", "order",
                                   "mask_oob", "t_window"))
def shear_resample2_pallas_t_dyn(
    data_ort: jax.Array,
    r_out: int,
    t_out: int,
    coeffs: jax.Array,
    k_bound_r: int,
    t_window,
    order: int = 3,
    mask_oob: bool = False,
) -> jax.Array:
    """:func:`shear_resample2_pallas_dyn` emitting (t_out, O, r_out) natively.

    ``t_window`` is a REQUIRED static ``(K_t, starts)`` plan covering every
    coefficient set (callers without one use the regular fused kernel + an
    XLA transpose instead).
    """
    O, R_in, T_in = data_ort.shape
    K_r = _k_window(k_bound_r, R_in)
    K_t, t_starts = t_window
    K_t = min(K_t, T_in)
    n_t_tiles = -(-t_out // TILE_R)
    grid, data_spec, out_spec, scratch, out_shape = _resample2_t_specs(
        O, R_in, T_in, r_out, t_out
    )
    kernel = partial(
        _resample2_kernel_t_dyn,
        params=(R_in, T_in, r_out, t_out, K_r, K_t, n_t_tiles, int(order),
                bool(mask_oob)),
        t_starts=t_starts,
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 6), lambda o, r: (0, 0), memory_space=pltpu.SMEM),
            data_spec,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(coeffs.astype(jnp.float32).reshape(1, 6), data_ort.astype(jnp.float32))


# Double-buffered manual slab scratch budget (2 x O8 x R_in x T_in f32).
_MANUAL_SLAB_BYTES = 56 * 1024 * 1024


def _manual_dma_chain(hbm_ref, slab_ref, sem_ref, i, n_blocks, n_o8, O):
    """Double-buffered o8-block DMA chain over the (batch x o8) linear
    index ``i``.

    Mosaic's automatic pipeline prefetches changed input blocks one program
    ahead, which cannot hide a multi-MB o8-block fetch behind one short
    tile program — the banded kernels measured AT their no-overlap bound
    (traffic + compute) while a DMA-only body hit the traffic floor
    (scripts/probe_deskew_overlap.py). Starting block i+1's copy before
    block i's compute hides the fetch behind the whole block's MXU work.
    Ragged last block: the slice start clamps to O - O8 (rows re-read; the
    duplicate rows are masked by the out spec's ragged store).
    """

    def dma(slot, idx):
        bb = idx // n_o8
        blk = idx % n_o8
        row0 = jnp.minimum(blk * O8, O - O8)
        return pltpu.make_async_copy(
            hbm_ref.at[bb, pl.ds(row0, O8)],
            slab_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_blocks)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()


def _slab_read_of(slab_ref, slot, o8, O):
    """Slab read mapping logical o-row ``o8*8 + oo`` into the clamped
    slab block (see :func:`_manual_dma_chain`); rows past the ragged end
    clamp to the last slab row (their stores are masked). Single-indexer
    expression by construction (see :func:`_resample_t_body`)."""
    off = o8 * O8 - jnp.minimum(o8 * O8, O - O8)
    return lambda oo, sl: slab_ref[slot, jnp.minimum(oo + off, O8 - 1), sl, :]


def _resample2_kernel_t_manual(hbm_ref, out_ref, res_ref, slab_ref, sem_ref,
                               *, params, coeffs, t_starts, n_o8, n_blocks,
                               O):
    b = pl.program_id(0)
    o8 = pl.program_id(1)
    rt = pl.program_id(2)
    i = b * n_o8 + o8

    @pl.when(rt == 0)
    def _():
        # The DMA chain advances once per o8 block; the grid is sequential,
        # so later r-tile programs of the same block read the settled slab.
        _manual_dma_chain(hbm_ref, slab_ref, sem_ref, i, n_blocks, n_o8, O)

    _resample2_t_body(
        None, out_ref, res_ref, coeffs, params, t_starts,
        o8=o8, rt=rt, read_row=_slab_read_of(slab_ref, i % 2, o8, O),
    )


def _resample_kernel_t_manual(hbm_ref, out_ref, slab_ref, sem_ref, *,
                              params, coeffs, starts, mask, n_o8, n_blocks,
                              O):
    b = pl.program_id(0)
    o8 = pl.program_id(1)
    i = b * n_o8 + o8
    _manual_dma_chain(hbm_ref, slab_ref, sem_ref, i, n_blocks, n_o8, O)
    _resample_t_body(
        None, out_ref, coeffs, params, starts, mask,
        o8=o8, read_row=_slab_read_of(slab_ref, i % 2, o8, O),
    )


def _manual_batched_ok(O: int, R_in: int, T_in: int, plan,
                       tpu: bool | None = None) -> bool:
    # Mosaic constraint (measured, real chip): the manual kernels' dynamic
    # (slot, row) scratch slices lower to tpu.memref_slice, whose LANE
    # extent must be 128-aligned and SUBLANE extent 8-aligned — the
    # automatic kernels' static row indices are exempt. The chain's first
    # warp pass qualifies once the batched deskew pads the z-groups axis to
    # 8 (pad_groups8); the x pass (lane = Zo) does not and keeps the
    # vmapped automatic kernel. Interpret mode (CPU tests) is exempt.
    if tpu is None:
        tpu = jax.default_backend() == "tpu"
    lane_ok = not tpu or (T_in % 128 == 0 and R_in % 8 == 0)
    return (
        plan is not None
        and O >= O8
        and lane_ok
        and os.environ.get("BIAHUB_TPU_NO_MANUAL_DMA") != "1"
        and 2 * O8 * R_in * T_in * 4 <= _MANUAL_SLAB_BYTES
    )


@partial(jax.jit, static_argnames=("r_out", "t_out", "rc", "tc", "order",
                                   "mask_oob"))
def shear_resample2_pallas_t_batched(
    data_bort: jax.Array,
    r_out: int,
    t_out: int,
    rc: tuple[float, float, float],
    tc: tuple[float, float, float],
    order: int = 3,
    mask_oob: bool = False,
) -> jax.Array:
    """Batched :func:`shear_resample2_pallas_t` — bit-identical to vmapping
    it, with the input in HBM and a manually double-buffered o8-block DMA
    chain overlapping the banded MXU dots (the automatic kernel measures at
    its no-overlap bound; see :func:`_manual_dma_chain`). Pallas forbids
    the non-trivial ANY-space indexing a vmapped manual kernel would need,
    hence the explicit batch entry point (single-device batches only)."""
    B, O, R_in, T_in = data_bort.shape
    support = 2 if order == 1 else 4
    K_r = _k_window(int(np.ceil(TILE_R * abs(rc[0]))) + support, R_in)
    K_t_dyn = _k_window(int(np.ceil(TILE_R * abs(tc[0]))) + support, T_in)
    t_plan = static_window_plan(
        [tuple(float(c) for c in tc)], O, t_out, T_in, order, k_dyn=K_t_dyn
    )
    if not _manual_batched_ok(O, R_in, T_in, t_plan):
        return jax.vmap(
            lambda v: shear_resample2_pallas_t(
                v, r_out, t_out, rc, tc, order=order, mask_oob=mask_oob
            )
        )(data_bort)
    K_t, t_starts = t_plan
    n_t_tiles = -(-t_out // TILE_R)
    n_o8 = -(-O // O8)
    n_r_tiles = -(-r_out // TILE_R)
    kernel = partial(
        _resample2_kernel_t_manual,
        params=(R_in, T_in, r_out, t_out, K_r, K_t, n_t_tiles, int(order),
                bool(mask_oob)),
        coeffs=tuple(float(c) for c in rc) + tuple(float(c) for c in tc),
        t_starts=t_starts,
        n_o8=n_o8,
        n_blocks=B * n_o8,
        O=O,
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B, n_o8, n_r_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        # The batch axis is MERGED into the leading out dim (3D array,
        # block index b -> offset b*t_out): a 4D out would need Mosaic to
        # slice the batch dim of a ragged-lane (r_out % 128 != 0) memref,
        # which it rejects (measured, real chip); the 3D form is tiled
        # exactly like the automatic kernel's. The reshape after the call
        # splits the leading dim back out — row-major, zero data movement.
        out_specs=pl.BlockSpec(
            (t_out, O8, TILE_R),
            lambda b, o, r: (b, o, r),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * t_out, O, r_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T_in, O8 * TILE_R), jnp.float32),
            pltpu.VMEM((2, O8, R_in, T_in), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(data_bort.astype(jnp.float32)).reshape(B, t_out, O, r_out)


@partial(jax.jit, static_argnames=("r_out", "cr", "co", "tau", "order",
                                   "mask"))
def shear_resample_pallas_t_batched(
    data_bort: jax.Array,
    r_out: int,
    cr: float,
    co: float,
    tau: float,
    order: int = 3,
    mask=None,
) -> jax.Array:
    """Batched :func:`shear_resample_pallas_t` with the manual o8-block DMA
    chain (see :func:`shear_resample2_pallas_t_batched`)."""
    B, O, R_in, T = data_bort.shape
    support = 2 if order == 1 else 4
    K_dyn = min(
        -(-(int(np.ceil(TILE_R * abs(cr))) + support + 8) // 8) * 8, R_in
    )
    plan = static_window_plan(
        [(float(cr), float(co), float(tau))], O, r_out, R_in, order,
        k_dyn=K_dyn,
    )
    if not _manual_batched_ok(O, R_in, T, plan):
        return jax.vmap(
            lambda v: shear_resample_pallas_t(
                v, r_out, cr, co, tau, order=order, mask=mask
            )
        )(data_bort)
    K, starts = plan
    n_tiles = -(-r_out // TILE_R)
    n_o8 = -(-O // O8)
    kernel = partial(
        _resample_kernel_t_manual,
        params=(R_in, T, r_out, K, n_tiles, int(order), False),
        coeffs=(float(cr), float(co), float(tau)),
        starts=starts,
        mask=mask,
        n_o8=n_o8,
        n_blocks=B * n_o8,
        O=O,
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B, n_o8),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        # Batch merged into the leading out dim (see the fused variant's
        # note above); reshaped back for free after the call.
        out_specs=pl.BlockSpec(
            (T, O8, r_out),
            lambda b, o: (b, o, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * T, O, r_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, O8, R_in, T), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(data_bort.astype(jnp.float32)).reshape(B, T, O, r_out)


def _resample_kernel_dyn_deriv(coeffs_ref, data_ref, out_ref, *, params):
    """Forward pass with d(weight)/d(coord) bands: used for coefficient
    gradients (dy/dtau etc. are band-derivative resamples of the data)."""
    R_in, T, R_out, K, n_tiles, order = params
    cr = coeffs_ref[0, 0]
    co = coeffs_ref[0, 1]
    tau = coeffs_ref[0, 2]
    o_idx = pl.program_id(0).astype(jnp.float32)

    for tile in range(n_tiles):
        tile_w = min(TILE_R, R_out - tile * TILE_R)
        ro = (
            tile * TILE_R
            + jax.lax.broadcasted_iota(jnp.int32, (tile_w, 1), 0)
        ).astype(jnp.float32)
        coords = cr * ro + co * o_idx + tau
        i0 = jnp.floor(coords)
        frac = coords - i0
        i0 = i0.astype(jnp.int32)

        lo = jnp.minimum(i0[0, 0], i0[tile_w - 1, 0]) - 1
        start = jnp.clip(lo, 0, max(R_in - K, 0))
        start = pl.multiple_of((start // 8) * 8, 8)
        offs = i0 - start

        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_w, K), 1)

        def band(k, wk):
            return wk * (cols == jnp.clip(offs + k, 0, K - 1))

        if order == 1:
            w = band(0, -jnp.ones_like(frac)) + band(1, jnp.ones_like(frac))
        else:
            t2 = frac * frac
            w = (
                band(-1, -1.5 * t2 + 2.0 * frac - 0.5)
                + band(0, 4.5 * t2 - 5.0 * frac)
                + band(1, -4.5 * t2 + 4.0 * frac + 0.5)
                + band(2, 1.5 * t2 - 1.0 * frac)
            )

        slab = data_ref[0, pl.ds(start, K), :]
        out_ref[0, :, pl.ds(tile * TILE_R, tile_w)] = _banded_dot(slab, w)


def _resample_kernel_dyn_adjoint(coeffs_ref, ybar_ref, out_ref, *, params):
    """Adjoint w.r.t. the data: routes cotangents back through the bands.

    dbar[o, p, t] = sum_q w_k(c_q) [floor(c_q) + k == p] ybar[o, q, t]; the
    contributing q lie in a window around (p - co*o - tau)/cr, and the weight
    matrix is built from the SAME forward coordinate arithmetic so floor
    knife-edges route consistently.
    """
    R_out_y, T, R_in, K, n_tiles, order = params  # ybar is (O, R_out, T)
    cr = coeffs_ref[0, 0]
    co = coeffs_ref[0, 1]
    tau = coeffs_ref[0, 2]
    o_idx = pl.program_id(0).astype(jnp.float32)

    for tile in range(n_tiles):
        tile_w = min(TILE_R, R_in - tile * TILE_R)
        p = (
            tile * TILE_R
            + jax.lax.broadcasted_iota(jnp.int32, (tile_w, 1), 0)
        ).astype(jnp.float32)
        # q window center: the forward coord c_q = p solves to q ~ qc(p)
        qc = (p - co * o_idx - tau) / cr
        q_lo = jnp.floor(jnp.minimum(qc[0, 0], qc[tile_w - 1, 0])) - (K // 4)
        start = jnp.clip(q_lo.astype(jnp.int32), 0, max(R_out_y - K, 0))
        start = pl.multiple_of((start // 8) * 8, 8)

        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_w, K), 1)
        q_abs = (start + cols).astype(jnp.float32)
        c = cr * q_abs + co * o_idx + tau  # forward coords of window entries
        i0 = jnp.floor(c)
        frac = c - i0
        k = p.astype(jnp.int32) - i0.astype(jnp.int32)  # band index hit by p

        if order == 1:
            w = jnp.where(k == 0, 1.0 - frac, 0.0) + jnp.where(k == 1, frac, 0.0)
        else:
            t2 = frac * frac
            t3 = t2 * frac
            w = (
                jnp.where(k == -1, -0.5 * t3 + t2 - 0.5 * frac, 0.0)
                + jnp.where(k == 0, 1.5 * t3 - 2.5 * t2 + 1.0, 0.0)
                + jnp.where(k == 1, -1.5 * t3 + 2.0 * t2 + 0.5 * frac, 0.0)
                + jnp.where(k == 2, 0.5 * t3 - 0.5 * t2, 0.0)
            )
        slab = ybar_ref[0, pl.ds(start, K), :]  # (K, T) window of cotangents
        out_ref[0, :, pl.ds(tile * TILE_R, tile_w)] = _banded_dot(slab, w)


def _dyn_call(kernel_fn, data, r_out, coeffs, K, order):
    O, R_mid, T = data.shape
    n_tiles = -(-r_out // TILE_R)
    kern = partial(kernel_fn, params=(R_mid, T, r_out, K, n_tiles, int(order)))
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(O,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda o: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R_mid, T), lambda o: (o, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, r_out), lambda o: (o, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((O, T, r_out), jnp.float32),
    )(coeffs.astype(jnp.float32).reshape(1, 3), data.astype(jnp.float32))


@partial(jax.jit, static_argnames=("r_out", "k_bound", "order"))
def shear_resample_deriv_dyn(data_ort, r_out, coeffs, k_bound, order=3):
    """Band-derivative forward pass (d y / d coordinate), traced coeffs."""
    O, R_in, T = data_ort.shape
    K = min(-(-(k_bound + 8) // 8) * 8, R_in)
    return _dyn_call(_resample_kernel_dyn_deriv, data_ort, r_out, coeffs, K, order)


@partial(jax.jit, static_argnames=("r_in", "k_bound", "order"))
def shear_resample_adjoint_dyn(ybar_oqt, r_in, coeffs, k_bound, order=3):
    """Adjoint-data pass: (O, R_out, T) cotangents -> (O, T, R_in)."""
    O, R_out_y, T = ybar_oqt.shape
    K = min(-(-(k_bound + 8) // 8) * 8, R_out_y)
    n_tiles = -(-r_in // TILE_R)
    kern = partial(
        _resample_kernel_dyn_adjoint,
        params=(R_out_y, T, r_in, K, n_tiles, int(order)),
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(O,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda o: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R_out_y, T), lambda o: (o, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, r_in), lambda o: (o, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((O, T, r_in), jnp.float32),
    )(coeffs.astype(jnp.float32).reshape(1, 3), ybar_oqt.astype(jnp.float32))

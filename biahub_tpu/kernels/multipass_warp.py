"""General 3D affine warp as a product of elementary resampling passes.

Serves the general-matrix case of the reference's three resamplers —
scipy ``affine_transform`` (reference: biahub/core/transform.py:374-396),
ANTs ``apply_to_image`` (reference: biahub/register.py:205-284), and the
per-timepoint stabilization warp (reference: biahub/stabilize.py:35-93) —
with a TPU-native factorized formulation.

TPU gathers whose indices vary along the lane axis are ~160x slower than row
gathers (see kernels/deskew.py), which makes the exact 8-corner trilinear
warp cost seconds per volume. This module factors an arbitrary affine into
elementary passes — each resampling ONE axis with an index that depends on at
most one other axis — so every pass is a fast-pattern ``take_along_axis``.

Factorization (LU on the linear part): M = L · U with L unit-lower-triangular
(three single-off-diagonal shears, whose product is exactly L) and U factored
into row passes with solved coefficients; translations are solved onto the
first pass of each row. Chained resampling data_k[q] = data_{k-1}[E_k q]
composes left-to-right to data_n[q] = vol[(E_1 ... E_n) q] = vol[M q].

All intermediate stages share one common integer coordinate frame (the union
bounding box of every stage's sampling range), so passes are uniform and the
final result is a plain slice.

Accuracy: each pass applies one linear interpolation, so k passes smooth
slightly more than a single trilinear sample — parity with scipy is at
interpolation-error level on smooth data, not float epsilon.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "multipass_affine_warp_zyx",
    "factor_affine",
    "make_batched_multipass_kernel",
    "make_traced_multipass_warp",
    "chunked_affine_warp_zyx",
    "common_frame_bytes",
]


def _pass_matrix(r: int, o: int, cr: float, co: float, tau: float) -> np.ndarray:
    e = np.eye(4)
    e[r, r] = cr
    if o != r:
        e[r, o] = co
    e[r, 3] = tau
    return e


# Fixed slot order shared by every factorization: the batched kernel compiles
# one pass per slot with traced coefficients, so all matrices in a batch run
# through the same program (identity slots are numerically exact no-ops).
CANONICAL_SLOTS: tuple[tuple[int, int], ...] = (
    (1, 0), (2, 0), (2, 1),  # L = E(1,0) E(2,0) E(2,1) exactly
    (0, 1), (0, 2), (1, 2), (2, 2),  # U row passes + final z scale
)


def _factor_canonical(matrix: np.ndarray) -> list[list[float]]:
    """Factor into the 7 CANONICAL_SLOTS passes; returns [cr, co, tau] each.

    The product of the slot pass matrices in order equals ``matrix``. Raises
    ValueError on vanishing pivots (e.g. exact 90-degree rotations); callers
    should fold such permutations out before factoring.
    """
    m = np.asarray(matrix, dtype=np.float64)
    a = m[:3, :3]
    if abs(np.linalg.det(a)) < 1e-12:
        raise ValueError("Singular linear part")

    lower = np.eye(3)
    upper = a.copy()
    for col in range(2):
        if abs(upper[col, col]) < 1e-9:
            raise ValueError("Zero pivot; permute axes before factoring")
        for row in range(col + 1, 3):
            f = upper[row, col] / upper[col, col]
            lower[row, col] = f
            upper[row] -= f * upper[col]
    u00, u01, u02 = upper[0]
    u11, u12 = upper[1, 1], upper[1, 2]
    u22 = upper[2, 2]
    if abs(u11) < 1e-9 or abs(u22) < 1e-9 or abs(u00) < 1e-9:
        raise ValueError("Zero pivot; permute axes before factoring")

    # U = E(0,1,u00,alpha) E(0,2,1,beta) E(1,2,u11,gamma) D(2,u22), with
    # coefficients solved so the product's rows 0/1 match U (verified by the
    # self-check below).
    alpha = u01 / u11
    gamma = u12 / u22
    beta = (u02 / u22 - alpha * gamma) / u00
    coeffs = [
        [1.0, float(lower[1, 0]), 0.0],
        [1.0, float(lower[2, 0]), 0.0],
        [1.0, float(lower[2, 1]), 0.0],
        [float(u00), float(alpha), 0.0],
        [1.0, float(beta), 0.0],
        [float(u11), float(gamma), 0.0],
        [float(u22), 0.0, 0.0],
    ]

    # Solve translations: composed translation = sum_k prefix_k @ (tau_k e_rk);
    # give each axis's unknown to the first slot on that row (slots 0, 1, 3
    # for rows 1, 2, 0). The 3x3 prefix-column system is always solvable for
    # nonsingular linear parts.
    first_for_row = {1: 0, 2: 1, 0: 3}
    rows = sorted(first_for_row)
    cols = []
    for row_axis in rows:
        slot = first_for_row[row_axis]
        prefix = np.eye(4)
        for (r, o), (cr, co, tau) in zip(CANONICAL_SLOTS[:slot], coeffs[:slot]):
            prefix = prefix @ _pass_matrix(r, o, cr, co, tau)
        cols.append(prefix[:3, row_axis])
    taus = np.linalg.solve(np.stack(cols, axis=1), m[:3, 3])
    for row_axis, tau in zip(rows, taus):
        coeffs[first_for_row[row_axis]][2] = float(tau)

    full = np.eye(4)
    for (r, o), (cr, co, tau) in zip(CANONICAL_SLOTS, coeffs):
        full = full @ _pass_matrix(r, o, cr, co, tau)
    if not np.allclose(full, m, atol=1e-6):
        raise ValueError("Affine factorization self-check failed")
    return coeffs


def factor_affine(matrix: np.ndarray) -> list[tuple[int, int, float, float, float]]:
    """Factor a 4x4 affine into elementary (r, o, cr, co, tau) passes.

    The product of the pass matrices in list order equals ``matrix``; exact
    identity slots are dropped so the single-volume warp only pays for passes
    that do work. Raises ValueError on vanishing pivots (e.g. exact 90-degree
    rotations); callers should fold such permutations out before factoring.
    """
    coeffs = _factor_canonical(matrix)
    passes = [
        (r, o, cr, co, tau)
        for (r, o), (cr, co, tau) in zip(CANONICAL_SLOTS, coeffs)
        if not (cr == 1.0 and (o == r or co == 0.0) and tau == 0.0)
    ]
    return passes or [(0, 0, 1.0, 0.0, 0.0)]


@partial(jax.jit, static_argnames=("r", "o", "no_off_diag", "order"))
def _apply_pass(data, r: int, o: int, cr, co, tau, fill, no_off_diag: bool,
                order: int = 3):
    """One elementary pass in the common frame: same shape in and out.

    Interpolation defaults to Catmull-Rom cubic: chaining k linear
    resamplings low-passes the data k times, which visibly attenuates
    structures a few voxels wide (a 27% peak loss on bead-like data for a
    7-pass warp). Catmull-Rom's near-flat passband makes each pass close to
    transparent, so the chain stays within ~1% of a single trilinear sample.
    """
    # Lay the pass out as (o, r, third): the gathers run along axis 1 (the
    # sublane axis) with indices constant along lanes — the fast TPU pattern
    # (see kernels/deskew.py). Gathering along axis 0 instead is ~100x slower.
    if no_off_diag:
        others = [ax for ax in range(3) if ax != r]
        axes = [others[0], r, others[1]]
        o = r
    else:
        third = next(ax for ax in range(3) if ax not in (r, o))
        axes = [o, r, third]
    perm = tuple(axes)
    inv_perm = tuple(int(i) for i in np.argsort(perm))
    d = jnp.transpose(data, perm)

    size_in = d.shape[1]
    i_r = jnp.arange(d.shape[1], dtype=jnp.float32)[None, :, None]
    coords = cr * i_r + tau
    if o != r:
        i_o = jnp.arange(d.shape[0], dtype=jnp.float32)[:, None, None]
        coords = coords + co * i_o

    i0 = jnp.floor(coords)
    t = coords - i0
    i0 = i0.astype(jnp.int32)
    # Only the frame bounds matter per-pass; the exact scipy constant-fill
    # boundary is enforced once at the end from the original matrix.
    in_domain = (coords >= 0) & (coords <= size_in - 1)

    if order == 1:
        bands = ((0, 1.0 - t), (1, t))
    else:
        t2 = t * t
        t3 = t2 * t
        bands = (
            (-1, -0.5 * t3 + t2 - 0.5 * t),
            (0, 1.5 * t3 - 2.5 * t2 + 1.0),
            (1, -1.5 * t3 + 2.0 * t2 + 0.5 * t),
            (2, 0.5 * t3 - 0.5 * t2),
        )
    bshape = d.shape[:2] + (1,)
    out = None
    for k, w in bands:
        idx = jnp.clip(i0 + k, 0, size_in - 1)
        v = jnp.take_along_axis(d, jnp.broadcast_to(idx, bshape), axis=1)
        out = w * v if out is None else out + w * v
    out = jnp.where(in_domain, out, jnp.asarray(fill, d.dtype))
    return jnp.transpose(out, inv_perm)


def _apply_pass_pallas_dyn(data, r: int, o: int, coeffs, k_bound: int):
    """Elementary pass with TRACED (cr, co, tau_eff) via the SMEM-coefficient
    Pallas kernel; ``k_bound`` is the static window bound from the batch."""
    from biahub_tpu.kernels.pallas_resample import shear_resample_pallas_dyn

    if o == r:
        others = [ax for ax in range(3) if ax != r]
        o_ax, third = others[0], others[1]
    else:
        o_ax = o
        third = next(ax for ax in range(3) if ax not in (r, o))
    d = jnp.transpose(data, (o_ax, r, third))
    out = shear_resample_pallas_dyn(d, d.shape[1], coeffs, k_bound)
    inv_perm = tuple(int(i) for i in np.argsort((o_ax, third, r)))
    return jnp.transpose(out, inv_perm)


def _apply_pass_pallas(data, r: int, o: int, cr, co, tau):
    """One elementary pass via the fused MXU shear-resample kernel.

    Same math as :func:`_apply_pass` (Catmull-Rom), but the banded
    interpolation runs as one-hot matmuls on the MXU instead of four
    take_along_axis gathers (see kernels/pallas_resample.py).
    """
    from biahub_tpu.kernels.pallas_resample import shear_resample_pallas

    if o == r or co == 0.0:
        others = [ax for ax in range(3) if ax != r]
        o_ax, third = others[0], others[1]
        co = 0.0
    else:
        o_ax = o
        third = next(ax for ax in range(3) if ax not in (r, o))
    d = jnp.transpose(data, (o_ax, r, third))  # (O, R_in, T)
    out = shear_resample_pallas(d, d.shape[1], float(cr), float(co), float(tau))
    # Kernel emits (O, T, R): restore the natural axis order
    inv_perm = tuple(int(i) for i in np.argsort((o_ax, third, r)))
    return jnp.transpose(out, inv_perm)


def _coord_bounds(passes, in_shape, out_shape) -> tuple[np.ndarray, np.ndarray]:
    """Float (lo, hi) coordinate bounds any stage touches, plus the input extent.

    Sampling boxes per stage (true coordinates) are back-propagated from the
    output box through each pass; the union over stages and the input volume
    defines the common frame every pass runs in.
    """
    in_shape = np.asarray(in_shape)
    out_shape = np.asarray(out_shape)
    n = len(passes)
    boxes = [None] * (n + 1)
    boxes[n] = (np.zeros(3), out_shape.astype(np.float64) - 1)
    for k in range(n - 1, -1, -1):
        r, o, cr, co, tau = passes[k]
        lo, hi = boxes[k + 1]
        vals = [
            cr * v + (co * w if o != r else 0.0) + tau
            for v in (lo[r], hi[r])
            for w in ((lo[o], hi[o]) if o != r else (0.0,))
        ]
        new_lo, new_hi = lo.copy(), hi.copy()
        new_lo[r], new_hi[r] = min(vals), max(vals)
        boxes[k] = (new_lo, new_hi)
    los = np.stack([b[0] for b in boxes] + [np.zeros(3)])
    his = np.stack([b[1] for b in boxes] + [in_shape.astype(np.float64) - 1])
    return los.min(axis=0), his.max(axis=0)


def _frame_from_bounds(lo: np.ndarray, hi: np.ndarray):
    # 2 margin voxels per side: Catmull-Rom reads i0-1..i0+2 around in-box
    # coords, and the Pallas path drops (rather than edge-clamps) bands that
    # fall outside the frame.
    off = np.floor(lo).astype(int) - 2  # common index = coord - off
    size = (np.ceil(hi).astype(int) - off) + 4
    return off, tuple(int(s) for s in size)


def common_frame_bytes(
    matrices, in_shape: tuple[int, int, int], out_shape: tuple[int, int, int]
) -> int:
    """Per-volume HBM working footprint of the COMMON-frame multipass warp.

    The general warp embeds the volume into a frame spanning every pass's
    coordinate bounds (:func:`_coord_bounds`), which for large rotations can
    dwarf both the input and the output — a volume can fit the batch budget
    by its in+out footprint yet blow HBM inside the warp (the gap the
    reference avoids by splitting along X for GPU memory,
    biahub/deskew.py:554-576). Callers add this to their budget math so
    over-frame volumes take the chunked path, whose back-propagated per-chunk
    boxes keep frames small.

    ``matrices`` is one 4x4 or a sequence of them: batched kernels
    (:func:`make_batched_multipass_kernel`) build ONE frame spanning the
    UNION of every matrix's bounds, so the estimate unions too — the max of
    per-matrix frames underestimates opposing-drift stacks (measured 1.9x
    low). Returns 0 for matrix families that never build the common frame
    (translation / in-plane / exact-gather fallback).
    """
    from biahub_tpu.kernels.affine import is_inplane_matrix, is_translation_matrix

    mats = np.asarray(matrices, dtype=np.float64)
    if mats.ndim == 2:
        mats = mats[None]
    if all(is_translation_matrix(m) or is_inplane_matrix(m) for m in mats):
        return 0
    in_shape = np.asarray(in_shape)
    out_shape = np.asarray(out_shape)
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for m in mats:
        try:
            passes = factor_affine(m)
        except ValueError:  # vanishing pivot: exact-gather fallback
            continue
        m_lo, m_hi = _coord_bounds(passes, in_shape, out_shape)
        lo = np.minimum(lo, m_lo)
        hi = np.maximum(hi, m_hi)
    if not np.isfinite(lo).all():
        return 0  # nothing factorable: no common frame gets built
    _, frame_shape = _frame_from_bounds(lo, hi)
    # Two frame-sized f32 buffers are alive while each elementary pass runs.
    return 2 * 4 * int(np.prod(frame_shape))


def multipass_affine_warp_zyx(
    volume: jax.Array,
    matrix: np.ndarray,
    output_shape: tuple[int, int, int],
    fill: float = 0.0,
) -> jax.Array:
    """Warp by a general (concrete) affine via elementary fast passes."""
    matrix = np.asarray(matrix, dtype=np.float64)
    in_shape = np.asarray(volume.shape)
    out_shape = np.asarray(output_shape)
    passes = factor_affine(matrix)
    lo, hi = _coord_bounds(passes, in_shape, out_shape)
    off, frame_shape = _frame_from_bounds(lo, hi)
    size = np.asarray(frame_shape)

    # Embed the input volume into the common frame (integer pad, exact).
    # Edge replication keeps near-boundary passes blending with real data
    # instead of fill; the exact domain mask at the end restores scipy's
    # constant fill everywhere outside.
    pad = [(int(-off[ax]), int(size[ax] - in_shape[ax] + off[ax])) for ax in range(3)]
    data = jnp.pad(volume.astype(jnp.float32), pad, mode="edge")

    use_pallas = (
        jax.default_backend() == "tpu"
        or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
    ) and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
    for r, o, cr, co, tau in passes:
        # True coords: c_in[r] = cr*p[r] + co*p[o] + tau; common indices add off
        tau_eff = cr * off[r] + (co * off[o] if o != r else 0.0) + tau - off[r]
        if use_pallas:
            data = _apply_pass_pallas(
                data, int(r), int(o), float(cr), float(co), float(tau_eff)
            )
        else:
            data = _apply_pass(
                data, int(r), int(o), float(cr), float(co), float(tau_eff),
                float(fill), bool(o == r or co == 0.0),
            )

    start = (-off).astype(int)
    out = data[
        start[0] : start[0] + int(out_shape[0]),
        start[1] : start[1] + int(out_shape[1]),
        start[2] : start[2] + int(out_shape[2]),
    ]
    from biahub_tpu.kernels.affine import _exact_domain_mask

    return _exact_domain_mask(
        out,
        jnp.asarray(matrix, jnp.float32),
        tuple(int(s) for s in in_shape),
        tuple(int(s) for s in out_shape),
        float(fill),
    )


def make_batched_multipass_kernel(
    matrices,
    in_shape: tuple[int, int, int],
    out_shape: tuple[int, int, int],
    fill: float = 0.0,
):
    """One compiled multipass warp serving a whole batch of general affines.

    Batched executors (stabilize over timepoints, register over FOVs) compile
    ONE kernel with the matrix as a traced per-unit parameter — which rules
    out per-matrix host-side LU. Instead, every matrix is factored into the
    same fixed CANONICAL_SLOTS program up front, and the per-matrix
    coefficients ride along as a traced (7, 3) array of (cr, co, tau_eff);
    identity slots are numerically exact no-ops.

    Returns ``(kernel, params)`` where ``kernel(zyx, matrix, mp)`` is jittable
    and vmappable, and ``params[i]`` is the coefficient array for
    ``matrices[i]``. Raises ValueError when any matrix has a vanishing pivot
    (fall back to the exact gather in that case).
    """
    mats = [np.asarray(m, dtype=np.float64) for m in matrices]
    all_coeffs = [_factor_canonical(m) for m in mats]

    # Union frame over every matrix in the batch (shared static shape).
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for coeffs in all_coeffs:
        passes = [
            (r, o, cr, co, tau)
            for (r, o), (cr, co, tau) in zip(CANONICAL_SLOTS, coeffs)
        ]
        m_lo, m_hi = _coord_bounds(passes, in_shape, out_shape)
        lo = np.minimum(lo, m_lo)
        hi = np.maximum(hi, m_hi)
    off, frame_shape = _frame_from_bounds(lo, hi)
    size = np.asarray(frame_shape)

    params = np.zeros((len(mats), len(CANONICAL_SLOTS), 3), dtype=np.float32)
    for i, coeffs in enumerate(all_coeffs):
        for k, ((r, o), (cr, co, tau)) in enumerate(zip(CANONICAL_SLOTS, coeffs)):
            tau_eff = cr * off[r] + (co * off[o] if o != r else 0.0) + tau - off[r]
            params[i, k] = (cr, co, tau_eff)

    pad = [(int(-off[ax]), int(size[ax] - in_shape[ax] + off[ax])) for ax in range(3)]
    start = (-off).astype(int)
    in_shape_t = tuple(int(s) for s in in_shape)
    out_shape_t = tuple(int(s) for s in out_shape)

    # Static per-slot window bounds over the whole batch for the Pallas path
    from biahub_tpu.kernels.pallas_resample import TILE_R

    k_slots = [
        int(np.ceil(TILE_R * max(abs(c[k][0]) for c in all_coeffs))) + 4
        for k in range(len(CANONICAL_SLOTS))
    ]

    def kernel(zyx, matrix, mp):
        from biahub_tpu.kernels.affine import _exact_domain_mask

        use_pallas = (
            jax.default_backend() == "tpu"
            or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
        ) and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
        data = jnp.pad(zyx.astype(jnp.float32), pad, mode="edge")
        for k, (r, o) in enumerate(CANONICAL_SLOTS):
            if use_pallas:
                data = _apply_pass_pallas_dyn(data, r, o, mp[k], k_slots[k])
            else:
                data = _apply_pass(
                    data, r, o, mp[k, 0], mp[k, 1], mp[k, 2],
                    float(fill), r == o,
                )
        out = data[
            start[0] : start[0] + out_shape_t[0],
            start[1] : start[1] + out_shape_t[1],
            start[2] : start[2] + out_shape_t[2],
        ]
        return _exact_domain_mask(out, matrix, in_shape_t, out_shape_t, float(fill))

    return kernel, params


def make_traced_multipass_warp(
    in_shape: tuple[int, int, int],
    out_shape: tuple[int, int, int],
    fill: float = 0.0,
    margin: float = 0.25,
    order: int = 3,
    use_pallas: bool | None = None,
    max_scale: float = 1.5,
):
    """Differentiable multipass warp for TRACED matrices.

    Gradient-based registration (registration/intensity.py) evaluates the
    warp inside a jitted optimizer where the matrix is a function of traced
    parameters, so host-side factorization is impossible. The LU coefficients
    of the canonical pass program and the translation back-substitution have
    closed forms, so they are computed with traced arithmetic instead; the
    common frame becomes a static conservative box (each axis padded by
    ``margin`` of its extent). Passes sampling beyond the frame clamp to edge
    values — keep the optimized transform's excursion within the margin.

    Returns ``warp(volume, matrix) -> warped`` differentiable in both
    arguments. Not protected against vanishing pivots: matrices must stay
    away from 90-degree permutations (true for similarity refinement around
    an initial alignment).
    """
    in_shape = tuple(int(s) for s in in_shape)
    out_shape = tuple(int(s) for s in out_shape)
    ext = np.maximum(np.asarray(in_shape), np.asarray(out_shape))
    pad_n = np.ceil(margin * ext).astype(int) + 2
    off = -pad_n
    size = ext + 2 * pad_n + 2
    frame_shape = tuple(int(s) for s in size)
    pad = [(int(-off[ax]), int(size[ax] - in_shape[ax] + off[ax])) for ax in range(3)]
    start = (-off).astype(int)

    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
        ) and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
    pass_ad = None
    if use_pallas:
        from biahub_tpu.kernels.pallas_resample import TILE_R

        support = 2 if order == 1 else 4
        # Bound covers both the forward slope (cr <= max_scale) and the
        # adjoint slope (1/cr <= max_scale for cr >= 1/max_scale).
        k_bound = int(np.ceil(TILE_R * max_scale)) + support
        pass_ad = _pallas_pass_ad(order, k_bound)

    def warp(volume, matrix):
        from biahub_tpu.kernels.affine import _exact_domain_mask

        matrix = jnp.asarray(matrix, jnp.float32)
        a = matrix[:3, :3]
        t = matrix[:3, 3]
        # Doolittle LU of the 3x3 (no pivoting), then the U row-pass
        # coefficients — identical math to _factor_canonical, traced.
        l10 = a[1, 0] / a[0, 0]
        l20 = a[2, 0] / a[0, 0]
        u11 = a[1, 1] - l10 * a[0, 1]
        u12 = a[1, 2] - l10 * a[0, 2]
        l21 = (a[2, 1] - l20 * a[0, 1]) / u11
        u22 = a[2, 2] - l20 * a[0, 2] - l21 * u12
        u00, u01, u02 = a[0, 0], a[0, 1], a[0, 2]
        alpha = u01 / u11
        gamma = u12 / u22
        beta = (u02 / u22 - alpha * gamma) / u00
        # Translations: slots (1,0), (2,0), (0,1) carry the unknowns; the
        # prefix products are I, E(1,0), and L respectively, so the 3x3
        # system back-substitutes in closed form.
        tau_0 = t[0]
        tau_1 = t[1] - t[0] * l10
        tau_2 = t[2] - t[0] * (l20 + l21 * l10)
        one = jnp.ones(())
        zero = jnp.zeros(())
        coeffs = (
            (one, l10, tau_1),
            (one, l20, tau_2),
            (one, l21, zero),
            (u00, alpha, tau_0),
            (one, beta, zero),
            (u11, gamma, zero),
            (u22, zero, zero),
        )

        data = jnp.pad(volume.astype(jnp.float32), pad, mode="edge")
        for (r, o), (cr, co, tau) in zip(CANONICAL_SLOTS, coeffs):
            tau_eff = cr * off[r] + (co * off[o] if o != r else 0.0) + tau - off[r]
            if pass_ad is not None:
                # Pallas path with a custom VJP; same (o, r, third) layout as
                # _apply_pass_pallas_dyn, transposes differentiated by XLA.
                if o == r:
                    others = [ax for ax in range(3) if ax != r]
                    o_ax, third = others[0], others[1]
                else:
                    o_ax = o
                    third = next(ax for ax in range(3) if ax not in (r, o))
                d_ort = jnp.transpose(data, (o_ax, r, third))
                out_otr = pass_ad(d_ort, jnp.stack([cr, co, tau_eff]))
                inv_perm = tuple(int(i) for i in np.argsort((o_ax, third, r)))
                data = jnp.transpose(out_otr, inv_perm)
            else:
                data = _apply_pass(
                    data, r, o, cr, co, tau_eff, float(fill), r == o, order=order
                )
        out = data[
            start[0] : start[0] + out_shape[0],
            start[1] : start[1] + out_shape[1],
            start[2] : start[2] + out_shape[2],
        ]
        return _exact_domain_mask(out, matrix, in_shape, out_shape, float(fill))

    return warp


def _pallas_pass_ad(order: int, k_bound: int):
    """Differentiable Pallas pass: custom VJP over the dyn shear-resample.

    The adjoint w.r.t. the data is another banded pass built from the same
    forward coordinate arithmetic; coefficient gradients come from a
    band-derivative forward pass (see kernels/pallas_resample.py). Band
    contributions clamped at the frame edge are dropped in the adjoint —
    exact inside the frame margin, which is why the traced warp pads one.
    """
    from biahub_tpu.kernels.pallas_resample import (
        shear_resample_adjoint_dyn,
        shear_resample_deriv_dyn,
        shear_resample_pallas_dyn,
    )

    @jax.custom_vjp
    def pass_ad(d, coeffs):
        return shear_resample_pallas_dyn(d, d.shape[1], coeffs, k_bound, order)

    def fwd(d, coeffs):
        return pass_ad(d, coeffs), (d, coeffs)

    def bwd(res, ybar):  # ybar: (O, T, R)
        d, coeffs = res
        O, R_in, _ = d.shape
        dv = shear_resample_deriv_dyn(d, R_in, coeffs, k_bound, order)
        q = jnp.arange(R_in, dtype=jnp.float32)[None, None, :]
        o = jnp.arange(O, dtype=jnp.float32)[:, None, None]
        cr_b = jnp.sum(ybar * dv * q)
        co_b = jnp.sum(ybar * dv * o)
        tau_b = jnp.sum(ybar * dv)
        yb_oqt = jnp.transpose(ybar, (0, 2, 1))
        dbar = shear_resample_adjoint_dyn(yb_oqt, R_in, coeffs, k_bound, order)
        return jnp.transpose(dbar, (0, 2, 1)), jnp.stack([cr_b, co_b, tau_b])

    pass_ad.defvjp(fwd, bwd)
    return pass_ad


def multipass_affine_warp_zyx_chunked(
    read_fn,
    matrix,
    in_shape: tuple[int, int, int],
    out_shape: tuple[int, int, int],
    chunk_zyx: tuple[int, int, int],
    fill: float = 0.0,
    write_fn=None,
):
    """General warp of a volume too large for HBM, one output chunk at a time.

    For each output chunk the needed input box is the chunk box
    back-propagated through the pass chain (plus per-pass interpolation
    support); only that sub-box is read (``read_fn(z_slice, y_slice,
    x_slice) -> ndarray``) and warped with an offset-adjusted matrix. Chunks
    are returned via ``write_fn(z_slice, y_slice, x_slice, data)`` or as a
    list. Out-of-domain masking is exact (the sub-box clips at the global
    volume edge); interior values agree with the whole-volume warp at the
    multipass interpolation tolerance (~0.3% on smooth data — the factored
    passes' intermediate lattice phase shifts with the chunk offset).

    The spatial analog of the deskew X-slab split for the general warp
    (reference's GPU-memory splitting: biahub/deskew.py:554-582).
    """
    matrix = np.asarray(matrix, dtype=np.float64)
    support = 3  # Catmull-Rom reads i0-1..i0+2
    passes = factor_affine(matrix)

    def warp_chunk(sub, local, chunk_shape):
        return multipass_affine_warp_zyx(sub, local, chunk_shape, fill=fill)

    return _chunked_warp_loop(
        read_fn,
        matrix,
        in_shape,
        out_shape,
        chunk_zyx,
        _pass_input_needs(passes, support),
        warp_chunk,
        write_fn,
        support,
    )


def _pass_input_needs(passes, support: int):
    """Input-coordinate box a chunk's pass chain touches: the chunk box
    back-propagated through every pass (intermediate shears overshoot the
    plain affine image of the corners)."""

    def input_needs(lo, hi):
        b_lo, b_hi = lo.copy(), hi.copy()
        for r, o, cr, co, tau in reversed(passes):
            vals = [
                cr * v + (co * w if o != r else 0.0) + tau
                for v in (b_lo[r], b_hi[r])
                for w in ((b_lo[o], b_hi[o]) if o != r else (0.0,))
            ]
            # The interpolation support widens the needed box at EVERY pass
            b_lo[r], b_hi[r] = min(vals) - support, max(vals) + support
        return b_lo, b_hi

    return input_needs


def _corner_input_needs(matrix: np.ndarray, support: int):
    """Input box for single-pass warps: the affine image of the 8 corners."""

    def input_needs(lo, hi):
        corners = np.array(
            [[v[0], v[1], v[2], 1.0]
             for v in [(z, y, x) for z in (lo[0], hi[0])
                       for y in (lo[1], hi[1]) for x in (lo[2], hi[2])]]
        )
        imgs = (matrix @ corners.T)[:3]
        return imgs.min(axis=1) - support, imgs.max(axis=1) + support

    return input_needs


def chunked_affine_warp_zyx(
    read_fn,
    matrix,
    in_shape: tuple[int, int, int],
    out_shape: tuple[int, int, int],
    chunk_zyx: tuple[int, int, int],
    fill: float = 0.0,
    write_fn=None,
    order: int = 1,
):
    """Chunked over-HBM warp that dispatches like :func:`affine_warp_auto`.

    Each output chunk is warped with the same kernel family the in-budget
    batched path would use for this matrix (translation / in-plane /
    multipass / exact gather), so results do not depend on the
    BIAHUB_TPU_MAX_BATCH_BYTES budget. ``order=0`` and vanishing-pivot
    matrices (which :func:`factor_affine` rejects) fall back to the exact
    per-chunk gather instead of crashing mid-run.
    """
    from biahub_tpu.kernels.affine import (
        affine_warp_auto,
        is_inplane_matrix,
        is_translation_matrix,
    )

    matrix = np.asarray(matrix, dtype=np.float64)
    support = 3
    if order == 1 and is_translation_matrix(matrix):
        from biahub_tpu.kernels.affine import translation_warp_zyx

        passes = [(ax, ax, 1.0, 0.0, float(matrix[ax, 3])) for ax in range(3)]
        input_needs = _pass_input_needs(passes, support)

        # Bit-consistency with the in-budget translation kernel: the local
        # translation differs from the global one by an integer, so compute
        # it as f32(global) + integer — the in-kernel sample position then
        # rounds identically to the whole-volume warp's.
        def warp_chunk(sub, local, chunk_shape):
            m_int = np.round(local[:3, 3] - matrix[:3, 3])
            tvec = matrix[:3, 3].astype(np.float32) + m_int.astype(np.float32)
            return translation_warp_zyx(
                sub, jnp.asarray(tvec), chunk_shape, fill=fill
            )

        return _chunked_warp_loop(
            read_fn, matrix, in_shape, out_shape, chunk_zyx,
            input_needs, warp_chunk, write_fn, support,
        )
    if order == 1 and is_inplane_matrix(matrix):
        # Same 3-pass factorization as inplane_affine_warp_zyx.
        b1 = matrix[1, 2] / matrix[2, 2]
        passes = [
            (0, 0, float(matrix[0, 0]), 0.0, float(matrix[0, 3])),
            (1, 2, float(matrix[1, 1] - b1 * matrix[2, 1]), float(b1),
             float(matrix[1, 3] - b1 * matrix[2, 3])),
            (2, 1, float(matrix[2, 2]), float(matrix[2, 1]), float(matrix[2, 3])),
        ]
        input_needs = _pass_input_needs(passes, support)
    elif order == 1:
        try:
            input_needs = _pass_input_needs(factor_affine(matrix), support)
        except ValueError:  # vanishing pivot: exact gather per chunk
            input_needs = _corner_input_needs(matrix, support)
    else:
        input_needs = _corner_input_needs(matrix, support)

    def warp_chunk(sub, local, chunk_shape):
        return affine_warp_auto(sub, local, chunk_shape, fill=fill, order=order)

    return _chunked_warp_loop(
        read_fn,
        matrix,
        in_shape,
        out_shape,
        chunk_zyx,
        input_needs,
        warp_chunk,
        write_fn,
        support,
    )


def _chunked_warp_loop(
    read_fn,
    matrix: np.ndarray,
    in_shape,
    out_shape,
    chunk_zyx,
    input_needs,
    warp_chunk,
    write_fn,
    support: int,
):
    in_shape = tuple(int(s) for s in in_shape)
    out_shape = tuple(int(s) for s in out_shape)
    results = []
    for z0 in range(0, out_shape[0], chunk_zyx[0]):
        for y0 in range(0, out_shape[1], chunk_zyx[1]):
            for x0 in range(0, out_shape[2], chunk_zyx[2]):
                lo = np.array([z0, y0, x0], dtype=np.float64)
                hi = np.minimum(
                    lo + np.asarray(chunk_zyx) - 1,
                    np.asarray(out_shape, dtype=np.float64) - 1,
                )
                need_lo, need_hi = input_needs(lo, hi)
                in_lo = np.clip(np.floor(need_lo) - support, 0, None).astype(int)
                in_hi = np.minimum(
                    np.ceil(need_hi) + support, np.asarray(in_shape) - 1
                ).astype(int)
                in_hi = np.maximum(in_hi, in_lo)  # degenerate all-outside case

                sub = read_fn(
                    slice(in_lo[0], in_hi[0] + 1),
                    slice(in_lo[1], in_hi[1] + 1),
                    slice(in_lo[2], in_hi[2] + 1),
                )
                # Local matrix: global_out = chunk_lo + local_out,
                # global_in = in_lo + local_in
                local = matrix.copy()
                local[:3, 3] = (
                    matrix[:3, 3] + matrix[:3, :3] @ lo - in_lo.astype(np.float64)
                )
                chunk_shape = tuple((hi - lo).astype(int) + 1)
                out_chunk = np.asarray(
                    warp_chunk(
                        jnp.asarray(np.asarray(sub, dtype=np.float32)),
                        local,
                        chunk_shape,
                    )
                )
                sl = (
                    slice(z0, z0 + chunk_shape[0]),
                    slice(y0, y0 + chunk_shape[1]),
                    slice(x0, x0 + chunk_shape[2]),
                )
                if write_fn is not None:
                    write_fn(*sl, out_chunk)
                else:
                    results.append((sl, out_chunk))
    return results if write_fn is None else None

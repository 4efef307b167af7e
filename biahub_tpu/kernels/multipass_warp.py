"""General 3D affine warp as a product of elementary resampling passes.

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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["multipass_affine_warp_zyx", "factor_affine"]


def _pass_matrix(r: int, o: int, cr: float, co: float, tau: float) -> np.ndarray:
    e = np.eye(4)
    e[r, r] = cr
    if o != r:
        e[r, o] = co
    e[r, 3] = tau
    return e


def factor_affine(matrix: np.ndarray) -> list[tuple[int, int, float, float, float]]:
    """Factor a 4x4 affine into elementary (r, o, cr, co, tau) passes.

    The product of the pass matrices in list order equals ``matrix``. Raises
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

    passes: list[list] = []
    # L = E(1,0,l10) E(2,0,l20) E(2,1,l21) exactly (cross terms vanish)
    if lower[1, 0] != 0:
        passes.append([1, 0, 1.0, float(lower[1, 0]), 0.0])
    if lower[2, 0] != 0:
        passes.append([2, 0, 1.0, float(lower[2, 0]), 0.0])
    if lower[2, 1] != 0:
        passes.append([2, 1, 1.0, float(lower[2, 1]), 0.0])

    # U = E(0,1,u00,alpha) E(0,2,1,beta) E(1,2,u11,gamma) D(2,u22), with
    # coefficients solved so the product's row 0/1 match U (derivation in the
    # module docstring's factorization note; verified by the self-check).
    alpha = u01 / u11
    gamma = u12 / u22
    beta = (u02 / u22 - alpha * gamma) / u00
    passes.append([0, 1, float(u00), float(alpha), 0.0])
    if beta != 0:
        passes.append([0, 2, 1.0, float(beta), 0.0])
    passes.append([1, 2, float(u11), float(gamma), 0.0])
    if u22 != 1.0:
        passes.append([2, 2, float(u22), 0.0, 0.0])

    # Drop passes that are exactly identity
    passes = [p for p in passes if not (p[2] == 1.0 and (p[1] == p[0] or p[3] == 0.0))]
    if not passes:
        passes = [[0, 0, 1.0, 0.0, 0.0]]

    # Self-check of the linear part
    lin = np.eye(4)
    for r, o, cr, co, tau in passes:
        lin = lin @ _pass_matrix(r, o, cr, co, tau)
    if not np.allclose(lin[:3, :3], a, atol=1e-8):
        raise ValueError("Factorization self-check failed")

    # Solve translations: composed translation = sum_k prefix_k @ (tau_k e_rk);
    # give each axis's unknown to the first pass on that row.
    first_for_row: dict[int, int] = {}
    for idx, (r, *_rest) in enumerate(passes):
        first_for_row.setdefault(r, idx)
    # Translations couple across axes through the prefixes, so every axis
    # needs a pass; append identity passes for rows never resampled.
    for ax in range(3):
        if ax not in first_for_row:
            passes.append([ax, ax, 1.0, 0.0, 0.0])
            first_for_row[ax] = len(passes) - 1
    rows = sorted(first_for_row)
    cols = []
    for row_axis in rows:
        pass_idx = first_for_row[row_axis]
        prefix = np.eye(4)
        for r, o, cr, co, tau in passes[:pass_idx]:
            prefix = prefix @ _pass_matrix(r, o, cr, co, tau)
        cols.append(prefix[:3, row_axis])
    target = m[:3, 3].copy()
    mat = np.stack(cols, axis=1)
    taus = np.linalg.solve(mat, target)
    for row_axis, tau in zip(rows, taus):
        passes[first_for_row[row_axis]][4] = float(tau)
    # Identity passes that received no translation are dead weight
    passes = [
        p for p in passes
        if not (p[2] == 1.0 and (p[1] == p[0] or p[3] == 0.0) and p[4] == 0.0)
    ] or [[0, 0, 1.0, 0.0, 0.0]]

    # Full self-check including translation
    full = np.eye(4)
    for r, o, cr, co, tau in passes:
        full = full @ _pass_matrix(r, o, cr, co, tau)
    if not np.allclose(full, m, atol=1e-6):
        raise ValueError("Affine factorization translation self-check failed")
    return [tuple(p) for p in passes]


@partial(jax.jit, static_argnames=("r", "o", "shape", "no_off_diag"))
def _apply_pass(data, r: int, o: int, cr, co, tau, shape, fill, no_off_diag: bool):
    """One elementary pass in the common frame: same shape in and out."""
    # Lay the pass out as (o, r, third): the gather runs along axis 1 (the
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
    frac = coords - i0
    i0 = i0.astype(jnp.int32)
    # Only the frame bounds matter per-pass; the exact scipy constant-fill
    # boundary is enforced once at the end from the original matrix.
    in_domain = (coords >= 0) & (coords <= size_in - 1)
    idx0 = jnp.clip(i0, 0, size_in - 1)
    idx1 = jnp.clip(i0 + 1, 0, size_in - 1)
    bshape = d.shape[:2] + (1,)
    v0 = jnp.take_along_axis(d, jnp.broadcast_to(idx0, bshape), axis=1)
    v1 = jnp.take_along_axis(d, jnp.broadcast_to(idx1, bshape), axis=1)
    out = v0 * (1 - frac) + v1 * frac
    out = jnp.where(in_domain, out, jnp.asarray(fill, d.dtype))
    return jnp.transpose(out, inv_perm)


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
    n = len(passes)

    # Sampling boxes per stage (true coordinates), back-propagated from the
    # output box through each pass.
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

    # Common frame: union of every stage's box plus the input extent
    los = np.stack([b[0] for b in boxes] + [np.zeros(3)])
    his = np.stack([b[1] for b in boxes] + [in_shape.astype(np.float64) - 1])
    off = np.floor(los.min(axis=0)).astype(int)  # common index = coord - off
    size = (np.ceil(his.max(axis=0)).astype(int) - off) + 2
    frame_shape = tuple(int(s) for s in size)

    # Embed the input volume into the common frame (integer pad, exact).
    # Edge replication keeps near-boundary passes blending with real data
    # instead of fill; the exact domain mask at the end restores scipy's
    # constant fill everywhere outside.
    pad = [(int(-off[ax]), int(size[ax] - in_shape[ax] + off[ax])) for ax in range(3)]
    data = jnp.pad(volume.astype(jnp.float32), pad, mode="edge")

    for r, o, cr, co, tau in passes:
        # True coords: c_in[r] = cr*p[r] + co*p[o] + tau; common indices add off
        tau_eff = cr * off[r] + (co * off[o] if o != r else 0.0) + tau - off[r]
        data = _apply_pass(
            data, int(r), int(o), float(cr), float(co), float(tau_eff),
            frame_shape, float(fill), bool(o == r or co == 0.0),
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

"""Affine volume warping: the one kernel behind deskew, register, and stabilize.

The reference reaches for three different native resamplers — MONAI/torch
``grid_sample`` (reference: biahub/deskew.py:430-544), ANTs ``apply_to_image``
(reference: biahub/register.py:205-284), and scipy ``affine_transform``
(reference: biahub/core/transform.py:374-396). Here there is exactly one
convention: a homogeneous 4x4 matrix maps OUTPUT (z, y, x) index coordinates
to INPUT index coordinates, matching ``scipy.ndimage.affine_transform``'s
``matrix``/``offset`` semantics with order=1 (trilinear) and constant fill.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "affine_warp_zyx",
    "affine_warp_auto",
    "inplane_affine_warp_zyx",
    "inplane_affine_warp_zyx_pallas",
    "translation_warp_zyx",
    "is_translation_matrix",
    "is_inplane_matrix",
    "matrix_4x4",
    "rotation_matrix_zyx",
    "scale_matrix_zyx",
    "flip_matrix_zyx",
]


def matrix_4x4(matrix=None) -> np.ndarray:
    """Coerce None / 3x3 / 4x4 input into a homogeneous 4x4 float matrix."""
    if matrix is None:
        return np.eye(4)
    m = np.asarray(matrix, dtype=np.float64)
    if m.shape == (4, 4):
        return m
    if m.shape == (3, 3):
        out = np.eye(4)
        out[:3, :3] = m
        return out
    raise ValueError(f"Expected a 3x3 or 4x4 matrix, got shape {m.shape}")


def rotation_matrix_zyx(angle_deg: float, axis: int = 0, center=None) -> np.ndarray:
    """Rotation about one of the z/y/x axes, optionally about a center point."""
    theta = np.deg2rad(angle_deg)
    c, s = np.cos(theta), np.sin(theta)
    rot3 = np.eye(3)
    other = [i for i in range(3) if i != axis]
    rot3[other[0], other[0]] = c
    rot3[other[0], other[1]] = -s
    rot3[other[1], other[0]] = s
    rot3[other[1], other[1]] = c
    out = np.eye(4)
    out[:3, :3] = rot3
    if center is not None:
        center = np.asarray(center, dtype=np.float64)
        out[:3, 3] = center - rot3 @ center
    return out


def scale_matrix_zyx(scale) -> np.ndarray:
    out = np.eye(4)
    out[:3, :3] = np.diag(np.asarray(scale, dtype=np.float64))
    return out


def flip_matrix_zyx(shape, flip=(False, False, False)) -> np.ndarray:
    """Matrix flipping selected axes of a volume of the given shape in-place."""
    out = np.eye(4)
    for ax, (do_flip, size) in enumerate(zip(flip, shape)):
        if do_flip:
            out[ax, ax] = -1.0
            out[ax, 3] = size - 1
    return out


@partial(jax.jit, static_argnames=("output_shape", "order", "boundary"))
def affine_warp_zyx(
    volume: jax.Array,
    matrix: jax.Array,
    output_shape: tuple[int, int, int],
    fill: float = 0.0,
    order: int = 1,
    boundary: str = "constant",
) -> jax.Array:
    """Warp a ZYX volume by a homogeneous output→input affine matrix.

    out[z, y, x] = volume[M @ (z, y, x, 1)] with trilinear interpolation
    (order=1) or nearest neighbor (order=0).

    boundary="constant" fills any sample whose coordinate falls outside the
    input domain entirely with ``fill`` — matching
    scipy.ndimage.affine_transform(volume, M[:3, :3], M[:3, 3], order=order,
    mode="constant", cval=fill) to float32 tolerance.
    boundary="blend" instead blends out-of-range interpolation corners toward
    ``fill`` (torch grid_sample padding_mode="zeros" semantics).
    """
    Zi, Yi, Xi = volume.shape
    Zo, Yo, Xo = output_shape
    matrix = jnp.asarray(matrix, dtype=jnp.float32)

    # Input coordinates for every output voxel, built by broadcasting the three
    # 1D index ramps against the matrix columns — never materializes a
    # (3, Zo, Yo, Xo) coordinate tensor as an explicit stack.
    zo = jnp.arange(Zo, dtype=jnp.float32)[:, None, None]
    yo = jnp.arange(Yo, dtype=jnp.float32)[None, :, None]
    xo = jnp.arange(Xo, dtype=jnp.float32)[None, None, :]

    def in_coord(axis):
        return (
            matrix[axis, 0] * zo
            + matrix[axis, 1] * yo
            + matrix[axis, 2] * xo
            + matrix[axis, 3]
        )

    zi, yi, xi = in_coord(0), in_coord(1), in_coord(2)

    fillv = jnp.asarray(fill, volume.dtype)

    if order == 0:
        zn = jnp.round(zi).astype(jnp.int32)
        yn = jnp.round(yi).astype(jnp.int32)
        xn = jnp.round(xi).astype(jnp.int32)
        # scipy mode="constant" applies the whole-sample domain rule to
        # order=0 too: a coordinate outside [0, size-1] is cval even when it
        # rounds to an in-bounds index.
        valid = (
            (zi >= 0) & (zi <= Zi - 1)
            & (yi >= 0) & (yi <= Yi - 1)
            & (xi >= 0) & (xi <= Xi - 1)
        )
        sample = volume[
            jnp.clip(zn, 0, Zi - 1), jnp.clip(yn, 0, Yi - 1), jnp.clip(xn, 0, Xi - 1)
        ]
        return jnp.where(valid, sample, fillv)

    z0 = jnp.floor(zi)
    y0 = jnp.floor(yi)
    x0 = jnp.floor(xi)
    fz = (zi - z0).astype(volume.dtype)
    fy = (yi - y0).astype(volume.dtype)
    fx = (xi - x0).astype(volume.dtype)
    z0 = z0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def corner(dz, dy, dx):
        zc = jnp.clip(z0 + dz, 0, Zi - 1)
        yc = jnp.clip(y0 + dy, 0, Yi - 1)
        xc = jnp.clip(x0 + dx, 0, Xi - 1)
        val = volume[zc, yc, xc]
        if boundary == "blend":
            valid = (
                (z0 + dz >= 0)
                & (z0 + dz < Zi)
                & (y0 + dy >= 0)
                & (y0 + dy < Yi)
                & (x0 + dx >= 0)
                & (x0 + dx < Xi)
            )
            val = jnp.where(valid, val, fillv)
        return val

    wz = (1.0 - fz, fz)
    wy = (1.0 - fy, fy)
    wx = (1.0 - fx, fx)
    out = jnp.zeros((Zo, Yo, Xo), dtype=volume.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                out = out + wz[dz] * wy[dy] * wx[dx] * corner(dz, dy, dx)

    if boundary == "constant":
        # scipy mode="constant": a sample whose coordinate lies outside the
        # input domain is cval entirely, with no partial corner blending.
        in_domain = (
            (zi >= 0)
            & (zi <= Zi - 1)
            & (yi >= 0)
            & (yi <= Yi - 1)
            & (xi >= 0)
            & (xi <= Xi - 1)
        )
        out = jnp.where(in_domain, out, fillv)
    return out


def is_translation_matrix(matrix, atol: float = 1e-9) -> bool:
    """True when the (concrete) matrix is identity-linear: a pure translation."""
    m = np.asarray(matrix, dtype=np.float64)
    return bool(np.allclose(m[:3, :3], np.eye(3), atol=atol))


def is_inplane_matrix(matrix, atol: float = 1e-9) -> bool:
    """True when z decouples from (y, x) and the in-plane map is factorable.

    Structure: z row (mzz, 0, 0); y/x rows have no z coefficient; the in-plane
    2x2 has a nonzero xx entry (the x-pass pivot).
    """
    m = np.asarray(matrix, dtype=np.float64)
    return bool(
        np.allclose([m[0, 1], m[0, 2], m[1, 0], m[2, 0]], 0.0, atol=atol)
        and abs(m[2, 2]) > atol
        and abs(m[0, 0]) > atol
    )


def _lerp_axis0(
    data: jax.Array, coords: jax.Array, fill: float, clamp: bool = False
) -> jax.Array:
    """Resample axis 0 of ``data`` at fractional ``coords``.

    ``coords`` has the output shape of the leading axes being gathered over;
    it must be broadcastable to data.shape with the gather axis replaced, and
    crucially must be CONSTANT along the lane (last) axis — that keeps the
    take_along_axis a fast row gather on TPU (see kernels/deskew.py).

    clamp=True extends edge values instead of filling out-of-range samples —
    used by multi-pass warps whose intermediate stages must not inject fill
    near the boundary (the caller applies the exact domain mask at the end).
    """
    size_in = data.shape[0]
    i0 = jnp.floor(coords)
    frac = coords - i0
    i0 = i0.astype(jnp.int32)
    idx0 = jnp.clip(i0, 0, size_in - 1)
    idx1 = jnp.clip(i0 + 1, 0, size_in - 1)

    v0 = jnp.take_along_axis(data, idx0, axis=0)
    v1 = jnp.take_along_axis(data, idx1, axis=0)
    out = v0 * (1 - frac).astype(data.dtype) + v1 * frac.astype(data.dtype)
    if clamp:
        return out
    in_domain = (coords >= 0) & (coords <= size_in - 1)
    return jnp.where(in_domain, out, jnp.asarray(fill, data.dtype))


def _exact_domain_mask(out, matrix, in_shape, out_shape, fill):
    """Enforce scipy's whole-sample constant fill from the ORIGINAL matrix.

    Pure broadcast arithmetic (no gather): an output voxel whose exact input
    coordinate falls outside the input domain becomes ``fill``, exactly as
    scipy.ndimage.affine_transform(mode="constant") does. Multi-pass warps
    call this once at the end instead of filling per pass, which would carve
    a staircase into the boundary.
    """
    zo = jnp.arange(out_shape[0], dtype=jnp.float32)[:, None, None]
    yo = jnp.arange(out_shape[1], dtype=jnp.float32)[None, :, None]
    xo = jnp.arange(out_shape[2], dtype=jnp.float32)[None, None, :]
    inside = None
    for ax in range(3):
        c = matrix[ax, 0] * zo + matrix[ax, 1] * yo + matrix[ax, 2] * xo + matrix[ax, 3]
        ok = (c >= 0) & (c <= in_shape[ax] - 1)
        inside = ok if inside is None else inside & ok
    return jnp.where(inside, out, jnp.asarray(fill, out.dtype))


@partial(jax.jit, static_argnames=("output_shape",))
def inplane_affine_warp_zyx(
    volume: jax.Array,
    matrix: jax.Array,
    output_shape: tuple[int, int, int],
    fill: float = 0.0,
) -> jax.Array:
    """Warp by a z-decoupled affine as three fast-pattern 1D resamples.

    Requires the structure checked by :func:`is_inplane_matrix` (the caller
    dispatches). Factorization: the in-plane 2x2 [[myy, myx], [mxy, mxx]]
    splits into a y-pass (yi = b0*yo + b1*x + b2) followed by an x-pass
    (xi = mxx*xo + mxy*yo + tx); each pass gathers along the leading axis of
    a layout whose lane axis the index does not depend on, avoiding TPU's
    slow elementwise lane gathers (~7.7 s vs ~40 ms per mantis volume).

    The multi-pass composition applies linear interpolation per pass, which
    smooths slightly more than a single-pass trilinear sample; parity with
    scipy is to interpolation tolerance rather than float epsilon.
    """
    Zo, Yo, Xo = output_shape
    matrix = jnp.asarray(matrix, dtype=jnp.float32)
    volume = volume.astype(jnp.float32)

    # z-pass: zi = mzz * zo + tz, broadcast over (Y, X). All passes clamp to
    # edge values; the exact domain mask at the end restores constant fill.
    zo = jnp.arange(Zo, dtype=jnp.float32)[:, None, None]
    zi = matrix[0, 0] * zo + matrix[0, 3]
    a = _lerp_axis0(volume, zi, fill, clamp=True)  # (Zo, Yi, Xi)

    # In-plane factorization (see docstring); traced-safe arithmetic.
    myy, myx, ty = matrix[1, 1], matrix[1, 2], matrix[1, 3]
    mxy, mxx, tx = matrix[2, 1], matrix[2, 2], matrix[2, 3]
    b1 = myx / mxx
    b0 = myy - b1 * mxy
    b2 = ty - b1 * tx

    # y-pass in (Y, X, Z) layout: idx varies over (yo, x), constant over lanes z
    a_t = jnp.transpose(a, (1, 2, 0))  # (Yi, Xi, Zo)
    yo_idx = jnp.arange(Yo, dtype=jnp.float32)[:, None, None]
    x_idx = jnp.arange(a_t.shape[1], dtype=jnp.float32)[None, :, None]
    yi = b0 * yo_idx + b1 * x_idx + b2
    yi = jnp.broadcast_to(yi, (Yo, a_t.shape[1], 1))
    b = _lerp_axis0(a_t, yi, fill, clamp=True)  # (Yo, Xi, Zo)

    # x-pass in (X, Y, Z) layout: idx varies over (xo, yo), constant over lanes z
    b_t = jnp.transpose(b, (1, 0, 2))  # (Xi, Yo, Zo)
    xo_idx = jnp.arange(Xo, dtype=jnp.float32)[:, None, None]
    yo2 = jnp.arange(Yo, dtype=jnp.float32)[None, :, None]
    xi = mxx * xo_idx + mxy * yo2 + tx
    xi = jnp.broadcast_to(xi, (Xo, Yo, 1))
    c = _lerp_axis0(b_t, xi, fill, clamp=True)  # (Xo, Yo, Zo)

    out = jnp.transpose(c, (2, 1, 0))
    return _exact_domain_mask(out, matrix, volume.shape, output_shape, fill)


def inplane_affine_warp_zyx_pallas(
    volume: jax.Array,
    matrix,
    output_shape: tuple[int, int, int],
    fill: float = 0.0,
    input_xzy: bool = False,
    logical_zyx_shape: tuple[int, int, int] | None = None,
) -> jax.Array:
    """In-plane warp via the fused MXU shear-resample kernels (concrete matrix).

    Same factorization as :func:`inplane_affine_warp_zyx`, but the z- and
    y-passes FUSE into one two-axis kernel (kernels/pallas_resample.py::
    shear_resample2_pallas — z decouples, so E_z commutes with E_y/E_x and
    the pass coefficients are unchanged), saving one full-volume HBM round
    trip; and of the three remaining layout changes only the first moves the
    lane axis (the other two permute major axes — ~2x cheaper copies).

    ``logical_zyx_shape``: the input's LOGICAL (Z, Y, X) extent when the
    physical array carries trailing ZERO padding (the spectral chain's
    (X', Z'_pad, Y') handoff pads the z axis to the kernel's store-block
    width). The exact domain mask uses the logical extent, so coordinates
    landing in the pad become ``fill`` exactly as they would on the
    unpadded volume; in-domain samples never touch the pad (interior lerp
    windows stop at the last logical slice).
    """
    from biahub_tpu.kernels.pallas_resample import shear_resample2_pallas_t

    Zo, Yo, Xo = output_shape
    m = np.asarray(matrix, dtype=np.float64)
    mzz, tz = m[0, 0], m[0, 3]
    myy, myx, ty = m[1, 1], m[1, 2], m[1, 3]
    mxy, mxx, tx = m[2, 1], m[2, 2], m[2, 3]
    b1 = myx / mxx
    b0 = myy - b1 * mxy
    b2 = ty - b1 * tx

    v = volume.astype(jnp.float32)
    if logical_zyx_shape is not None:
        in_zyx_shape = tuple(int(s) for s in logical_zyx_shape)
    elif input_xzy:
        in_zyx_shape = (volume.shape[1], volume.shape[2], volume.shape[0])
    else:
        in_zyx_shape = tuple(volume.shape)
    # Fused z+y pass in (Xi, Zi, Yi): sublane axis resamples z
    # (zi = mzz*zo + tz), lane axis resamples y (yi = b0*yo + b1*x + b2,
    # x being the o/grid axis — still the pre-resample x, as in the 3-pass
    # form where the y-pass preceded the x-pass). The transposed-output
    # variant writes (Yo, Xi, Zo) blocks natively — the x-pass's input
    # layout — so no full-volume transpose sits between the two kernels.
    # ``input_xzy``: the caller (fused chain, kernels/chain.py) already
    # provides the (Xi, Zi, Yi) layout — e.g. deskew's transposed-output
    # kernel — so even this first transpose disappears.
    d = v if input_xzy else jnp.transpose(v, (2, 0, 1))  # (Xi, Zi, Yi)
    d = shear_resample2_pallas_t(
        d, Zo, Yo,
        (float(mzz), 0.0, float(tz)),
        (float(b0), float(b1), float(b2)),
        order=1,
    )  # (Yo, Xi, Zo)
    # x-pass in (Yo, Xi, Zo): xi = mxx*xo + mxy*yo + tx. The exact domain
    # mask of the ORIGINAL matrix rides inside this final pass: its output
    # element (o=yo, t=zo, r=xo) has input coord i = M[i,1]*o + M[i,0]*t +
    # M[i,2]*r + M[i,3] — skipping _exact_domain_mask's own volume pass.
    a_flat = tuple(
        float(c)
        for i in range(3)
        for c in (m[i, 1], m[i, 0], m[i, 2], m[i, 3])
    )
    # Transposed-output final pass: emits (Zo, Yo, Xo) directly, killing the
    # chain's last full-volume transpose (falls back internally when no
    # static window plan fits).
    from biahub_tpu.kernels.pallas_resample import shear_resample_pallas_t

    return shear_resample_pallas_t(
        d, Xo, float(mxx), float(mxy), float(tx), order=1,
        mask=(a_flat, tuple(int(s) for s in in_zyx_shape), float(fill)),
    )  # (Zo, Yo, Xo)


def inplane_affine_warp_zyx_pallas_batched(
    volumes: jax.Array,
    matrix,
    output_shape: tuple[int, int, int],
    fill: float = 0.0,
    input_xzy: bool = False,
    logical_zyx_shape: tuple[int, int, int] | None = None,
) -> jax.Array:
    """Batched :func:`inplane_affine_warp_zyx_pallas` — bit-identical to
    vmapping it, with both fused passes run through the manually
    double-buffered batched kernels (pallas_resample.py
    ``shear_resample*_pallas_t_batched``): their o8-block DMA chains
    overlap the banded MXU dots that the automatic kernels serialize
    (measured at the no-overlap bound; scripts/probe_deskew_overlap.py
    methodology). Each pass falls back internally to the vmapped automatic
    kernel when its gates fail, so the composition is always valid.
    Single-device batches only (the batch grid axis cannot be
    SPMD-partitioned)."""
    from biahub_tpu.kernels.pallas_resample import (
        shear_resample2_pallas_t_batched,
        shear_resample_pallas_t_batched,
    )

    Zo, Yo, Xo = output_shape
    m = np.asarray(matrix, dtype=np.float64)
    mzz, tz = m[0, 0], m[0, 3]
    myy, myx, ty = m[1, 1], m[1, 2], m[1, 3]
    mxy, mxx, tx = m[2, 1], m[2, 2], m[2, 3]
    b1 = myx / mxx
    b0 = myy - b1 * mxy
    b2 = ty - b1 * tx

    v = volumes.astype(jnp.float32)
    if logical_zyx_shape is not None:
        in_zyx_shape = tuple(int(s) for s in logical_zyx_shape)
    elif input_xzy:
        in_zyx_shape = (volumes.shape[2], volumes.shape[3], volumes.shape[1])
    else:
        in_zyx_shape = tuple(int(s) for s in volumes.shape[1:])
    d = v if input_xzy else jnp.transpose(v, (0, 3, 1, 2))  # (B, Xi, Zi, Yi)
    d = shear_resample2_pallas_t_batched(
        d, Zo, Yo,
        (float(mzz), 0.0, float(tz)),
        (float(b0), float(b1), float(b2)),
        order=1,
    )  # (B, Yo, Xi, Zo)
    a_flat = tuple(
        float(c)
        for i in range(3)
        for c in (m[i, 1], m[i, 0], m[i, 2], m[i, 3])
    )
    return shear_resample_pallas_t_batched(
        d, Xo, float(mxx), float(mxy), float(tx), order=1,
        mask=(a_flat, in_zyx_shape, float(fill)),
    )  # (B, Zo, Yo, Xo)


def make_batched_inplane_kernel(
    matrices,
    in_shape: tuple[int, int, int],
    out_shape: tuple[int, int, int],
    fill: float = 0.0,
):
    """One compiled in-plane warp serving a batch of z-decoupled affines.

    Mirrors multipass_warp.make_batched_multipass_kernel for the in-plane
    case: per-matrix pass coefficients ((mzz, 0, tz), (b0, b1, b2),
    (mxx, mxy, tx)) ride as a traced (3, 3) parameter through the
    SMEM-coefficient Pallas resample kernel on TPU, with static window bounds
    from the concrete batch; CPU and BIAHUB_TPU_NO_PALLAS fall back to the
    XLA formulation. Returns (kernel, params) with kernel(zyx, matrix, ip).
    """
    mats = [np.asarray(m, dtype=np.float64) for m in matrices]
    params = np.zeros((len(mats), 3, 3), dtype=np.float32)
    for i, m in enumerate(mats):
        b1 = m[1, 2] / m[2, 2]
        params[i, 0] = (m[0, 0], 0.0, m[0, 3])
        params[i, 1] = (m[1, 1] - b1 * m[2, 1], b1, m[1, 3] - b1 * m[2, 3])
        params[i, 2] = (m[2, 2], m[2, 1], m[2, 3])

    k_bounds = [
        int(np.ceil(128 * max(abs(p[ax, 0]) for p in params))) + 2
        for ax in range(3)
    ]
    in_shape = tuple(int(s) for s in in_shape)
    out_shape = tuple(int(s) for s in out_shape)

    # Static slab windows covering EVERY matrix in the batch (the matrix list
    # is concrete here even though each kernel call traces its coefficients):
    # y rides as the fused kernel's pass-2/lane axis over o = x, x as the
    # final pass's resampled axis over o = y_out.
    from biahub_tpu.kernels.pallas_resample import _k_window, static_window_plan

    y_window = static_window_plan(
        [tuple(float(c) for c in p[1]) for p in params],
        in_shape[2], out_shape[1], in_shape[1], order=1,
        k_dyn=_k_window(k_bounds[1], in_shape[1]),
    )
    x_window = static_window_plan(
        [tuple(float(c) for c in p[2]) for p in params],
        out_shape[1], out_shape[2], in_shape[2], order=1,
        k_dyn=_k_window(k_bounds[2], in_shape[2]),
    )

    def kernel(zyx, matrix, ip):
        use_pallas = (
            jax.default_backend() == "tpu"
            or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
        ) and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
        if not use_pallas:
            return inplane_affine_warp_zyx(zyx, matrix, out_shape, fill=fill)

        from biahub_tpu.kernels.pallas_resample import (
            shear_resample2_pallas_dyn,
            shear_resample2_pallas_t_dyn,
            shear_resample_pallas_dyn,
            shear_resample_pallas_t_dyn,
        )

        # Fused z+y pass, then the x-pass — same layout chain as
        # inplane_affine_warp_zyx_pallas, with traced per-matrix coeffs.
        # With static windows available, both kernels emit their consumer's
        # layout natively (no inter-pass or final transposes).
        d = jnp.transpose(zyx.astype(jnp.float32), (2, 0, 1))  # (Xi, Zi, Yi)
        if y_window is not None:
            d = shear_resample2_pallas_t_dyn(
                d, out_shape[0], out_shape[1],
                jnp.concatenate([ip[0], ip[1]]),
                k_bounds[0], y_window, order=1,
            )  # (Yo, Xi, Zo) directly
        else:
            d = shear_resample2_pallas_dyn(
                d, out_shape[0], out_shape[1],
                jnp.concatenate([ip[0], ip[1]]),
                k_bounds[0], k_bounds[1], order=1,
            )  # (Xi, Yo, Zo)
            d = jnp.transpose(d, (1, 0, 2))  # (Yo, Xi, Zo)
        if x_window is not None:
            out = shear_resample_pallas_t_dyn(
                d, out_shape[2], ip[2], x_window, order=1
            )  # (Zo, Yo, Xo) directly — no final transpose
        else:
            d = shear_resample_pallas_dyn(d, out_shape[2], ip[2], k_bounds[2],
                                          order=1)
            out = jnp.transpose(d, (1, 0, 2))  # (Zo, Yo, Xo)
        return _exact_domain_mask(out, matrix, in_shape, out_shape, float(fill))

    return kernel, params


def affine_warp_auto(
    volume: jax.Array,
    matrix,
    output_shape: tuple[int, int, int],
    fill: float = 0.0,
    order: int = 1,
    input_xzy: bool = False,
) -> jax.Array:
    """Warp with the fastest TPU-safe kernel for the (concrete) matrix.

    Dispatch: pure translation → separable translation warp; z-decoupled
    in-plane affine → three-pass warp; anything else → the exact 8-corner
    gather (slow on TPU; emit a hint). ``matrix`` must be a concrete array.

    ``input_xzy``: ``volume`` arrives as (X, Z, Y) of the logical (Z, Y, X)
    volume (the fused chain's deskew emits this layout natively); the
    in-plane Pallas path consumes it with no transpose at all, every other
    path un-transposes first.
    """
    matrix = np.asarray(matrix, dtype=np.float64)
    if input_xzy and order == 1 and is_inplane_matrix(matrix) and (
        (
            jax.default_backend() == "tpu"
            or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
        )
        and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
    ):
        return inplane_affine_warp_zyx_pallas(
            volume, matrix, tuple(output_shape), fill=fill, input_xzy=True
        )
    if input_xzy:
        volume = jnp.transpose(volume, (1, 2, 0))  # back to (Z, Y, X)
    if order == 1 and is_translation_matrix(matrix):
        # Bounds quantized to 8-voxel bins: window starts are 8-aligned
        # anyway, so this costs nothing, and per-timepoint translations that
        # differ by < 8 voxels share ONE compiled program instead of paying
        # a remote recompile per distinct shift vector.
        shifts = tuple(
            (float(np.floor(s / 8.0) * 8.0), float(np.floor(s / 8.0) * 8.0 + 8.0))
            for s in matrix[:3, 3]
        )
        return translation_warp_zyx(
            volume, jnp.asarray(matrix[:3, 3], dtype=jnp.float32), tuple(output_shape),
            fill=fill, shift_bounds=shifts,
        )
    if order == 1 and is_inplane_matrix(matrix):
        if (
            jax.default_backend() == "tpu"
            or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
        ) and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1":
            return inplane_affine_warp_zyx_pallas(
                volume, matrix, tuple(output_shape), fill=fill
            )
        return inplane_affine_warp_zyx(
            volume, jnp.asarray(matrix, dtype=jnp.float32), tuple(output_shape),
            fill=fill,
        )
    if (
        order == 1
        and jax.default_backend() == "tpu"
        and os.environ.get("BIAHUB_TPU_EXACT_WARP") != "1"
    ):
        # General 3D affine: factored elementary passes (~80x faster than the
        # exact elementwise gather on TPU; interpolation-tolerance parity).
        from biahub_tpu.kernels.multipass_warp import multipass_affine_warp_zyx

        try:
            return multipass_affine_warp_zyx(
                volume, matrix, tuple(output_shape), fill=fill
            )
        except ValueError:
            pass  # singular/zero-pivot matrices fall through to the gather
    return affine_warp_zyx(volume, jnp.asarray(matrix, dtype=jnp.float32),
                           tuple(output_shape), fill=fill, order=order)


@partial(jax.jit, static_argnames=("output_shape", "shift_bounds"))
def translation_warp_zyx(
    volume: jax.Array,
    shift_zyx: jax.Array,
    output_shape: tuple[int, int, int] | None = None,
    fill: float = 0.0,
    shift_bounds=None,
) -> jax.Array:
    """Pure-translation fast path: separable 1D linear interpolation per axis.

    ``shift_zyx`` follows the affine convention above: input_coord = output
    coord + shift. Three take_along_axis gathers instead of an 8-corner
    trilinear gather — ~2.7x less memory traffic for stabilization stacks
    where the per-timepoint transform is translation-only.

    ``shift_bounds`` (static): optional per-axis ``((lo, hi), ...)`` bounds on
    the traced shift — callers with the concrete shift list (the batched
    stabilize dispatch) pass them so the Pallas passes run static slab
    windows (pallas_resample.static_window_plan) instead of dynamic VMEM
    slices.
    """
    out_shape = output_shape or volume.shape
    shift = jnp.asarray(shift_zyx, dtype=jnp.float32)

    if (
        (
            jax.default_backend() == "tpu"
            or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
        )
        and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
        and isinstance(fill, (int, float))
        and float(fill) == 0.0
    ):
        # Shifts may be traced (per-timepoint stabilize parameters), so the
        # passes run the SMEM-coefficient kernels; mask_oob reproduces the
        # per-axis whole-sample fill (fill = 0 only). z+y fuse into the
        # two-axis kernel — one HBM round trip fewer than three passes.
        from biahub_tpu.kernels.pallas_resample import (
            shear_resample2_pallas_dyn,
            shear_resample2_pallas_t_dyn,
            shear_resample_pallas_dyn,
            static_window_plan,
        )

        def axis_window(ax, o_size, r_out, axis_in):
            if shift_bounds is None:
                return None
            lo, hi = shift_bounds[ax]
            return static_window_plan(
                [(1.0, 0.0, float(lo)), (1.0, 0.0, float(hi))],
                o_size, r_out, axis_in, order=1, k_dyn=136,
            )

        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        kb = 128 + 2
        Zi, Yi, Xi = volume.shape
        d = jnp.transpose(volume.astype(jnp.float32), (2, 0, 1))  # (Xi, Zi, Yi)
        y_win = axis_window(1, Xi, out_shape[1], Yi)
        if y_win is not None:
            d = shear_resample2_pallas_t_dyn(
                d, out_shape[0], out_shape[1],
                jnp.stack([one, zero, shift[0], one, zero, shift[1]]),
                kb, y_win, order=1, mask_oob=True,
            )  # (Yo, Xi, Zo) directly
        else:
            d = shear_resample2_pallas_dyn(
                d, out_shape[0], out_shape[1],
                jnp.stack([one, zero, shift[0], one, zero, shift[1]]),
                kb, kb, order=1, mask_oob=True,
            )  # (Xi, Yo, Zo)
            d = jnp.transpose(d, (1, 0, 2))  # (Yo, Xi, Zo)
        x_win = axis_window(2, out_shape[1], out_shape[2], Xi)
        if x_win is not None:
            from biahub_tpu.kernels.pallas_resample import (
                shear_resample_pallas_t_dyn,
            )

            return shear_resample_pallas_t_dyn(
                d, out_shape[2], jnp.stack([one, zero, shift[2]]), x_win,
                order=1, mask_oob=True,
            )  # (Zo, Yo, Xo) directly
        d = shear_resample_pallas_dyn(
            d, out_shape[2],
            jnp.stack([one, zero, shift[2]]),
            kb, order=1, mask_oob=True,
        )  # (Yo, Zo, Xo)
        return jnp.transpose(d, (1, 0, 2))  # (Zo, Yo, Xo)

    def resample_axis(data, axis, size_out, delta):
        size_in = data.shape[axis]
        coords = jnp.arange(size_out, dtype=jnp.float32) + delta
        i0 = jnp.floor(coords)
        frac = coords - i0
        i0 = i0.astype(jnp.int32)
        in_domain = (coords >= 0) & (coords <= size_in - 1)
        idx0 = jnp.clip(i0, 0, size_in - 1)
        idx1 = jnp.clip(i0 + 1, 0, size_in - 1)
        shape = [1] * data.ndim
        shape[axis] = size_out
        idx0 = idx0.reshape(shape)
        idx1 = idx1.reshape(shape)
        v0 = jnp.take_along_axis(data, idx0, axis=axis)
        v1 = jnp.take_along_axis(data, idx1, axis=axis)
        frac = frac.reshape(shape).astype(data.dtype)
        fillv = jnp.asarray(fill, data.dtype)
        out = v0 * (1 - frac) + v1 * frac
        # scipy mode="constant" semantics: out-of-domain samples are fill.
        return jnp.where(in_domain.reshape(shape), out, fillv)

    out = volume
    for axis in range(3):
        out = resample_axis(out, axis, out_shape[axis], shift[axis])
    return out

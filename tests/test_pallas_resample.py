"""Direct tests of the Pallas shear-resample primitives (interpret mode on
CPU) against a numpy reference of the pass semantics."""

import numpy as np
import pytest

from biahub_tpu.kernels.pallas_resample import (
    shear_resample_pallas,
    shear_resample_pallas_dyn,
)


def _reference_pass(d, r_out, cr, co, tau, order, mask_oob=False):
    """Numpy reference: resample axis 1 of (O, R, T) at cr*r + co*o + tau,
    bands edge-clamped to the array (matching the kernel's window clamp when
    the window spans the whole axis)."""
    O, R_in, T = d.shape
    out = np.zeros((O, T, r_out), np.float32)
    for o in range(O):
        for q in range(r_out):
            c = cr * q + co * o + tau
            i0 = int(np.floor(c))
            t = c - i0
            if order == 1:
                bands = ((0, 1.0 - t), (1, t))
            else:
                bands = (
                    (-1, -0.5 * t**3 + t**2 - 0.5 * t),
                    (0, 1.5 * t**3 - 2.5 * t**2 + 1.0),
                    (1, -1.5 * t**3 + 2.0 * t**2 + 0.5 * t),
                    (2, 0.5 * t**3 - 0.5 * t**2),
                )
            acc = 0.0
            for k, w in bands:
                acc += w * d[o, int(np.clip(i0 + k, 0, R_in - 1)), :]
            if mask_oob and not (0 <= c <= R_in - 1):
                acc = np.zeros(T, np.float32)
            out[o, :, q] = acc
    return out


@pytest.mark.parametrize("order", [1, 3])
@pytest.mark.parametrize(
    "cr,co,tau",
    # avoid rational lattices where cr*q+co*o+tau hits exact integers
    # (floor knife-edges flip bands at f32 epsilon)
    [(1.0, 0.131, -2.21), (1.051, -0.083, 1.37), (1.0, 0.0, 2.51)],
)
def test_static_kernel_matches_reference(order, cr, co, tau):
    rng = np.random.default_rng(0)
    d = rng.random((6, 40, 16)).astype(np.float32)
    out = np.asarray(shear_resample_pallas(d, 40, cr, co, tau, order=order))
    ref = _reference_pass(d, 40, cr, co, tau, order)
    # Interior rows: the window covers every band (small axes clamp at edges)
    valid = np.abs(out - ref) < 1e-4
    assert valid.mean() > 0.97
    np.testing.assert_allclose(out[:, :, 4:-4], ref[:, :, 4:-4], atol=1e-4)


def test_dyn_kernel_matches_static():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    d = rng.random((4, 32, 8)).astype(np.float32)
    cr, co, tau = 1.02, -0.11, 0.7
    a = np.asarray(shear_resample_pallas(d, 32, cr, co, tau))
    b = np.asarray(
        shear_resample_pallas_dyn(d, 32, jnp.array([cr, co, tau]), 135)
    )
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_dyn_kernel_mask_oob():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    d = rng.random((3, 24, 8)).astype(np.float32)
    shift = 5.3
    out = np.asarray(
        shear_resample_pallas_dyn(
            d, 24, jnp.array([1.0, 0.0, shift]), 130, order=1, mask_oob=True
        )
    )
    ref = _reference_pass(d, 24, 1.0, 0.0, shift, 1, mask_oob=True)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # Out-of-domain outputs are exactly zero
    assert np.abs(out[:, :, -5:]).max() == 0.0


def test_high_precision_mode_tolerance(monkeypatch):
    """The production-default 'high' warp precision (3-term bf16-split dots)
    stays within ~1e-4 relative of the f32-mantissa mode — far below the
    multipass chain's own interpolation tolerance."""
    import jax

    from biahub_tpu.kernels.pallas_resample import shear_resample_pallas

    rng = np.random.default_rng(31)
    import jax.numpy as jnp

    data = jnp.asarray(rng.standard_normal((6, 64, 40), dtype=np.float32))

    monkeypatch.setenv("BIAHUB_TPU_WARP_PRECISION", "highest")
    jax.clear_caches()
    exact = np.asarray(shear_resample_pallas(data, 64, 0.93, 0.02, 1.7))
    monkeypatch.setenv("BIAHUB_TPU_WARP_PRECISION", "high")
    jax.clear_caches()
    fast = np.asarray(shear_resample_pallas(data, 64, 0.93, 0.02, 1.7))
    jax.clear_caches()  # don't leak 'high' traces into parity tests

    scale = np.abs(exact).max()
    assert np.abs(fast - exact).max() / scale < 2e-4
    # and it must NOT be bitwise identical (the fast path actually engaged)
    assert not np.array_equal(fast, exact)


@pytest.mark.parametrize("order", [1, 3])
@pytest.mark.parametrize("mask_oob", [False, True])
def test_fused_two_axis_matches_chained_single_passes(order, mask_oob):
    """shear_resample2_pallas == single R-pass then single T-pass.

    The fused kernel's contract: pass 1 resamples the sublane axis, pass 2
    the lane axis; composing the proven single-axis kernel twice (with the
    layout transposes the fused kernel eliminates) must agree to float
    tolerance on awkward (non-multiple-of-8/128) shapes.
    """
    from biahub_tpu.kernels.pallas_resample import shear_resample2_pallas

    rng = np.random.default_rng(7)
    data = rng.standard_normal((5, 37, 29)).astype(np.float32)
    r_out, t_out = 33, 26
    rc = (0.91, 0.05, 1.3)
    tc = (1.07, -0.03, -0.8)

    fused = np.asarray(
        shear_resample2_pallas(data, r_out, t_out, rc, tc, order=order,
                               mask_oob=mask_oob)
    )
    assert fused.shape == (5, t_out, r_out)

    # Chain of single passes: R-pass -> (O, T, R'); T is then axis 1, so a
    # second single pass resamples it -> (O, R', T'); transpose to match.
    p1 = shear_resample_pallas(data, r_out, *rc, order=order)
    if mask_oob:
        # Single kernel's mask_oob lives only in the dyn variant; emulate by
        # zeroing out-of-domain coords of each pass on the numpy side.
        p1 = np.array(p1)
        for o in range(data.shape[0]):
            for q in range(r_out):
                c = rc[0] * q + rc[1] * o + rc[2]
                if not (0 <= c <= data.shape[1] - 1):
                    p1[o, :, q] = 0.0
    p2 = np.array(shear_resample_pallas(np.asarray(p1), t_out, *tc, order=order))
    if mask_oob:
        for o in range(data.shape[0]):
            for q in range(t_out):
                c = tc[0] * q + tc[1] * o + tc[2]
                if not (0 <= c <= p1.shape[1] - 1):
                    p2[o, :, q] = 0.0
    ref = np.transpose(p2, (0, 2, 1))  # (O, t_out, r_out)
    np.testing.assert_allclose(fused, ref, atol=2e-5)


def test_fused_two_axis_dyn_matches_static():
    """The SMEM-coefficient fused kernel equals the static-coefficient one."""
    import jax.numpy as jnp

    from biahub_tpu.kernels.pallas_resample import (
        shear_resample2_pallas,
        shear_resample2_pallas_dyn,
    )

    rng = np.random.default_rng(11)
    data = rng.standard_normal((4, 24, 31)).astype(np.float32)
    rc = (1.02, 0.01, -0.7)
    tc = (0.94, 0.0, 2.1)
    static = np.asarray(
        shear_resample2_pallas(data, 22, 28, rc, tc, order=1, mask_oob=True)
    )
    dyn = np.asarray(
        shear_resample2_pallas_dyn(
            data, 22, 28, jnp.asarray(rc + tc), 132, 132, order=1, mask_oob=True
        )
    )
    np.testing.assert_allclose(dyn, static, atol=1e-6)


@pytest.mark.parametrize("order", [1, 3])
def test_static_window_plan_matches_dynamic(order):
    """Static slab windows must be bit-identical to the dynamic-start path,
    including where coords leave the frame (edge-clamp parity)."""
    import jax.numpy as jnp

    from biahub_tpu.kernels.pallas_resample import (
        shear_resample_pallas_dyn,
        shear_resample2_pallas_dyn,
        static_window_plan,
    )

    rng = np.random.default_rng(3)
    data = rng.standard_normal((6, 40, 33)).astype(np.float32)
    O, R_in, T_in = data.shape

    # Coeff sets straddling both frame edges (tau pushes coords out of frame).
    sets = [(0.97, 0.02, -2.5), (1.04, -0.01, 3.0)]
    kb = int(np.ceil(128 * 1.04)) + (2 if order == 1 else 4)
    for cs in sets:
        plan = static_window_plan([cs], O, 36, R_in, order)
        assert plan is not None
        dyn = np.asarray(
            shear_resample_pallas_dyn(
                data, 36, jnp.asarray(cs), kb, order=order, mask_oob=True
            )
        )
        stat = np.asarray(
            shear_resample_pallas_dyn(
                data, 36, jnp.asarray(cs), kb, order=order, mask_oob=True,
                window=plan,
            )
        )
        np.testing.assert_array_equal(stat, dyn)

    # Fused kernel: one static plan covering BOTH coefficient sets.
    t_sets = [(0.99, 0.03, -1.0), (1.01, 0.0, 2.0)]
    t_plan = static_window_plan(t_sets, O, 30, T_in, order)
    assert t_plan is not None
    for rs, ts in zip(sets, t_sets):
        coeffs = jnp.asarray(rs + ts)
        dyn = np.asarray(
            shear_resample2_pallas_dyn(
                data, 36, 30, coeffs, kb, kb, order=order, mask_oob=True
            )
        )
        stat = np.asarray(
            shear_resample2_pallas_dyn(
                data, 36, 30, coeffs, kb, kb, order=order, mask_oob=True,
                t_window=t_plan,
            )
        )
        np.testing.assert_allclose(stat, dyn, atol=1e-6)


@pytest.mark.parametrize("order", [1, 3])
def test_transposed_output_kernels_match_regular(order):
    """shear_resample_pallas_t(_dyn) == regular kernel + (1,0,2) transpose,
    on ragged shapes (O not a multiple of 8), with masks engaged."""
    import jax.numpy as jnp

    from biahub_tpu.kernels.pallas_resample import (
        shear_resample_pallas,
        shear_resample_pallas_dyn,
        shear_resample_pallas_t,
        shear_resample_pallas_t_dyn,
        static_window_plan,
    )

    rng = np.random.default_rng(5)
    data = rng.standard_normal((21, 35, 27)).astype(np.float32)  # ragged O
    O, R_in, T = data.shape
    cs = (0.98, 0.015, -1.4)
    r_out = 31

    ref = np.transpose(
        np.asarray(shear_resample_pallas(data, r_out, *cs, order=order)),
        (1, 0, 2),
    )
    got = np.asarray(shear_resample_pallas_t(data, r_out, *cs, order=order))
    np.testing.assert_array_equal(got, ref)

    plan = static_window_plan([cs], O, r_out, R_in, order)
    kb = int(np.ceil(128 * abs(cs[0]))) + (2 if order == 1 else 4)
    ref_d = np.transpose(
        np.asarray(
            shear_resample_pallas_dyn(
                data, r_out, jnp.asarray(cs), kb, order=order, mask_oob=True
            )
        ),
        (1, 0, 2),
    )
    got_d = np.asarray(
        shear_resample_pallas_t_dyn(
            data, r_out, jnp.asarray(cs), plan, order=order, mask_oob=True
        )
    )
    # The plan's window starts can differ from the per-program dynamic ones,
    # shifting bf16-split accumulation at the ~1e-6 level (within the 'high'
    # warp-precision tier's ~1e-5 contract).
    np.testing.assert_allclose(got_d, ref_d, atol=1e-5)


@pytest.mark.parametrize("order", [1, 3])
def test_transposed_fused_kernels_match_regular(order):
    """shear_resample2_pallas_t(_dyn) == regular fused kernel + transpose,
    on ragged O, with mask_oob."""
    import jax.numpy as jnp

    from biahub_tpu.kernels.pallas_resample import (
        shear_resample2_pallas,
        shear_resample2_pallas_dyn,
        shear_resample2_pallas_t,
        shear_resample2_pallas_t_dyn,
        static_window_plan,
    )

    rng = np.random.default_rng(9)
    data = rng.standard_normal((13, 26, 37)).astype(np.float32)  # ragged O
    O, R_in, T_in = data.shape
    rc = (0.95, 0.0, 0.8)
    tc = (1.03, 0.02, -1.1)
    r_out, t_out = 24, 33

    ref = np.transpose(
        np.asarray(
            shear_resample2_pallas(data, r_out, t_out, rc, tc, order=order,
                                   mask_oob=True)
        ),
        (1, 0, 2),
    )
    got = np.asarray(
        shear_resample2_pallas_t(data, r_out, t_out, rc, tc, order=order,
                                 mask_oob=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)

    plan = static_window_plan([tc], O, t_out, T_in, order)
    kb = int(np.ceil(128 * 1.03)) + (2 if order == 1 else 4)
    ref_d = np.transpose(
        np.asarray(
            shear_resample2_pallas_dyn(
                data, r_out, t_out, jnp.asarray(rc + tc), kb, kb,
                order=order, mask_oob=True
            )
        ),
        (1, 0, 2),
    )
    got_d = np.asarray(
        shear_resample2_pallas_t_dyn(
            data, r_out, t_out, jnp.asarray(rc + tc), kb, plan,
            order=order, mask_oob=True
        )
    )
    np.testing.assert_allclose(got_d, ref_d, atol=1e-5)


@pytest.mark.parametrize("order", [1, 3])
def test_batched_manual_dma_t_kernels_match_vmap(order):
    """The manually double-buffered batched transposed kernels (batch on
    the grid, input in HBM, explicit o8-block DMA chain) match vmapping the
    automatic kernels — including ragged O (clamped overlapping last-block
    fetch) and the final pass's exact-domain mask. Tolerance, not equality:
    in interpret mode both paths become one XLA:CPU program, and the
    different slab provenance (dynamic-slice scratch read vs block read)
    reassociates the 'high'-tier bf16-split accumulation at the ~1e-5
    level; the real-chip kernels measured bit-exact (probe_warp_manual.py).
    Measured on v5e: the automatic kernels run at their no-overlap bound,
    the DMA chain overlaps the fetches (scripts/probe_deskew_overlap.py
    methodology)."""
    import jax

    from biahub_tpu.kernels.pallas_resample import (
        shear_resample2_pallas_t,
        shear_resample2_pallas_t_batched,
        shear_resample_pallas_t,
        shear_resample_pallas_t_batched,
    )

    rng = np.random.default_rng(17)
    data = rng.standard_normal((3, 21, 35, 27)).astype(np.float32)  # ragged O
    r_out = 31
    cs = (0.98, 0.015, -1.4)
    a_flat = tuple(float(x) for x in rng.standard_normal(12))
    mask = (a_flat, (21, 35, 27), -2.5)

    want = np.asarray(
        jax.vmap(
            lambda v: shear_resample_pallas_t(v, r_out, *cs, order=order,
                                              mask=mask)
        )(data)
    )
    got = np.asarray(
        shear_resample_pallas_t_batched(data, r_out, *cs, order=order,
                                        mask=mask)
    )
    np.testing.assert_allclose(got, want, atol=5e-5)

    data2 = rng.standard_normal((2, 13, 26, 37)).astype(np.float32)
    rc, tc = (0.95, 0.0, 0.8), (1.03, 0.02, -1.1)
    want2 = np.asarray(
        jax.vmap(
            lambda v: shear_resample2_pallas_t(v, 24, 33, rc, tc,
                                               order=order, mask_oob=True)
        )(data2)
    )
    got2 = np.asarray(
        shear_resample2_pallas_t_batched(data2, 24, 33, rc, tc, order=order,
                                         mask_oob=True)
    )
    np.testing.assert_allclose(got2, want2, atol=5e-5)


def test_batched_inplane_warp_matches_vmap():
    """inplane_affine_warp_zyx_pallas_batched == vmap of the per-volume
    composition, xzy input, bit parity."""
    import jax

    from biahub_tpu.kernels.affine import (
        inplane_affine_warp_zyx_pallas,
        inplane_affine_warp_zyx_pallas_batched,
    )

    theta = np.deg2rad(2.0)
    m = np.eye(4)
    m[1:3, 1:3] = 1.01 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    m[:3, 3] = [0.3, -0.6, 0.9]

    rng = np.random.default_rng(23)
    vols_xzy = rng.standard_normal((3, 27, 9, 21)).astype(np.float32)
    out_shape = (9, 21, 27)  # logical (Z, Y, X)

    want = np.asarray(
        jax.vmap(
            lambda v: inplane_affine_warp_zyx_pallas(
                v, m, out_shape, fill=-1.0, input_xzy=True
            )
        )(vols_xzy)
    )
    got = np.asarray(
        inplane_affine_warp_zyx_pallas_batched(
            vols_xzy, m, out_shape, fill=-1.0, input_xzy=True
        )
    )
    # Interpret-mode reassociation tolerance (see the kernel test above).
    np.testing.assert_allclose(got, want, atol=5e-5)

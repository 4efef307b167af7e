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

"""Pallas deskew kernel parity with the XLA formulation (interpret mode on CPU)."""

import numpy as np
import pytest

from biahub_tpu.kernels.deskew import deskew_zyx
from biahub_tpu.kernels.pallas_deskew import deskew_zyx_pallas


@pytest.mark.parametrize("keep_overhang", [True, False])
@pytest.mark.parametrize("shape", [(16, 20, 24), (32, 8, 136)])
def test_pallas_matches_xla(shape, keep_overhang):
    rng = np.random.default_rng(0)
    vol = rng.random(shape, dtype=np.float32)
    ref = np.asarray(deskew_zyx(vol, 36.17, 0.371, keep_overhang, 1))
    out = np.asarray(deskew_zyx_pallas(vol, 36.17, 0.371, keep_overhang))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_vmap():
    """vmap over channels (the BatchRunner path) adds a grid dim cleanly."""
    import jax

    rng = np.random.default_rng(1)
    vols = rng.random((3, 16, 20, 24), dtype=np.float32)
    single = lambda v: deskew_zyx_pallas(v, 36.17, 0.371, False)  # noqa: E731
    batched = np.asarray(jax.vmap(single)(vols))
    for c in range(3):
        np.testing.assert_allclose(
            batched[c], np.asarray(single(vols[c])), atol=1e-6
        )


@pytest.mark.parametrize("window", [1, 3])
@pytest.mark.parametrize("shape", [(16, 20, 24), (32, 19, 136)])
def test_batched_manual_dma_matches_vmap(shape, window, monkeypatch):
    """The manually double-buffered batched xzy kernel (batch on the grid,
    input in HBM, explicit DMA chain) is bit-identical to vmap of the
    automatic kernel — the contract the chain helpers rely on when they
    route batches through it (measured 0.99 -> 0.67 ms/vol on v5e,
    scripts/probe_deskew_overlap.py)."""
    import jax

    from biahub_tpu.kernels.pallas_deskew import (
        deskew_zyx_pallas_batched,
        manual_dma_deskew_supported,
    )

    assert manual_dma_deskew_supported(shape, window, "xzy")
    rng = np.random.default_rng(5)
    vols = rng.random((3,) + shape, dtype=np.float32)
    want = np.asarray(
        jax.vmap(
            lambda v: deskew_zyx_pallas(
                v, 36.17, 0.371, False, average_window=window,
                skip_flip=True, out_layout="xzy",
            )
        )(vols)
    )
    got = np.asarray(
        deskew_zyx_pallas_batched(
            vols, 36.17, 0.371, False, average_window=window,
            skip_flip=True, out_layout="xzy",
        )
    )
    np.testing.assert_array_equal(got, want)

    # Env opt-out and non-xzy layouts take the vmapped fallback.
    monkeypatch.setenv("BIAHUB_TPU_NO_MANUAL_DMA", "1")
    assert not manual_dma_deskew_supported(shape, window, "xzy")


@pytest.mark.parametrize("skip_flip", [True, False])
@pytest.mark.parametrize("shape,window", [((16, 20, 24), 3),
                                          ((32, 19, 136), 1)])
def test_batched_manual_dma_zyx_matches_vmap(shape, window, skip_flip):
    """The manually double-buffered ZYX batched kernel (the headline
    deconvolve+deskew step's and the deskew verb's route) is bit-identical
    to vmap of the automatic kernel, including the flip epilogue."""
    import jax

    from biahub_tpu.kernels.pallas_deskew import (
        deskew_zyx_pallas_batched,
        manual_dma_deskew_supported,
    )

    assert manual_dma_deskew_supported(shape, window, "zyx")
    rng = np.random.default_rng(9)
    vols = rng.random((3,) + shape, dtype=np.float32)
    want = np.asarray(
        jax.vmap(
            lambda v: deskew_zyx_pallas(
                v, 36.17, 0.371, False, average_window=window,
                skip_flip=skip_flip,
            )
        )(vols)
    )
    got = np.asarray(
        deskew_zyx_pallas_batched(
            vols, 36.17, 0.371, False, average_window=window,
            skip_flip=skip_flip,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_batched_manual_dma_zyx_pre_transposed_groups8(monkeypatch):
    """ZYX chain mode: the batched kernel takes the GROUPS8-padded
    pre-transposed layout (pass C's yzx_pad sized for 8-group blocks) and
    the vmap fallback slices the extra pad back off — both bit-equal to
    the per-volume kernel on the standard groups padding."""
    import jax
    import jax.numpy as jnp

    from biahub_tpu.kernels.pallas_deskew import deskew_zyx_pallas_batched

    shape, window = (16, 20, 24), 3
    Z, Y, X = shape
    groups = -(-Y // window)
    groups8 = -(-groups // 8) * 8
    pad = groups8 * window - Y
    rng = np.random.default_rng(10)
    vols = rng.random((2,) + shape, dtype=np.float32)
    pre = jnp.pad(
        jnp.transpose(jnp.asarray(vols), (0, 2, 1, 3)),
        ((0, 0), (pad, 0), (0, 0), (0, 0)),
        mode="edge",
    )
    want = np.asarray(
        jax.vmap(
            lambda v: deskew_zyx_pallas(
                v, 36.17, 0.371, False, average_window=window,
                skip_flip=True,
            )
        )(vols)
    )
    got = np.asarray(
        deskew_zyx_pallas_batched(
            pre, 36.17, 0.371, False, average_window=window,
            skip_flip=True, pre_transposed_zyx_shape=shape,
        )
    )
    np.testing.assert_array_equal(got, want)

    # Fallback path: manual disabled, same groups8-padded input must still
    # produce the standard result (the wrapper slices the extra pad).
    monkeypatch.setenv("BIAHUB_TPU_NO_MANUAL_DMA", "1")
    jax.clear_caches()
    got_fb = np.asarray(
        deskew_zyx_pallas_batched(
            pre, 36.17, 0.371, False, average_window=window,
            skip_flip=True, pre_transposed_zyx_shape=shape,
        )
    )
    np.testing.assert_array_equal(got_fb, want)


def test_deskew_zyx_batched_dispatcher(monkeypatch):
    """kernels/deskew.deskew_zyx_batched (the deskew verb's batched_impl)
    routes through the manual zyx kernel on the Pallas path and matches
    vmap(deskew_zyx) — tolerance, not equality: the per-volume dispatcher
    takes the XLA take_along_axis route on CPU while the forced batched
    path runs the Pallas one-hot dots ('high' precision bf16 split)."""
    import jax

    from biahub_tpu.kernels.deskew import deskew_zyx, deskew_zyx_batched

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    rng = np.random.default_rng(11)
    vols = rng.random((2, 16, 20, 24), dtype=np.float32)
    want = np.asarray(
        jax.vmap(
            lambda v: deskew_zyx(
                v, ls_angle_deg=36.17, px_to_scan_ratio=0.371,
                keep_overhang=False, average_window=3, skip_flip=True,
            )
        )(vols)
    )
    got = np.asarray(
        deskew_zyx_batched(
            vols, 36.17, 0.371, False, average_window=3, skip_flip=True
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5)

    # Off the Pallas route the dispatcher must be exactly vmap.
    monkeypatch.delenv("BIAHUB_TPU_FORCE_PALLAS")
    got_cpu = np.asarray(
        deskew_zyx_batched(
            vols, 36.17, 0.371, False, average_window=3, skip_flip=True
        )
    )
    np.testing.assert_array_equal(got_cpu, want)


def test_batched_manual_dma_pre_transposed(monkeypatch):
    """Chain mode: the batched kernel accepts pass C's pre-transposed
    (Yp, Z, X) layout exactly like the per-volume kernel."""
    import jax
    import jax.numpy as jnp

    shape, window = (16, 20, 24), 3
    from biahub_tpu.kernels.pallas_deskew import deskew_zyx_pallas_batched

    Z, Y, X = shape
    groups = -(-Y // window)
    groups8 = -(-groups // 8) * 8
    pad = groups8 * window - Y
    rng = np.random.default_rng(6)
    vols = rng.random((2,) + shape, dtype=np.float32)
    pre = jnp.pad(
        jnp.transpose(jnp.asarray(vols), (0, 2, 1, 3)),
        ((0, 0), (pad, 0), (0, 0), (0, 0)),
        mode="edge",
    )
    want = np.asarray(
        jax.vmap(
            lambda v: deskew_zyx_pallas(
                v, 36.17, 0.371, False, average_window=window,
                skip_flip=True, out_layout="xzy",
            )
        )(vols)
    )
    got = np.asarray(
        deskew_zyx_pallas_batched(
            pre, 36.17, 0.371, False, average_window=window,
            skip_flip=True, pre_transposed_zyx_shape=shape,
            out_layout="xzy",
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("window", [2, 3])
@pytest.mark.parametrize("shape", [(16, 20, 24), (16, 19, 24)])
def test_pallas_fused_averaging_matches_posthoc(shape, window):
    """Kernel-fused z averaging == average_n_slices on the unaveraged result,
    including the edge-padded tail group when Z_out % window != 0."""
    import jax.numpy as jnp

    from biahub_tpu.kernels.deskew import average_n_slices

    rng = np.random.default_rng(2)
    vol = rng.random(shape, dtype=np.float32)
    unaveraged = deskew_zyx_pallas(vol, 36.17, 0.371, False)
    want = np.asarray(average_n_slices(jnp.asarray(unaveraged), window))
    got = np.asarray(
        deskew_zyx_pallas(vol, 36.17, 0.371, False, average_window=window)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)

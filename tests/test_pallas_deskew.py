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

"""Parity tests for the fused Pallas peak-candidate kernel.

The fused kernel (kernels/pallas_peaks.py) must reproduce the XLA
formulation (kernels/peaks.py::_block_max_candidates_xla) EXACTLY —
including the torch block geometry's -block/2 offset, the
count_include_pad=False blur divisors, and min-flat-index tie-breaking.
Integer-valued volumes make the f32 blur sums associativity-exact, so
values AND indices must match bit-for-bit.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from biahub_tpu.kernels.pallas_peaks import peaks_pallas_supported
from biahub_tpu.kernels.peaks import _block_max_candidates_xla


def _parity(shape, blur, seed, monkeypatch, ty=None, kz=None):
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    from biahub_tpu.kernels.pallas_peaks import block_max_candidates_pallas

    assert peaks_pallas_supported(shape, (8, 8, 8), blur)
    rng = np.random.default_rng(seed)
    vol = rng.integers(0, 1000, shape).astype(np.float32)
    want_v, want_i = _block_max_candidates_xla(
        jnp.asarray(vol), (8, 8, 8), blur
    )
    got_v, got_i = block_max_candidates_pallas(
        jnp.asarray(vol), blur_kernel_size=blur, _ty_override=ty,
        _kz_override=kz,
    )
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


@pytest.mark.parametrize(
    "shape,blur",
    [
        ((16, 16, 128), 3),   # minimal gated geometry, border divisors
        ((16, 16, 128), 0),   # no blur: raw block max
        ((24, 32, 256), 3),   # non-cubic, multiple z programs
        ((8, 8, 128), 3),     # single raw z block: both halo clamps active
    ],
)
def test_pallas_matches_xla_exact(shape, blur, monkeypatch):
    _parity(shape, blur, 7, monkeypatch)


@pytest.mark.parametrize(
    "shape,blur,ty",
    [
        ((16, 32, 128), 3, 16),  # 2 y tiles: cross-tile halo + straddle row
        ((16, 48, 128), 3, 16),  # 3 y tiles
        ((16, 32, 128), 0, 8),   # minimal tiles, no blur
    ],
)
def test_y_tiled_matches_xla_exact(shape, blur, ty, monkeypatch):
    """Multi-tile y grid (production path for large camera frames): the
    left-halo refs, the global-coordinate masks, and the straddle-row
    ownership must reproduce the single-tile answer exactly."""
    _parity(shape, blur, 11, monkeypatch, ty=ty)


@pytest.mark.parametrize(
    "shape,blur,kz,ty",
    [
        ((32, 16, 128), 3, 1, None),   # 4 z chunks: thin z halo + straddle
        ((32, 16, 128), 0, 2, None),   # 2 z chunks, no blur
        ((32, 32, 128), 3, 2, 16),     # z chunks x y tiles: corner halo ref
    ],
)
def test_z_chunked_matches_xla_exact(shape, blur, kz, ty, monkeypatch):
    """Multi-chunk z grid (thin 8-row z-halo refs + pl.when straddle
    ownership): cross-chunk blur rows and the z straddle block must
    reproduce the single-chunk answer exactly."""
    _parity(shape, blur, 13, monkeypatch, ty=ty, kz=kz)


def test_tie_breaking_min_flat_index(monkeypatch):
    """Plateaus spanning block interiors must resolve to the smallest
    C-order flat index in both implementations."""
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    from biahub_tpu.kernels.pallas_peaks import block_max_candidates_pallas

    shape = (16, 16, 128)
    vol = np.zeros(shape, np.float32)
    vol[2:6, 3:9, 10:30] = 7.0  # constant plateau across several blocks
    vol[9:, :, :] = 1.0
    want_v, want_i = _block_max_candidates_xla(jnp.asarray(vol), (8, 8, 8), 0)
    got_v, got_i = block_max_candidates_pallas(
        jnp.asarray(vol), blur_kernel_size=0
    )
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_detect_peaks_routes_through_pallas(monkeypatch):
    """detect_peaks on a gated shape finds the planted beads through the
    fused kernel (end-to-end with thresholding + NMS on host)."""
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    from biahub_tpu.kernels.peaks import detect_peaks

    shape = (32, 32, 256)
    rng = np.random.default_rng(3)
    vol = 10.0 * rng.random(shape).astype(np.float32)
    beads = [(10, 12, 40), (20, 25, 200), (5, 8, 130)]
    for b in beads:
        vol[b] = 5000.0
    coords = detect_peaks(
        vol, threshold_abs=200.0, min_distance=0, blur_kernel_size=0
    )
    got = {tuple(c) for c in coords}
    assert got == set(beads)


def test_gate_rejects_unsupported(monkeypatch):
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    assert not peaks_pallas_supported((15, 16, 128), (8, 8, 8), 3)  # z % 8
    assert not peaks_pallas_supported((16, 16, 120), (8, 8, 8), 3)  # x % 128
    assert not peaks_pallas_supported((16, 16, 128), (4, 4, 4), 3)  # block
    assert not peaks_pallas_supported((16, 16, 128), (8, 8, 8), 5)  # blur k
    monkeypatch.setenv("BIAHUB_TPU_NO_PALLAS", "1")
    assert not peaks_pallas_supported((16, 16, 128), (8, 8, 8), 3)

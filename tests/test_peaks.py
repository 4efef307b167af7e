"""Unit tests for the device peak detector (kernels/peaks.py).

Reference semantics: biahub/characterize_psf.py:562-710 (torch approximate
peak_local_max: blur, block max-pool, top-k, threshold, NMS, border).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biahub_tpu.kernels.peaks import (
    _block_max_topk,
    block_max_candidates,
    detect_peaks,
)


def _volume_with_peaks(shape=(32, 64, 64), n=12, seed=3, brightness=4000.0):
    rng = np.random.default_rng(seed)
    vol = (10.0 * rng.random(shape)).astype(np.float32)
    # Well-separated grid candidates (>= 7 px apart), n of them at random.
    grid = np.stack(
        np.meshgrid(*[np.arange(6, s - 6, 9) for s in shape], indexing="ij"), -1
    ).reshape(-1, 3)
    pts = grid[rng.choice(len(grid), size=n, replace=False)]
    vol[pts[:, 0], pts[:, 1], pts[:, 2]] = brightness
    return vol, pts


def test_detect_peaks_finds_planted_beads():
    """Every planted bead is found within 1 px (the 3^3 blur can shift the
    block argmax by one voxel) and nothing else passes the threshold."""
    vol, pts = _volume_with_peaks()
    coords = detect_peaks(vol, threshold_abs=50.0, min_distance=0, nms_distance=3)
    assert len(coords) == len(pts)
    d = np.abs(coords[:, None, :] - pts[None, :, :]).max(-1)
    assert (d.min(axis=1) <= 1).all()  # every detection near a planted bead
    assert (d.min(axis=0) <= 1).all()  # every planted bead detected


def test_detect_peaks_threshold_and_border():
    vol, pts = _volume_with_peaks()
    none = detect_peaks(vol, threshold_abs=10000.0, min_distance=0)
    assert len(none) == 0
    bordered = detect_peaks(
        vol, threshold_abs=50.0, min_distance=0,
        exclude_border=(8, 8, 8),
    )
    for c in bordered:
        assert (c > 8).all() and (c < np.asarray(vol.shape) - 8).all()


def test_blur_counts_match_reduce_window():
    """The host-built separable blur divisor equals the reduce_window-over-
    ones it replaced (count_include_pad=False normalization)."""
    shape = (9, 14, 23)
    for k in (3, 5):
        ones = jnp.ones(shape, jnp.float32)
        want = np.asarray(
            jax.lax.reduce_window(
                ones, 0.0, jax.lax.add, (k, k, k), (1, 1, 1), "SAME"
            )
        )

        def c1(s):
            lo = (k - 1) // 2
            i = np.arange(s)
            return (
                np.minimum(i - lo + k - 1, s - 1) - np.maximum(i - lo, 0) + 1
            ).astype(np.float32)

        cz, cy, cx = (c1(s) for s in shape)
        got = cz[:, None, None] * cy[None, :, None] * cx
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")


def test_topk_matches_host_argsort():
    """The fused device top-k returns the same (value, index) set as the
    previous fetch-everything-and-argsort host path."""
    vol, _ = _volume_with_peaks()
    values, flat = block_max_candidates(jnp.asarray(vol))
    values = np.asarray(values)
    flat = np.asarray(flat)
    k = 20
    order = np.argsort(values)[::-1][:k]
    want = set(zip(values[order].tolist(), flat[order].tolist()))

    top_v, top_i = _block_max_topk(jnp.asarray(vol), (8, 8, 8), 3, k)
    got = set(zip(np.asarray(top_v).tolist(), np.asarray(top_i).tolist()))
    assert got == want


def _near(found, pt, tol=1):
    return any(np.abs(np.asarray(f) - np.asarray(pt)).max() <= tol for f in found)


def test_nms_drops_the_dimmer_of_a_close_pair():
    """NMS keeps the brighter of any pair within nms_distance (reference:
    biahub/characterize_psf.py:562-710 semantics)."""
    vol = (5.0 * np.random.default_rng(0).random((16, 48, 48))).astype(np.float32)
    vol[8, 20, 20] = 4000.0
    vol[8, 24, 24] = 3000.0  # within the NMS radius of the brighter one
    vol[8, 40, 10] = 3500.0  # far away; must survive
    coords = detect_peaks(
        vol, threshold_abs=50.0, nms_distance=9, min_distance=0
    )
    found = [tuple(c) for c in coords]
    assert len(found) == 2
    assert _near(found, (8, 20, 20))
    assert _near(found, (8, 40, 10))
    assert not _near(found, (8, 24, 24), tol=0)


def test_min_distance_drops_whole_clusters():
    """min_distance rejects EVERY member of a too-close cluster (unlike NMS,
    which keeps the brightest) — matching the reference's crowded-field
    rejection."""
    vol = (5.0 * np.random.default_rng(0).random((16, 48, 48))).astype(np.float32)
    vol[8, 20, 20] = 4000.0
    vol[8, 24, 24] = 3000.0
    vol[8, 40, 10] = 3500.0
    coords = detect_peaks(
        vol, threshold_abs=50.0, nms_distance=3, min_distance=12
    )
    found = [tuple(c) for c in coords]
    assert len(found) == 1
    assert _near(found, (8, 40, 10))

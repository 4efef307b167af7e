"""Tests of the registration pipelines: beads, intensity, fitting."""

import numpy as np
from scipy.ndimage import affine_transform as sp_affine
from scipy.ndimage import gaussian_filter, shift as nd_shift

from biahub_tpu.registration.beads import estimate as beads_estimate
from biahub_tpu.registration.intensity import estimate as intensity_estimate
from biahub_tpu.settings import (
    AffineTransformSettings,
    BeadsMatchSettings,
    DetectPeaksSettings,
)
from biahub_tpu.transforms.fitting import fit_euclidean, fit_similarity


def _bead_volume(shape=(24, 96, 96), n=40, seed=0, sigma=1.0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    pts = np.stack([rng.integers(4, s - 4, n) for s in shape], 1)
    vol[pts[:, 0], pts[:, 1], pts[:, 2]] = 1000.0
    return gaussian_filter(vol, sigma)


def test_fit_euclidean_and_similarity():
    rng = np.random.default_rng(1)
    src = rng.random((20, 3)) * 50
    theta = np.deg2rad(10)
    rot = np.array(
        [
            [1, 0, 0],
            [0, np.cos(theta), -np.sin(theta)],
            [0, np.sin(theta), np.cos(theta)],
        ]
    )
    dst = (1.1 * rot @ src.T).T + np.array([2.0, -1.0, 3.0])
    m = fit_similarity(src, dst)
    np.testing.assert_allclose(m[:3, :3], 1.1 * rot, atol=1e-8)
    np.testing.assert_allclose(m[:3, 3], [2, -1, 3], atol=1e-8)

    dst_rigid = (rot @ src.T).T + np.array([2.0, -1.0, 3.0])
    m = fit_euclidean(src, dst_rigid)
    np.testing.assert_allclose(m[:3, :3], rot, atol=1e-8)


def test_beads_estimate_recovers_translation():
    ref = _bead_volume()
    s = np.array([2.0, -4.0, 3.0])
    mov = nd_shift(ref, s, order=1)
    bms = BeadsMatchSettings(
        source_peaks_settings=DetectPeaksSettings(
            threshold_abs=20, block_size=[8, 8, 8], nms_distance=3, min_distance=0
        ),
        target_peaks_settings=DetectPeaksSettings(
            threshold_abs=20, block_size=[8, 8, 8], nms_distance=3, min_distance=0
        ),
    )
    ats = AffineTransformSettings(transform_type="euclidean")
    w = beads_estimate(mov, ref, bms, ats)
    np.testing.assert_allclose(w[:3, 3], s, atol=0.5)
    np.testing.assert_allclose(w[:3, :3], np.eye(3), atol=0.05)


def test_intensity_estimate_recovers_similarity():
    ref = _bead_volume((24, 64, 64), n=30, sigma=2.5)
    theta = np.deg2rad(4.0)
    c, s = np.cos(theta), np.sin(theta)
    lin = 1.03 * np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    center = (np.array(ref.shape) - 1) / 2
    w_true = np.eye(4)
    w_true[:3, :3] = lin
    w_true[:3, 3] = center - lin @ center + np.array([1.0, -2.0, 1.5])
    w_inv = np.linalg.inv(w_true)
    mov = sp_affine(ref, w_inv[:3, :3], w_inv[:3, 3], order=1)

    fwd, inv = intensity_estimate(
        ref,
        mov,
        ants_kwargs={
            "aff_shrink_factors": (4, 2, 1),
            "aff_iterations": (300, 200, 150),
            "aff_smoothing_sigmas": (2, 1, 0),
        },
    )
    assert np.abs(fwd[:3, :3] - w_true[:3, :3]).max() < 0.01
    assert np.abs(fwd[:3, 3] - w_true[:3, 3]).max() < 0.3


def test_traced_multipass_matches_concrete():
    """make_traced_multipass_warp (used inside the TPU optimizer loss) agrees
    with the concrete-matrix multipass warp and is differentiable."""
    import jax
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter
    from scipy.spatial.transform import Rotation

    from biahub_tpu.kernels.multipass_warp import (
        make_traced_multipass_warp,
        multipass_affine_warp_zyx,
    )

    rng = np.random.default_rng(1)
    vol = gaussian_filter(rng.random((20, 32, 28)), 2.0).astype(np.float32)
    M = np.eye(4)
    M[:3, :3] = 1.03 * Rotation.from_euler("xyz", [7, -4, 10], degrees=True).as_matrix()
    M[:3, 3] = [1.0, -2.0, 1.5]

    warp = make_traced_multipass_warp(vol.shape, vol.shape)
    out_t = np.asarray(jax.jit(warp)(vol, M.astype(np.float32)))
    out_c = np.asarray(multipass_affine_warp_zyx(vol, M, vol.shape))
    assert np.abs(out_t - out_c).max() < 2e-3

    target = jnp.asarray(out_c)

    def loss(p):
        m = jnp.eye(4).at[:3, 3].set(p)
        return jnp.sum((warp(vol, m) - target) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.zeros(3)))
    assert np.all(np.isfinite(g)) and np.any(g != 0)


def test_optimize_level_with_traced_warp():
    """Multi-res optimization with the traced multipass warp in the loss (the
    TPU path) recovers the same similarity the exact-gather path does."""
    import jax.numpy as jnp

    from biahub_tpu.kernels.multipass_warp import make_traced_multipass_warp
    from biahub_tpu.registration.intensity import (
        _downsample,
        _gaussian_blur_zyx,
        _optimize_level,
        _similarity_matrix,
    )

    ref = _bead_volume((24, 64, 64), n=30, sigma=2.5)
    w_true = np.eye(4)
    w_true[:3, 3] = [1.0, -2.0, 1.5]
    w_inv = np.linalg.inv(w_true)
    mov = sp_affine(ref, w_inv[:3, :3], w_inv[:3, 3], order=1)

    params = jnp.zeros(7)
    for shrink, sigma, n in zip((4, 2, 1), (2, 1, 0), (300, 200, 150)):
        ref_l = _downsample(_gaussian_blur_zyx(jnp.asarray(ref), sigma), shrink)
        mov_l = _downsample(_gaussian_blur_zyx(jnp.asarray(mov), sigma), shrink)
        center = (jnp.asarray(ref_l.shape, dtype=jnp.float32) - 1) / 2
        warp_fn = make_traced_multipass_warp(
            mov_l.shape, tuple(ref_l.shape), margin=0.25, order=1
        )
        params = params.at[4:7].set(params[4:7] / shrink)
        params, losses = _optimize_level(
            mov_l, ref_l, params, center, n, tuple(ref_l.shape), warp_fn=warp_fn
        )
        params = params.at[4:7].set(params[4:7] * shrink)

    center_full = (jnp.asarray(ref.shape, dtype=jnp.float32) - 1) / 2
    est = np.asarray(_similarity_matrix(params, center_full))
    np.testing.assert_allclose(est[:3, 3], w_true[:3, 3], atol=0.3)
    np.testing.assert_allclose(est[:3, :3], np.eye(3), atol=0.01)


def test_manual_transform_from_picked_points_similarity():
    """Similarity fit recovers inv(S @ compound) from clicked pairs
    (reference: biahub/estimate_registration.py:306-333)."""
    from biahub_tpu.estimate_registration import (
        manual_compound_affine,
        manual_transform_from_picked_points,
    )

    rng = np.random.default_rng(3)
    compound = manual_compound_affine(
        (16, 64, 64), (20, 80, 80), (2.0, 0.5, 0.5), (1.0, 0.25, 0.25),
        pre_affine_90degree_rotation=1, pre_affine_fliplr=True,
    )
    theta = np.deg2rad(8.0)
    S = np.eye(4)
    S[0, 0] = 1.07  # uniform scale on every axis: a true 3D similarity
    S[1:3, 1:3] = 1.07 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    S[:3, 3] = [1.5, -4.0, 2.5]
    # Points as the napari flow records them: source picked on the
    # pre-aligned overlay, target = S applied to those points.
    src = rng.uniform(5, 60, size=(8, 3))
    dst = (S @ np.hstack([src, np.ones((8, 1))]).T).T[:, :3]
    got = manual_transform_from_picked_points(src, dst, compound, similarity=True)
    np.testing.assert_allclose(got, np.linalg.inv(S @ compound), atol=1e-8)


def test_manual_transform_euclidean_z_from_first_pair():
    """Euclidean mode: 2D YX rigid fit + z translation from the FIRST pair."""
    from biahub_tpu.estimate_registration import (
        manual_transform_from_picked_points,
    )

    rng = np.random.default_rng(4)
    src = rng.uniform(5, 60, size=(5, 3))
    dst = src.copy()
    dst[:, 1:] += [3.0, -2.0]
    dst[:, 0] += 1.25
    dst[1:, 0] += rng.uniform(-0.5, 0.5, size=4)  # z noise beyond first pair
    got = manual_transform_from_picked_points(src, dst, np.eye(4), similarity=False)
    expected = np.eye(4)
    expected[:3, 3] = [-1.25, -3.0, 2.0]  # inverse of the forward translation
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_registration_from_point_pairs_frames_agree():
    """original-frame points pre-aligned internally == pre-aligned input."""
    from biahub_tpu.estimate_registration import (
        manual_compound_affine,
        registration_from_point_pairs,
    )

    rng = np.random.default_rng(5)
    kwargs = dict(
        source_shape_zyx=(12, 40, 40),
        target_shape_zyx=(12, 40, 40),
        source_voxel_size=(2.0, 0.5, 0.5),
        target_voxel_size=(1.0, 0.5, 0.5),
    )
    compound = manual_compound_affine(
        kwargs["source_shape_zyx"], kwargs["target_shape_zyx"],
        kwargs["source_voxel_size"], kwargs["target_voxel_size"],
    )
    src_orig = rng.uniform(2, 30, size=(6, 3))
    pre = (compound @ np.hstack([src_orig, np.ones((6, 1))]).T).T[:, :3]
    dst = pre + [0.5, -1.0, 2.0]
    a = registration_from_point_pairs(
        src_orig, dst, source_points_frame="original", **kwargs
    )
    b = registration_from_point_pairs(
        pre, dst, source_points_frame="pre_aligned", **kwargs
    )
    np.testing.assert_allclose(a, b, atol=1e-9)

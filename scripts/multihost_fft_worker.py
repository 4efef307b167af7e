"""Worker for the 2-process sharded-FFT dry-run case (__graft_entry__.py).

Each process owns 2 virtual CPU devices (XLA_FLAGS set by the parent); the
distributed-transpose FFT (parallel/sharded_fft.py) runs over the GLOBAL
4-device 'space' mesh spanning both jax.distributed processes — the DCN
analog of sharding one over-HBM FOV across a pod slice — and every process
validates its addressable output shards against the numpy reference.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from biahub_tpu.parallel.distributed import maybe_initialize_distributed

    assert maybe_initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from biahub_tpu.kernels.deconvolve import compute_transfer_function
    from biahub_tpu.parallel.sharded_fft import (
        deconvolve_zyx_sharded,
        sharded_fft_supported,
    )

    shape, reg = (8, 16, 32), 1e-3
    n_dev = jax.device_count()
    assert sharded_fft_supported(shape, n_dev)
    mesh = Mesh(np.asarray(jax.devices()), ("space",))
    sharding = NamedSharding(mesh, P("space"))

    rng = np.random.default_rng(7)
    vol = rng.random(shape, np.float32)
    psf = np.zeros((3, 3, 3), np.float32)
    psf[1, 1, 1] = 0.5
    psf[0, 1, 1] = psf[2, 1, 1] = 0.25
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

    # Global input: each process contributes its z-slab shards.
    rows_per_dev = shape[0] // n_dev
    local = vol[pid * 2 * rows_per_dev : (pid + 1) * 2 * rows_per_dev]
    garr = jax.make_array_from_process_local_data(sharding, local)

    out = deconvolve_zyx_sharded(
        garr, jnp.asarray(tf_half), mesh, "space", reg
    )
    jax.block_until_ready(out)

    data_hat = np.fft.rfftn(vol)
    filt = tf_half / (tf_half**2 + reg)
    want = np.fft.irfftn(data_hat * filt, s=shape, axes=(0, 1, 2))
    scale = np.abs(want).max()
    for shard in out.addressable_shards:
        z0 = shard.index[0].start or 0
        got = np.asarray(shard.data)
        diff = np.abs(got - want[z0 : z0 + got.shape[0]]).max() / scale
        assert diff < 2e-4, f"process {pid} shard z={z0}: rel diff {diff}"
    print(f"MULTIHOST-FFT-OK {pid}")


if __name__ == "__main__":
    main()

"""Worker process for the multi-host runtime test (not collected by pytest).

Spawned N times by tests/test_multihost.py with 4 virtual CPU devices each:
validates jax.distributed bring-up, a DCN all-reduce over the global
("host", "batch") mesh, and BatchRunner's process-striped execution against
a shared zarr plate.
"""

import sys

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; pin before first use.
jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nproc, port, tmpdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    from biahub_tpu.parallel.distributed import (
        barrier,
        is_coordinator,
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed(f"localhost:{port}", nproc, pid)

    import numpy as np
    import jax.numpy as jnp

    from biahub_tpu.parallel.mesh import get_global_mesh, host_batch_sharding

    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    # --- sharded step over the global mesh with a cross-host all-reduce ---
    mesh = get_global_mesh()
    assert mesh.axis_names == ("host", "batch")
    assert mesh.devices.shape == (nproc, 4)
    rng = np.random.default_rng(0)
    full = rng.random((8 * nproc, 4, 8), np.float32)
    shard = full[pid * 8 : (pid + 1) * 8]
    garr = jax.make_array_from_process_local_data(host_batch_sharding(mesh), shard)

    @jax.jit
    def step(x):
        return jnp.mean(x * 2.0 + 1.0)

    got = float(step(garr))
    want = float(np.mean(full * 2.0 + 1.0))
    assert abs(got - want) < 1e-6, (got, want)

    # --- BatchRunner stripes units; per-host zarr I/O into a shared plate ---
    from biahub_tpu.io.ngff import open_ome_zarr
    from biahub_tpu.runtime.executor import BatchRunner

    in_path, out_path = f"{tmpdir}/in.zarr", f"{tmpdir}/out.zarr"
    wells = [("A", "1"), ("B", "1")]
    data = {
        (r, c): np.arange(3 * 2 * 4 * 8 * 16, dtype=np.float32).reshape(
            3, 2, 4, 8, 16
        )
        + 100.0 * i
        for i, (r, c) in enumerate(wells)
    }
    if is_coordinator():
        plate = open_ome_zarr(in_path, layout="hcs", mode="w", channel_names=["a", "b"])
        for (r, c), arr in data.items():
            plate.create_position(r, c, "0").create_image("0", arr)
    barrier("input-ready")
    # Every process calls create_empty_plate; it serializes internally
    # (coordinator creates, workers wait at the barrier).
    from biahub_tpu.io.ngff import create_empty_plate

    create_empty_plate(
        out_path,
        position_keys=[(r, c, "0") for r, c in wells],
        channel_names=["a", "b"],
        shape=(3, 2, 4, 8, 16),
    )

    in_pos = [open_ome_zarr(f"{in_path}/{r}/{c}/0") for r, c in wells]
    out_pos = [open_ome_zarr(f"{out_path}/{r}/{c}/0") for r, c in wells]
    runner = BatchRunner(cluster="debug")
    n = runner.run_zyx(lambda v: v * 2.0, in_pos, out_pos)
    total_units = 2 * 3 * 2  # positions x T x C
    assert n == total_units // nproc, n
    barrier("writes-done")
    if is_coordinator():
        for (r, c), arr in data.items():
            written = np.asarray(open_ome_zarr(f"{out_path}/{r}/{c}/0").data[:])
            np.testing.assert_allclose(written, arr * 2.0, rtol=1e-6)
    barrier("validated")

    # --- a full CLI verb runs SPMD: both processes invoke `biahub deskew`
    # on the same plate; coordinated plate creation + unit striping engage
    # through the production code path.
    import os
    import yaml
    from click.testing import CliRunner
    from biahub_tpu.cli.main import cli

    os.environ["BIAHUB_TPU_COORDINATOR"] = f"localhost:{port}"  # adopted, not re-init
    cfg_path = f"{tmpdir}/deskew.yml"
    if is_coordinator():
        with open(cfg_path, "w") as f:
            yaml.safe_dump(
                {"pixel_size_um": 0.116, "ls_angle_deg": 36.0, "px_to_scan_ratio": 0.38},
                f,
            )
    barrier("config-ready")
    result = CliRunner().invoke(
        cli,
        [
            "deskew",
            "-i", f"{in_path}/A/1/0", f"{in_path}/B/1/0",
            "-c", cfg_path,
            "-o", f"{tmpdir}/deskewed.zarr",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert "multi-host: process" in result.output
    barrier("deskew-done")
    if is_coordinator():
        des = np.asarray(open_ome_zarr(f"{tmpdir}/deskewed.zarr/A/1/0").data[:])
        assert np.isfinite(des).all() and des.std() > 0
    barrier("deskew-validated")
    print(f"MULTIHOST-OK {pid}")


if __name__ == "__main__":
    main()

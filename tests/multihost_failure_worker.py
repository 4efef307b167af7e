"""Worker for the multi-host failure-semantics test (not collected by pytest).

Two processes bring up jax.distributed and run a striped BatchRunner pass
that commits resume records. Then process 1 dies (simulated preemption)
while process 0 waits at a barrier with a short timeout: the survivor must
fail FAST with an actionable error instead of stalling the fleet
(reference analog: Nextflow preemption retries, nextflow/nextflow.config).
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

    from biahub_tpu.io.ngff import create_empty_plate, open_ome_zarr
    from biahub_tpu.runtime.executor import BatchRunner

    in_path, out_path = f"{tmpdir}/in.zarr", f"{tmpdir}/out.zarr"
    shape = (2, 1, 4, 8, 16)
    if is_coordinator():
        plate = open_ome_zarr(in_path, layout="hcs", mode="w", channel_names=["a"])
        plate.create_position("A", "1", "0").create_image(
            "0", np.arange(np.prod(shape), dtype=np.float32).reshape(shape)
        )
    barrier("input-ready")
    create_empty_plate(
        out_path, position_keys=[("A", "1", "0")], channel_names=["a"], shape=shape
    )
    in_pos = [open_ome_zarr(f"{in_path}/A/1/0")]
    out_pos = [open_ome_zarr(f"{out_path}/A/1/0")]
    runner = BatchRunner(cluster="debug")
    n = runner.run_zyx(
        lambda v: v + 1.0, in_pos, out_pos, resume=True, resume_token="failtok"
    )
    print(f"striped run done on {pid}: {n} units", flush=True)
    barrier("writes-done")

    if pid == 1:
        # Simulated preemption: die without reaching the next barrier and
        # without jax.distributed.shutdown.
        print("WORKER-1-DYING", flush=True)
        import os

        os._exit(0)

    # Survivor: must NOT hang. The short timeout fires and raises.
    import os

    try:
        barrier("after-peer-death", timeout_s=10.0)
    except RuntimeError as exc:
        assert "timed out" in str(exc) and "resume" in str(exc), exc
        print("BARRIER-TIMEOUT-OK", flush=True)
        # _exit: skip jax's atexit distributed-shutdown barrier, which would
        # abort (the peer is dead) and mask this deliberate exit code.
        os._exit(3)
    print("BARRIER-UNEXPECTEDLY-PASSED", flush=True)
    os._exit(4)


if __name__ == "__main__":
    main()

"""Worker for the 2-process BatchRunner dry-run case (__graft_entry__.py).

The dryrun certifies the kernels and the fuse chain; this worker puts the
EXECUTOR — the component that replaces the reference's entire L2 Slurm
fan-out (reference: biahub/deskew.py:729-752) — into the driver's
multi-chip artifact: N jax.distributed processes run the same verb-shaped
``run_units`` pass over a shared zarr plate (coordinated plate creation,
deterministic per-process unit striping, per-unit progress records,
pipelined dispatch-ahead batches), and the parent asserts the written
stores match a single-process run bit-for-bit.

Invoked as: worker.py <pid> <nproc> <port> <tmpdir>. ``nproc == 1`` skips
the distributed bring-up (the single-process reference run).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nproc, port, tmpdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    if nproc > 1:
        from biahub_tpu.parallel.distributed import maybe_initialize_distributed

        assert maybe_initialize_distributed(f"localhost:{port}", nproc, pid)
        assert jax.process_count() == nproc

    import numpy as np

    from biahub_tpu.io.ngff import create_empty_plate, open_ome_zarr
    from biahub_tpu.kernels.chain import deconvolve_then_deskew
    from biahub_tpu.kernels.deconvolve import compute_transfer_function
    from biahub_tpu.kernels.deskew import get_deskewed_data_shape
    from biahub_tpu.runtime.executor import BatchRunner, WorkUnit

    shape = (8, 16, 32)
    ls_angle, px_to_scan, reg = 30.0, 0.5, 1e-3
    dshape, _ = get_deskewed_data_shape(shape, ls_angle, px_to_scan, False)
    wells = [("A", "1"), ("B", "1")]
    out_path = f"{tmpdir}/out-{nproc}proc.zarr"

    # Every process calls create_empty_plate: coordinated creation (the
    # coordinator creates, workers wait) — the production race-safety path.
    create_empty_plate(
        out_path,
        position_keys=[(r, c, "0") for r, c in wells],
        channel_names=["raw"],
        shape=(3, 1) + tuple(dshape),
    )

    psf = np.zeros((3, 3, 3), np.float32)
    psf[1, 1, 1] = 0.5
    psf[0, 1, 1] = psf[2, 1, 1] = 0.25
    tf_half = compute_transfer_function(psf, shape)[..., : shape[-1] // 2 + 1]

    def kernel(zyx, tf_half=None):
        return deconvolve_then_deskew(
            zyx, tf_half, reg, ls_angle, px_to_scan,
            keep_overhang=False, average_window=1, skip_flip=True,
        )

    in_pos = [open_ome_zarr(f"{tmpdir}/in.zarr/{r}/{c}/0") for r, c in wells]
    out_pos = [open_ome_zarr(f"{out_path}/{r}/{c}/0") for r, c in wells]
    # Pipelined mode: the dispatch-ahead path is what production runs.
    runner = BatchRunner(cluster="local")
    units = [
        WorkUnit(p, t, 0, 0) for p in range(len(wells)) for t in range(3)
    ]
    n = runner.run_units(
        kernel,
        units,
        in_pos,
        out_pos,
        resume=True,
        resume_token="dryrun",
        post_fetch=lambda a: a[:, ::-1],
        broadcast_params={"tf_half": tf_half},
    )
    total_units = len(wells) * 3
    assert n == total_units // nproc, (n, nproc)

    if nproc > 1:
        from biahub_tpu.parallel.distributed import barrier

        barrier("batchrunner-writes-done")
    print(f"MULTIHOST-BATCHRUNNER-OK {pid}")


if __name__ == "__main__":
    main()

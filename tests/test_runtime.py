"""Unit tests of the batch executor: grouping, padding, sharding, resume."""

import jax
import jax.numpy as jnp
import numpy as np

from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.io.progress import ProgressStore
from biahub_tpu.parallel.mesh import get_mesh
from biahub_tpu.runtime.executor import BatchRunner, WorkUnit, sbatch_to_overrides


def _plate(tmp_path, name, shape=(3, 2, 4, 8, 16), channels=("a", "b")):
    plate = open_ome_zarr(tmp_path / name, layout="hcs", mode="w", channel_names=list(channels))
    pos = plate.create_position("A", "1", "0")
    rng = np.random.default_rng(0)
    pos.create_image("0", rng.random(shape).astype(np.float32))
    return open_ome_zarr(tmp_path / name)["A/1/0"]


def test_run_zyx_all_units(tmp_path):
    in_pos = _plate(tmp_path, "in.zarr")
    out_plate = open_ome_zarr(tmp_path / "out.zarr", layout="hcs", mode="w", channel_names=["a", "b"])
    out_pos = out_plate.create_position("A", "1", "0")
    out_pos.create_zeros("0", (3, 2, 4, 8, 16), np.float32)

    runner = BatchRunner(cluster="debug")
    n = runner.run_zyx(lambda v: v * 2.0, [in_pos], [out_pos])
    assert n == 6
    np.testing.assert_allclose(out_pos.data[...], in_pos.data[...] * 2.0, rtol=1e-6)


def test_run_units_sharded_over_mesh(tmp_path):
    """8-device mesh with a unit count that doesn't divide evenly."""
    in_pos = _plate(tmp_path, "in.zarr", shape=(5, 2, 4, 8, 16))
    out_plate = open_ome_zarr(tmp_path / "o.zarr", layout="hcs", mode="w", channel_names=["a", "b"])
    out_pos = out_plate.create_position("A", "1", "0")
    out_pos.create_zeros("0", (5, 2, 4, 8, 16), np.float32)

    mesh = get_mesh(8)
    runner = BatchRunner(cluster="debug", mesh=mesh)
    n = runner.run_zyx(lambda v: v + 1.0, [in_pos], [out_pos])
    assert n == 10  # 5 t x 2 c, not divisible by 8
    np.testing.assert_allclose(out_pos.data[...], in_pos.data[...] + 1.0, rtol=1e-6)


def test_run_units_per_unit_params(tmp_path):
    in_pos = _plate(tmp_path, "in.zarr", shape=(4, 1, 2, 8, 16), channels=("a",))
    out_plate = open_ome_zarr(tmp_path / "o.zarr", layout="hcs", mode="w", channel_names=["a"])
    out_pos = out_plate.create_position("A", "1", "0")
    out_pos.create_zeros("0", (4, 1, 2, 8, 16), np.float32)

    gains = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    units = [WorkUnit(0, t, 0, 0) for t in range(4)]
    runner = BatchRunner(cluster="debug")
    runner.run_units(
        lambda v, gain: v * gain,
        units,
        [in_pos],
        [out_pos],
        per_unit_params=lambda u: {"gain": gains[u.t]},
    )
    for t in range(4):
        np.testing.assert_allclose(
            out_pos.data[t, 0], in_pos.data[t, 0] * gains[t], rtol=1e-6
        )


def test_resume_skips_done_units(tmp_path):
    in_pos = _plate(tmp_path, "in.zarr", shape=(3, 1, 2, 8, 16), channels=("a",))
    out_plate = open_ome_zarr(tmp_path / "o.zarr", layout="hcs", mode="w", channel_names=["a"])
    out_pos = out_plate.create_position("A", "1", "0")
    out_pos.create_zeros("0", (3, 1, 2, 8, 16), np.float32)

    # Pretend unit (t=1, c=0) already finished under this token
    ProgressStore(out_pos.path, "tok").mark_done(1, 0)

    calls = []

    def kernel(v):
        return v * 10.0

    runner = BatchRunner(cluster="debug")
    n = runner.run_zyx(kernel, [in_pos], [out_pos], resume=True, resume_token="tok")
    assert n == 2  # t=1 skipped
    # Skipped unit untouched (still zero), others computed
    assert np.allclose(out_pos.data[1, 0], 0)
    np.testing.assert_allclose(out_pos.data[0, 0], in_pos.data[0, 0] * 10, rtol=1e-6)
    # A different token invalidates records
    n = runner.run_zyx(kernel, [in_pos], [out_pos], resume=True, resume_token="tok2")
    assert n == 3


def test_czyx_units(tmp_path):
    """Tuple channel units feed CZYX kernels (the reconstruction path)."""
    in_pos = _plate(tmp_path, "in.zarr", shape=(2, 2, 2, 8, 16))
    out_plate = open_ome_zarr(tmp_path / "o.zarr", layout="hcs", mode="w", channel_names=["s"])
    out_pos = out_plate.create_position("A", "1", "0")
    out_pos.create_zeros("0", (2, 1, 2, 8, 16), np.float32)

    units = [WorkUnit(0, t, (0, 1), (0,)) for t in range(2)]
    runner = BatchRunner(cluster="debug")
    runner.run_units(
        lambda czyx: jnp.sum(czyx, axis=0, keepdims=True), units, [in_pos], [out_pos]
    )
    np.testing.assert_allclose(
        out_pos.data[0, 0], in_pos.data[0].sum(axis=0), rtol=1e-5
    )


def test_sbatch_to_overrides(sbatch_file):
    overrides = sbatch_to_overrides(sbatch_file)
    assert overrides["slurm_cpus_per_task"] == 1
    assert overrides["slurm_array_parallelism"] == 2
    assert overrides["cpus_per_task"] == 1
    assert overrides["timeout_min"] == 1


def test_batch_size_accounts_for_output_footprint():
    """Kernels whose output dwarfs the input (keep-overhang deskew emits ~9x
    the voxels) must shrink the batch, or production volumes exhaust HBM."""
    runner = BatchRunner(cluster="debug", max_batch_bytes=10 * 2**20)
    in_shape = (16, 64, 64)  # 256 KiB per unit
    # Input-only sizing would allow 40 units; a 16x output should cut it ~17x
    b_in_only = runner._batch_size(in_shape, 1000, out_bytes=0)
    b_with_out = runner._batch_size(
        in_shape, 1000, out_bytes=16 * int(np.prod(in_shape)) * 4
    )
    assert b_with_out < b_in_only
    # Even sharding floors the batch at one unit per device; beyond that the
    # memory budget rules.
    assert b_with_out <= max(2, runner.n_devices)

    # eval_shape path: an expanding kernel reports its true output bytes
    class _FakePos:
        pass

    from biahub_tpu.runtime.executor import WorkUnit

    class _Group:
        shape = in_shape
        units = [WorkUnit(0, 0, 0, 0)]

    import jax.numpy as jnp

    expanding = lambda v: jnp.tile(v, (4, 1, 1))  # noqa: E731
    out_bytes = runner._unit_output_bytes(expanding, _Group, None)
    assert out_bytes == 4 * int(np.prod(in_shape)) * 4

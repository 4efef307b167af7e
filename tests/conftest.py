"""Shared fixtures: tiny synthetic OME-Zarr HCS plates and example configs.

Mirrors the reference's test strategy (reference: tests/conftest.py:10-27,
132-249): CI=true forces the in-process debug executor and serial resource
estimates, and JAX runs on a virtual 8-device CPU mesh so multi-chip sharding
is exercised without TPU hardware.
"""

import os

# Must be set before jax initializes its backends. The env var alone is not
# enough when a TPU platform plugin is installed, so pin via jax.config too.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["CI"] = "true"
# Tests assert float-level parity against XLA/scipy references; pin the warp
# matmuls to the f32-mantissa mode (production default is 'high', the 3-term
# bf16 split — its ~1e-5 error is covered by dedicated tolerance tests).
os.environ.setdefault("BIAHUB_TPU_WARP_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import yaml  # noqa: E402

from biahub_tpu.io.ngff import TransformationMeta, open_ome_zarr  # noqa: E402


def _example(settings_name):
    settings_path = f"./settings/{settings_name}.yml"
    with open(settings_path) as f:
        return settings_path, yaml.safe_load(f)


@pytest.fixture(scope="function")
def example_deskew_settings():
    yield _example("example_deskew_settings")


@pytest.fixture(scope="function")
def example_register_settings():
    yield _example("example_registration_settings")


@pytest.fixture(scope="function")
def example_stabilize_timelapse_settings():
    yield _example("example_stabilize_timelapse_settings")


@pytest.fixture(scope="function")
def example_concatenate_settings():
    yield _example("example_concatenate_settings")


@pytest.fixture(scope="function")
def example_stitch_settings():
    yield _example("example_stitch_settings")


@pytest.fixture(scope="function")
def example_deconvolve_settings():
    yield _example("example_deconvolve_settings")


@pytest.fixture(scope="function")
def example_flat_field_settings():
    yield _example("example_flat_field_settings")


@pytest.fixture(scope="function")
def example_process_with_config_settings():
    yield _example("example_process_with_config_settings")


@pytest.fixture()
def sbatch_file(tmp_path):
    filepath = tmp_path / "sbatch.txt"
    with open(filepath, "w") as f:
        f.write("#SBATCH --cpus-per-task=1\n")
        f.write("#SBATCH --array-parallelism=2\n")
        f.write("#LOCAL --cpus-per-task=1\n")
        f.write("#LOCAL --timeout-min=1\n")
    yield filepath


POSITION_LIST = (("A", "1", "0"), ("B", "1", "0"), ("B", "2", "0"))


@pytest.fixture(scope="function")
def example_plate(tmp_path):
    """HCS plate with 3 positions, 6 channels, float32 data of shape (3,6,4,5,6)."""
    plate_path = tmp_path / "plate.zarr"
    plate = open_ome_zarr(
        plate_path,
        layout="hcs",
        mode="w",
        channel_names=["GFP", "RFP", "Phase3D", "Orientation", "Retardance", "Birefringence"],
    )
    # Lateral pixel size matches example_deskew_settings.yml (0.116 um) so
    # deskew does not warn about a config/metadata scale mismatch.
    scale = (1, 1, 1.0, 0.116, 0.116)
    rng = np.random.default_rng(42)
    for row, col, fov in POSITION_LIST:
        pos = plate.create_position(row, col, fov)
        pos.create_image(
            "0",
            rng.uniform(0.0, 255.0, size=(3, 6, 4, 5, 6)).astype(np.float32),
            transform=[TransformationMeta(type="scale", scale=scale)],
        )
    yield plate_path, plate


@pytest.fixture(scope="function")
def example_plate_2(tmp_path):
    """HCS plate with 3 positions, 2 channels, uint16 data of shape (3,2,4,5,6)."""
    plate_path = tmp_path / "plate_2.zarr"
    plate = open_ome_zarr(
        plate_path, layout="hcs", mode="w", channel_names=["GFP", "RFP"]
    )
    rng = np.random.default_rng(7)
    for row, col, fov in POSITION_LIST:
        pos = plate.create_position(row, col, fov)
        pos["0"] = rng.integers(
            100, np.iinfo(np.uint16).max, size=(3, 2, 4, 5, 6), dtype=np.uint16
        )
    yield plate_path, plate


@pytest.fixture(scope="function")
def create_custom_plate():
    """Factory fixture for plates with custom channels/shape."""

    def _create_plate(
        tmp_path,
        position_list=POSITION_LIST,
        channel_names=("GFP", "RFP", "Phase3D"),
        time_points=3,
        z_size=4,
        y_size=5,
        x_size=6,
        version="0.4",
    ):
        plate_path = tmp_path / f"plate_custom_{'-'.join(channel_names)}.zarr"
        plate = open_ome_zarr(
            plate_path, layout="hcs", mode="w", channel_names=channel_names,
            version=version,
        )
        rng = np.random.default_rng(3)
        for row, col, fov in position_list:
            pos = plate.create_position(row, col, fov)
            pos["0"] = rng.integers(
                100,
                np.iinfo(np.uint16).max,
                size=(time_points, len(channel_names), z_size, y_size, x_size),
                dtype=np.uint16,
            )
        return plate_path, plate

    return _create_plate

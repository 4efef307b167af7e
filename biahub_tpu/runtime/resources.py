"""Resource estimation and the RESOURCES stdout contract.

Kept byte-compatible with the reference so Nextflow pipelines that parse the
``RESOURCES:{json}`` line from ``--init`` runs keep working
(reference: biahub/cli/utils.py:37-63,408-486). On TPU the numbers size the
host-side streaming buffers rather than Slurm requests, but the contract — one
JSON payload with cpus / mem_gb / time_minutes — is unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os

import click
import numpy as np

__all__ = ["echo_resources", "estimate_resources", "settings_fingerprint"]


def echo_resources(num_cpus: int, mem_gb: int, time_minutes: int) -> None:
    """Emit the per-position resource request consumed by pipeline runners."""
    payload = {
        "cpus": int(num_cpus),
        "mem_gb": int(mem_gb),
        "time_minutes": int(time_minutes),
    }
    click.echo("RESOURCES:" + json.dumps(payload))


def settings_fingerprint(settings) -> str:
    """Stable short hash of a settings model, used as the resume token."""
    payload = json.dumps(settings.model_dump(mode="json"), sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def estimate_resources(
    shape: tuple[int, int, int, int, int],
    dtype=np.float32,
    ram_multiplier: float = 1.0,
    time_multiplier: float = 1.0,
    max_num_cpus: int = 64,
    min_ram_per_cpu: int = 4,
    min_time_minutes: int = 30,
) -> tuple[int, int, int]:
    """Estimate (time_minutes, num_cpus, gb_ram_per_cpu) for a (T,C,Z,Y,X) volume.

    RAM keys on one ZYX volume (the per-worker working set) and wall-time on
    the number of volumes T*C; ``time_multiplier`` is the per-step calibration
    in minutes/volume. Semantics match the reference exactly so --init emits
    identical numbers (reference: biahub/cli/utils.py:408-486).
    """
    if len(shape) != 5:
        raise ValueError("The shape must be a 5-tuple (T, C, Z, Y, X).")
    if ram_multiplier <= 0 or time_multiplier <= 0:
        raise ValueError("ram_multiplier and time_multiplier must be > 0.")

    T, C, Z, Y, X = shape
    gb_per_element = np.dtype(dtype).itemsize / 2**30
    # In CI/tests run serially: tiny data makes worker startup dominate.
    num_cpus = 1 if os.environ.get("CI") == "true" else min(T * C, max_num_cpus)
    gb_ram_per_volume = Z * Y * X * gb_per_element
    gb_ram_per_cpu = np.ceil(max(min_ram_per_cpu, gb_ram_per_volume * ram_multiplier))

    minutes = max(min_time_minutes, T * C * time_multiplier)
    time_minutes = int(np.ceil(minutes / 10.0) * 10)
    return time_minutes, int(num_cpus), int(gb_ram_per_cpu)

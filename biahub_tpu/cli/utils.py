"""CLI-layer utilities: yaml↔model, output-path mirroring, provenance keys.

Semantics follow the reference (reference: biahub/cli/utils.py) so configs,
provenance metadata, and output layouts round-trip identically.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import yaml

__all__ = [
    "PROVENANCE_METADATA_KEYS",
    "model_to_yaml",
    "yaml_to_model",
    "update_model",
    "get_output_paths",
    "copy_n_paste",
    "copy_n_paste_czyx",
    "get_empty_frame_indices",
]

#: fnmatch allowlist of per-position zattrs keys carried into output stores —
#: the provenance records each step stamps (reference: biahub/cli/utils.py:19-34).
PROVENANCE_METADATA_KEYS = ("biahub-*", "waveorder", "cytoland")


def model_to_yaml(model, yaml_path: Path) -> None:
    """Write a settings model to YAML, dropping None-valued fields."""
    yaml_path = Path(yaml_path)
    if not hasattr(model, "model_dump"):
        raise TypeError("The 'model' object does not have a 'dict()' method.")
    model_dict = model.model_dump()
    clean = {k: v for k, v in model_dict.items() if v is not None}
    with open(yaml_path, "w+") as f:
        yaml.dump(clean, f, default_flow_style=False, sort_keys=False)


def yaml_to_model(yaml_path: Path, model):
    """Load a YAML file into a settings model instance."""
    yaml_path = Path(yaml_path)
    if not callable(getattr(model, "__init__", None)):
        raise TypeError("The provided model must be a class with a callable constructor.")
    try:
        with open(yaml_path) as f:
            raw_settings = yaml.safe_load(f)
    except FileNotFoundError:
        raise FileNotFoundError(f"The YAML file '{yaml_path}' does not exist.") from None
    return model(**raw_settings)


def update_model(model_instance, update_dict):
    """Update a pydantic model, merging nested dicts into nested models."""
    updated = {}
    for key, value in update_dict.items():
        if isinstance(value, dict) and hasattr(model_instance, key):
            nested = getattr(model_instance, key)
            if hasattr(nested, "model_copy"):
                updated[key] = nested.model_copy(update=value)
                continue
        updated[key] = value
    return model_instance.model_copy(update=updated)


def get_output_paths(
    input_paths: list[Path],
    output_zarr_path: Path,
    ensure_unique_positions: bool | None = None,
) -> list[Path]:
    """Mirror input row/col/fov position keys under the output plate path.

    With ensure_unique_positions, duplicate keys get a ``d<n>`` suffix on the
    column part (reference: biahub/cli/utils.py:130-186).
    """
    out_paths = []
    seen: dict[str, int] = {}
    for path in input_paths:
        parts = Path(path).parts[-3:]
        key = "/".join(parts)
        if ensure_unique_positions and key in seen:
            seen[key] += 1
            parts = (parts[0], f"{parts[1]}d{seen[key]}", parts[2])
        elif ensure_unique_positions:
            seen[key] = 0
        out_paths.append(Path(output_zarr_path, *parts))
    return out_paths


def copy_n_paste(zyx_data: np.ndarray, zyx_slicing_params: list) -> np.ndarray:
    """Crop a ZYX array by [z_slice, y_slice, x_slice], zeroing NaNs first."""
    zyx_data = np.nan_to_num(zyx_data, nan=0)
    return zyx_data[
        zyx_slicing_params[0], zyx_slicing_params[1], zyx_slicing_params[2]
    ]


def copy_n_paste_czyx(czyx_data: np.ndarray, czyx_slicing_params: list) -> np.ndarray:
    """Crop a CZYX array by [z_slice, y_slice, x_slice] on the trailing axes."""
    return czyx_data[
        :, czyx_slicing_params[0], czyx_slicing_params[1], czyx_slicing_params[2]
    ]


def append_channels(input_data_path: Path, target_data_path: Path) -> None:
    """Append every channel of one store to the positions of another.

    Mirrors the reference helper (reference: biahub/cli/utils.py:242-267).
    """
    from biahub_tpu.io.ngff import open_ome_zarr

    appending = open_ome_zarr(input_data_path, mode="r")
    appending_names = appending.channel_names
    target = open_ome_zarr(target_data_path, mode="r+")
    for name, position in target.positions():
        target_names = position.channel_names
        num_existing = len(target_names)
        src_pos = appending[name]
        old = position.data[...]
        T, C, Z, Y, X = old.shape
        new = np.zeros((T, C + len(appending_names), Z, Y, X), old.dtype)
        new[:, :C] = old
        for i in range(len(appending_names)):
            position.append_channel(appending_names[i])
            new[:, num_existing + i] = src_pos.data[:, i]
        position.create_image("0", new)


def _is_empty(frame: np.ndarray) -> bool:
    return bool(np.all(np.isnan(frame)) or np.all(frame == 0))


def get_empty_frame_indices(input_array: np.ndarray) -> list[int]:
    """Indices of all-zero or all-NaN Z slices of a 3D array."""
    if input_array.ndim != 3:
        raise ValueError("Input array must be 3D.")
    return [z for z in range(input_array.shape[0]) if _is_empty(input_array[z])]


def get_submitit_cluster(local: bool = False) -> str:
    """Reference-name wrapper (reference: biahub/cli/utils.py:79-92): resolve
    the execution mode; 'debug' under CI, otherwise local/on-device batching."""
    from biahub_tpu.runtime import resolve_cluster

    return resolve_cluster(None, local)


def resolve_ome_zarr_version(path) -> str:
    """Reference-name wrapper: OME-Zarr version of an existing store."""
    from biahub_tpu.io.ngff import get_ome_zarr_version

    return get_ome_zarr_version(path)


# Reference-name compatibility: the reference hosts the resource helpers in
# cli/utils (reference: biahub/cli/utils.py:37-76,408-486); here they live in
# runtime/resources. Re-exported so user scripts resolve unchanged.
from biahub_tpu.runtime.resources import (  # noqa: E402,F401
    echo_resources,
    estimate_resources,
    settings_fingerprint,
)

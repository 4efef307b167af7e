"""Transform QC: outlier validation, interpolation, saving, and shape helpers.

Semantics mirror the reference (reference: biahub/registration/utils.py:
95-369,372-468,858-960): a moving-window mean of accepted transforms is the
reference; a candidate whose grid-point MSE against it exceeds the tolerance
is dropped and later filled by local (or global) interpolation over the 4x4
entries.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Literal

import click
import numpy as np
from scipy.interpolate import interp1d

from biahub_tpu.cli.utils import model_to_yaml
from biahub_tpu.kernels.fft import center_crop, match_shape, pad_to_shape  # noqa: F401

__all__ = [
    "check_transforms_difference",
    "validate_transforms",
    "interpolate_transforms",
    "evaluate_transforms",
    "save_transforms",
    "plot_translations",
    "load_transforms",
    "approx_transform_from_scale",
    "pad_to_shape",
    "center_crop",
    "match_shape",
]


def check_transforms_difference(
    tform1,
    tform2,
    shape_zyx: tuple[int, int, int],
    threshold: float = 5.0,
    verbose: bool = False,
) -> bool:
    """True when the mean displacement of a 10^3 grid under the two transforms
    is within the threshold."""
    tform1 = np.array(tform1)
    tform2 = np.array(tform2)
    Z, Y, X = shape_zyx
    zz, yy, xx = np.meshgrid(
        np.linspace(0, Z - 1, 10), np.linspace(0, Y - 1, 10), np.linspace(0, X - 1, 10)
    )
    grid = np.vstack([zz.ravel(), yy.ravel(), xx.ravel(), np.ones(zz.size)]).T
    p1 = (tform1 @ grid.T).T
    p2 = (tform2 @ grid.T).T
    mse = np.mean(np.linalg.norm(p1[:, :3] - p2[:, :3], axis=1))
    if verbose:
        click.echo(f"MSE of transformed points: {mse:.2f}; threshold: {threshold:.2f}")
    return mse <= threshold


def validate_transforms(
    transforms: list,
    shape_zyx: tuple[int, int, int],
    window_size: int = 10,
    tolerance: float = 100.0,
    verbose: bool = False,
) -> list:
    """Mark outlier transforms as None based on windowed-mean MSE deviation."""
    valid: list = []
    reference = None
    for i, transform in enumerate(transforms):
        if transform is None:
            if verbose:
                click.echo(f"Transform at timepoint {i} is None and will be interpolated")
            continue
        if len(valid) < window_size:
            valid.append(transform)
            reference = np.mean(valid, axis=0)
            if verbose:
                click.echo(f"[Bootstrap] Accepting transform at timepoint {i} (no validation)")
        elif check_transforms_difference(transform, reference, shape_zyx, tolerance, verbose):
            valid.append(transform)
            if len(valid) > window_size:
                valid.pop(0)
            reference = np.mean(valid, axis=0)
            if verbose:
                click.echo(f"Transform at timepoint {i} is valid")
        else:
            transforms[i] = None
            if verbose:
                click.echo(f"Transform at timepoint {i} is invalid and will be interpolated")
    return transforms


def interpolate_transforms(
    transforms: list,
    window_size: int = 3,
    interpolation_type: Literal["linear", "cubic"] = "linear",
    verbose: bool = False,
) -> list:
    """Fill None entries by interpolating the 4x4 entries over time."""
    n = len(transforms)
    valid_indices = [i for i, t in enumerate(transforms) if t is not None]
    valid = [np.array(transforms[i]) for i in valid_indices]
    if len(valid_indices) < 2:
        raise ValueError("At least two valid transforms are required for interpolation.")

    missing = [i for i in range(n) if transforms[i] is None]
    if not missing:
        return transforms
    if verbose:
        click.echo(f"Interpolating missing transforms at timepoints: {missing}")

    if window_size > 0:
        for idx in missing:
            start = max(0, idx - window_size)
            end = min(n, idx + window_size + 1)
            local_x = [j for j in range(start, end) if j in valid_indices]
            local_y = [np.array(transforms[j]) for j in local_x]
            if len(local_x) < 2:
                closest = valid_indices[
                    int(np.argmin(np.abs(np.asarray(valid_indices) - idx)))
                ]
                transforms[idx] = transforms[closest]
                if verbose:
                    click.echo(
                        f"Not enough interpolation neighbors were found for timepoint "
                        f"{idx} using closest valid transform at timepoint {closest}"
                    )
                continue
            kind = interpolation_type if len(local_x) > 3 else "linear"
            f = interp1d(local_x, local_y, axis=0, kind=kind, fill_value="extrapolate")
            transforms[idx] = f(idx).tolist()
            if verbose:
                click.echo(f"Interpolated timepoint {idx} using neighbors: {local_x}")
    else:
        f = interp1d(valid_indices, valid, axis=0, kind="linear", fill_value="extrapolate")
        transforms = [
            f(i).tolist() if transforms[i] is None else transforms[i] for i in range(n)
        ]
    return transforms


def evaluate_transforms(
    transforms,
    shape_zyx: tuple[int, int, int],
    validation_window_size: int = 10,
    validation_tolerance: float = 100.0,
    interpolation_window_size: int = 3,
    interpolation_type: Literal["linear", "cubic"] = "linear",
    verbose: bool = False,
):
    """Validate then interpolate a per-timepoint transform list."""
    if not isinstance(transforms, list):
        transforms = transforms.tolist()
    if len(transforms) < validation_window_size:
        raise Warning(
            f"Not enough transforms for validation and interpolation. "
            f"Required: {validation_window_size}, Provided: {len(transforms)}"
        )
    transforms = validate_transforms(
        transforms=transforms,
        window_size=validation_window_size,
        tolerance=validation_tolerance,
        shape_zyx=shape_zyx,
        verbose=verbose,
    )
    if len(transforms) < interpolation_window_size:
        raise Warning(
            f"Not enough transforms for interpolation. "
            f"Required: {interpolation_window_size}, Provided: {len(transforms)}"
        )
    return interpolate_transforms(
        transforms=transforms,
        window_size=interpolation_window_size,
        interpolation_type=interpolation_type,
        verbose=verbose,
    )


def save_transforms(
    model,
    transforms,
    output_filepath_settings: Path,
    output_filepath_plot: Path | None = None,
    verbose: bool = False,
) -> None:
    """Save per-timepoint transforms into a settings YAML (+ optional plot)."""
    if transforms is None or len(transforms) == 0:
        raise ValueError("Transforms are empty")
    if not isinstance(transforms, list):
        transforms = transforms.tolist()
    model.affine_transform_zyx_list = transforms
    output_filepath_settings = Path(output_filepath_settings)
    if output_filepath_settings.suffix not in (".yml", ".yaml"):
        output_filepath_settings = output_filepath_settings.with_suffix(".yml")
    output_filepath_settings.parent.mkdir(parents=True, exist_ok=True)
    model_to_yaml(model, output_filepath_settings)

    if verbose and output_filepath_plot is not None:
        output_filepath_plot = Path(output_filepath_plot)
        if output_filepath_plot.suffix != ".png":
            output_filepath_plot = output_filepath_plot.with_suffix(".png")
        output_filepath_plot.parent.mkdir(parents=True, exist_ok=True)
        plot_translations(np.asarray(transforms), output_filepath_plot)


def plot_translations(transforms_zyx, output_filepath: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    transforms_zyx = np.asarray(transforms_zyx)
    os.makedirs(Path(output_filepath).parent, exist_ok=True)
    _, axs = plt.subplots(3, 1, figsize=(10, 10))
    axs[0].plot(transforms_zyx[:, 0, 3])
    axs[0].set_title("Z-Translation")
    axs[1].plot(transforms_zyx[:, 2, 3])
    axs[1].set_title("X-Translation")
    axs[2].plot(transforms_zyx[:, 1, 3])
    axs[2].set_title("Y-Translation")
    plt.savefig(output_filepath, dpi=300, bbox_inches="tight")
    plt.close()


def load_transforms(folder: Path, pattern: str = "*.npy") -> dict[str, np.ndarray]:
    """Load per-FOV transform stacks saved as .npy files."""
    out = {}
    for path in sorted(Path(folder).glob(pattern)):
        out[path.stem] = np.load(path)
    return out


def approx_transform_from_scale(
    source_scale_zyx,
    target_scale_zyx,
    rotation_90_count: int = 0,
    flip: tuple[bool, bool, bool] = (False, False, False),
    source_shape_zyx=None,
    target_shape_zyx=None,
) -> np.ndarray:
    """Approximate source→target transform from voxel-size scaling, 90-degree
    in-plane rotation count, and axis flips (reference:
    biahub/registration/utils.py:50-92)."""
    from biahub_tpu.register import (
        get_3D_fliplr_matrix,
        get_3D_rescaling_matrix,
        get_3D_rotation_matrix,
    )

    scale = np.asarray(source_scale_zyx, dtype=float) / np.asarray(
        target_scale_zyx, dtype=float
    )
    out = get_3D_rescaling_matrix(
        source_shape_zyx or (1, 1, 1), scale, target_shape_zyx or source_shape_zyx
    )
    if rotation_90_count:
        out = (
            get_3D_rotation_matrix(
                target_shape_zyx or source_shape_zyx or (1, 1, 1),
                90.0 * rotation_90_count,
            )
            @ out
        )
    if any(flip):
        if flip[-1]:
            out = get_3D_fliplr_matrix(target_shape_zyx or source_shape_zyx or (1, 1, 1)) @ out
    return out


# ---------------------------------------------------------------------------
# Reference-name compatibility re-exports: the reference duplicates these
# helpers in registration/utils.py (reference: biahub/registration/utils.py:
# 523-775, 858-960); here they live in their owning modules and are re-exported
# so scripts written against the reference keep working.
# ---------------------------------------------------------------------------
from biahub_tpu.kernels.fft import (  # noqa: E402
    center_crop,
    match_shape,
    pad_to_shape,
)
from biahub_tpu.register import (  # noqa: E402
    apply_affine_transform,
    find_lir,
    find_overlapping_volume,
    get_3D_fliplr_matrix,
    get_3D_rescaling_matrix,
    get_3D_rotation_matrix,
    rescale_voxel_size,
)

# Reference name for the scale/rotation/flip approximate-transform builder
get_aprox_transform = approx_transform_from_scale


# Reference-name compatibility (reference: biahub/registration/utils.py
# re-exports the register.py converters); shims explain the deliberate delta.
from biahub_tpu.register import (  # noqa: E402,F401
    convert_transform_to_ants,
    convert_transform_to_numpy,
)

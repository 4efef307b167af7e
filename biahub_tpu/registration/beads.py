"""Beads-based registration: detect → match → fit → iterate.

Behavioral re-derivation of the reference pipeline (reference:
biahub/registration/beads.py:59-1119): detect bead peaks in both volumes,
match them with graph matching, fit an affine/euclidean/similarity transform
from the matches, compose with the current warp, and keep whichever scores
better on KD-tree peak overlap — iterating ``qc_settings.iterations`` times.

Convention: every transform handled here is a WARP matrix mapping output
(reference) index coordinates to input (moving) index coordinates — the same
convention as the stabilize/register kernels and the YAML
``affine_transform_zyx`` fields. If F maps moving points to reference points
(the fit direction), the warp correction is F^-1 composed on the right:
W' = W @ F^-1.
"""

from __future__ import annotations

from itertools import product
from pathlib import Path
from typing import Literal

import click
import numpy as np
from scipy.spatial import cKDTree

from biahub_tpu.kernels.affine import affine_warp_auto
from biahub_tpu.kernels.peaks import detect_peaks
from biahub_tpu.settings import (
    AffineTransformSettings,
    BeadsMatchSettings,
    DetectPeaksSettings,
)
from biahub_tpu.transforms.fitting import fit_transform
from biahub_tpu.transforms.graph_matching import Graph, GraphMatcher

__all__ = [
    "peaks_from_beads",
    "matches_from_beads",
    "transform_from_matches",
    "overlap_score",
    "optimize_transform",
    "optimize_matches",
    "estimate",
    "estimate_tzyx",
    "estimate_tczyx",
]


def _warp(mov: np.ndarray, warp_matrix: np.ndarray, out_shape) -> np.ndarray:
    # Concrete matrix: auto dispatch picks the fast factored kernel on TPU.
    return np.asarray(
        affine_warp_auto(
            np.nan_to_num(np.asarray(mov, dtype=np.float32), nan=0),
            np.asarray(warp_matrix, dtype=np.float64),
            tuple(out_shape),
        )
    )


def _all_zeros_or_nan(arr) -> bool:
    arr = np.asarray(arr)
    return bool(np.all(np.isnan(arr)) or np.all(arr == 0))


def peaks_from_beads(
    mov,
    ref,
    mov_peaks_settings: DetectPeaksSettings,
    ref_peaks_settings: DetectPeaksSettings,
    verbose: bool = False,
    mask_path: Path | None = None,
):
    """Detect bead peaks in the moving and reference volumes."""
    if verbose:
        click.echo("Detecting beads in moving dataset")
    mov_peaks = detect_peaks(
        np.asarray(mov),
        block_size=tuple(mov_peaks_settings.block_size),
        threshold_abs=mov_peaks_settings.threshold_abs,
        nms_distance=mov_peaks_settings.nms_distance,
        min_distance=mov_peaks_settings.min_distance,
        verbose=verbose,
    )
    if verbose:
        click.echo("Detecting beads in reference dataset")
    ref_peaks = detect_peaks(
        np.asarray(ref),
        block_size=tuple(ref_peaks_settings.block_size),
        threshold_abs=ref_peaks_settings.threshold_abs,
        nms_distance=ref_peaks_settings.nms_distance,
        min_distance=ref_peaks_settings.min_distance,
        verbose=verbose,
    )
    if verbose:
        click.echo(f"Total of peaks in moving dataset: {len(mov_peaks)}")
        click.echo(f"Total of peaks in reference dataset: {len(ref_peaks)}")
    if len(mov_peaks) < 2 or len(ref_peaks) < 2:
        click.echo("Not enough beads detected")
        return None, None

    if mask_path is not None:
        from biahub_tpu.io.ngff import open_ome_zarr

        click.echo("Filtering peaks with mask")
        mask = np.asarray(open_ome_zarr(mask_path).data[0, 0])
        # Keep only peaks whose (y, x) column is clean across all Z slices
        kept = [
            p
            for p in ref_peaks
            if 0 <= int(p[1]) < mask.shape[1]
            and 0 <= int(p[2]) < mask.shape[2]
            and not mask[:, int(p[1]), int(p[2])].any()
        ]
        ref_peaks = np.array(kept)
    return mov_peaks, ref_peaks


def matches_from_beads(
    mov_peaks,
    ref_peaks,
    beads_match_settings: BeadsMatchSettings,
    verbose: bool = False,
):
    """Match bead peaks: Hungarian graph matching or descriptor matching,
    then geometric filtering."""
    if beads_match_settings.algorithm == "match_descriptor":
        mov_graph = Graph.from_nodes(mov_peaks)
        ref_graph = Graph.from_nodes(ref_peaks)
        md = beads_match_settings.match_descriptor_settings
        matcher = GraphMatcher(
            algorithm="descriptor",
            cross_check=md.cross_check,
            max_ratio=md.max_ratio,
            metric=md.distance_metric,
            verbose=verbose,
        )
        matches = matcher.match(mov_graph, ref_graph)
    else:
        hm = beads_match_settings.hungarian_match_settings
        mov_graph = Graph.from_nodes(mov_peaks, mode="knn", k=hm.edge_graph_settings.k)
        ref_graph = Graph.from_nodes(ref_peaks, mode="knn", k=hm.edge_graph_settings.k)
        matcher = GraphMatcher(
            algorithm="hungarian",
            weights=hm.cost_matrix_settings.weights,
            cost_threshold=hm.cost_threshold,
            cross_check=hm.cross_check,
            max_ratio=hm.max_ratio,
            verbose=verbose,
        )
        matches = matcher.match(mov_graph, ref_graph)

    fm = beads_match_settings.filter_matches_settings
    matches = matcher.filter_matches(
        matches,
        mov_graph,
        ref_graph,
        angle_threshold=fm.angle_threshold,
        min_distance_quantile=fm.min_distance_quantile,
        max_distance_quantile=fm.max_distance_quantile,
        direction_threshold=fm.direction_threshold,
    )
    if verbose:
        click.echo(f"Total of matches: {len(matches)}")
    return matches


def transform_from_matches(
    matches,
    mov_peaks,
    ref_peaks,
    affine_transform_settings: AffineTransformSettings,
    ndim: int = 3,
    verbose: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit the points map mov→ref from matched beads.

    Returns (forward, inverse) homogeneous matrices; the inverse is the warp
    correction to compose onto the current warp.
    """
    if ndim not in (2, 3):
        raise ValueError(f"Peaks must be 2D or 3D, got {ndim}D")
    fwd = fit_transform(
        mov_peaks[matches[:, 0]],
        ref_peaks[matches[:, 1]],
        affine_transform_settings.transform_type,
    )
    return fwd, np.linalg.inv(fwd)


def overlap_score(mov_peaks, ref_peaks, radius: int = 6, verbose: bool = False) -> float:
    """Fraction of reference peaks with a moving peak within ``radius``."""
    if mov_peaks is None or ref_peaks is None or len(mov_peaks) == 0 or len(ref_peaks) == 0:
        click.echo("No peaks found, returning nan metrics")
        return np.nan
    mov_tree = cKDTree(mov_peaks)
    hits = sum(1 for p in ref_peaks if mov_tree.query_ball_point(p, r=radius))
    fraction = hits / max(min(len(mov_peaks), len(ref_peaks)), 1)
    if verbose:
        click.echo(f"Mov peaks: {len(mov_peaks)}")
        click.echo(f"Ref peaks: {len(ref_peaks)}")
        click.echo(f"Peaks overlap fraction: {fraction}")
    return fraction


def optimize_transform(
    transform: np.ndarray,
    mov,
    ref,
    beads_match_settings: BeadsMatchSettings,
    affine_transform_settings: AffineTransformSettings,
    verbose: bool = False,
    debug: bool = False,
) -> tuple[np.ndarray | None, float]:
    """One refinement round; returns the better of (input, corrected) warp."""
    ref = np.asarray(ref, dtype=np.float32)
    mov = np.asarray(mov, dtype=np.float32)

    mov_reg = _warp(mov, transform, ref.shape)
    mov_peaks, ref_peaks = peaks_from_beads(
        mov=mov_reg,
        ref=ref,
        mov_peaks_settings=beads_match_settings.source_peaks_settings,
        ref_peaks_settings=beads_match_settings.target_peaks_settings,
        verbose=debug,
    )
    if mov_peaks is None or ref_peaks is None:
        return None, -1

    radius = beads_match_settings.qc_settings.score_centroid_mask_radius
    score_before = overlap_score(mov_peaks, ref_peaks, radius=radius, verbose=debug)

    matches = matches_from_beads(mov_peaks, ref_peaks, beads_match_settings, verbose=debug)
    if len(matches) < 3:
        click.echo("Not enough matches found, returning the current transform")
        return None, -1

    _, inv = transform_from_matches(
        matches, mov_peaks, ref_peaks, affine_transform_settings, ndim=mov.ndim,
        verbose=debug,
    )
    composed = np.asarray(transform) @ inv

    mov_reg_opt = _warp(mov, composed, ref.shape)
    mov_peaks_opt, ref_peaks_opt = peaks_from_beads(
        mov=mov_reg_opt,
        ref=ref,
        mov_peaks_settings=beads_match_settings.source_peaks_settings,
        ref_peaks_settings=beads_match_settings.target_peaks_settings,
        verbose=debug,
    )
    score_after = overlap_score(mov_peaks_opt, ref_peaks_opt, radius=radius, verbose=debug)

    if verbose:
        click.echo(f"Quality score before beads matching: {score_before}")
        click.echo(f"Quality score after beads matching: {score_after}")

    if not np.isnan(score_after) and score_after >= score_before:
        return composed, score_after
    return np.asarray(transform), score_before


def estimate(
    mov,
    ref,
    beads_match_settings: BeadsMatchSettings,
    affine_transform_settings: AffineTransformSettings,
    verbose: bool = False,
    output_filepath: Path | None = None,
    user_transform=None,
    debug: bool = False,
):
    """Iteratively estimate the best warp between moving and reference volumes."""
    if _all_zeros_or_nan(mov) or _all_zeros_or_nan(ref):
        click.echo("Skipping: moving or reference data contains only NaN/zeros.")
        return None

    initial = np.asarray(affine_transform_settings.approx_transform, dtype=np.float64)
    transform = initial
    qc_iterations = beads_match_settings.qc_settings.iterations
    history: list[tuple[np.ndarray | None, float]] = []

    for iteration in range(qc_iterations):
        click.echo(
            f"Iteration {iteration + 1}/{qc_iterations}: optimizing transform via "
            "bead matching..."
        )
        optimized, score = optimize_transform(
            transform, mov, ref, beads_match_settings, affine_transform_settings,
            verbose=verbose, debug=debug,
        )
        history.append((optimized, score))
        if score == 1:
            break
        transform = optimized

        if user_transform is not None and iteration == 0:
            click.echo("Optimizing user transform:")
            optimized_user, score_user = optimize_transform(
                np.asarray(user_transform, dtype=np.float64),
                mov, ref, beads_match_settings, affine_transform_settings,
                verbose=verbose, debug=debug,
            )
            if score_user > score:
                history[-1] = (optimized_user, score_user)
                if score_user == 1:
                    break
                transform = optimized_user

        if transform is None:
            break

    best_transform, best_score = max(history, key=lambda x: x[1]) if history else (None, -1)
    if best_transform is None:
        best_transform = initial
    if verbose:
        click.echo(f"Best transform:\n{best_transform}")
        click.echo(f"Best quality score: {best_score}")
    if output_filepath:
        click.echo(f"Saving transform to {output_filepath}")
        np.save(output_filepath, np.asarray(best_transform))
    return best_transform


def estimate_tzyx(
    t_idx: int,
    mov_tzyx,
    ref_tzyx,
    beads_match_settings: BeadsMatchSettings,
    affine_transform_settings: AffineTransformSettings,
    verbose: bool = False,
    output_folder_path: Path | None = None,
    mode: Literal["registration", "stabilization"] = "registration",
    user_transform=None,
):
    """Estimate the warp for one timepoint (stabilization picks its own ref)."""
    click.echo("........................................................................")
    click.echo(f"Processing timepoint: {t_idx}")

    mov_zyx = np.asarray(mov_tzyx[t_idx], dtype=np.float32)
    if mode == "stabilization":
        t_ref = (
            0
            if affine_transform_settings.t_reference == "first"
            else max(t_idx - 1, 0)
        )
        ref_zyx = np.asarray(mov_tzyx[t_ref], dtype=np.float32)
    else:
        ref_zyx = np.asarray(ref_tzyx[t_idx], dtype=np.float32)

    output_filepath = None
    if output_folder_path:
        Path(output_folder_path).mkdir(parents=True, exist_ok=True)
        output_filepath = Path(output_folder_path) / f"{t_idx}.npy"

    return estimate(
        mov=mov_zyx,
        ref=ref_zyx,
        beads_match_settings=beads_match_settings,
        affine_transform_settings=affine_transform_settings,
        verbose=verbose,
        output_filepath=output_filepath,
        user_transform=user_transform,
    )


def estimate_tczyx(
    mov_tczyx,
    ref_tczyx,
    mov_channel_index: int,
    ref_channel_index: int | None = None,
    beads_match_settings: BeadsMatchSettings | None = None,
    affine_transform_settings: AffineTransformSettings | None = None,
    verbose: bool = False,
    cluster: str = "local",
    sbatch_filepath: Path | None = None,
    output_folder_path: Path | None = None,
    ref_voxel_size=(0.174, 0.1494, 0.1494),
    mov_voxel_size=(0.174, 0.1494, 0.1494),
    mode: Literal["registration", "stabilization"] = "registration",
) -> list:
    """Per-timepoint beads transforms for a whole (T, C, Z, Y, X) stack."""
    beads_match_settings = beads_match_settings or BeadsMatchSettings()
    affine_transform_settings = affine_transform_settings or AffineTransformSettings()

    class _ChannelView:
        def __init__(self, data, c):
            self._data, self._c = data, c
            self.shape = (data.shape[0],) + tuple(data.shape[2:])
            self.ndim = 4

        def __getitem__(self, t):
            return self._data[t, self._c]

    mov_tzyx = _ChannelView(mov_tczyx, mov_channel_index)
    ref_tzyx = (
        mov_tzyx
        if mode == "stabilization"
        else _ChannelView(ref_tczyx, ref_channel_index)
    )

    if affine_transform_settings.compute_approx_transform:
        from biahub_tpu.registration.utils import approx_transform_from_scale

        approx = approx_transform_from_scale(
            mov_voxel_size,
            ref_voxel_size,
            rotation_90_count=-1,
            source_shape_zyx=mov_tzyx.shape[-3:],
            target_shape_zyx=ref_tzyx.shape[-3:],
        )
        click.echo(f"Computed approx transform: {approx}")
        affine_transform_settings.approx_transform = approx.tolist()

    T = mov_tzyx.shape[0]
    transforms_dir = None
    if output_folder_path is not None:
        transforms_dir = Path(output_folder_path) / "xyz_transforms"
        transforms_dir.mkdir(parents=True, exist_ok=True)

    initial = affine_transform_settings.approx_transform
    transforms: list = []
    for t in range(T):
        if mode == "stabilization" and t == 0:
            transforms.append(np.eye(4).tolist())
            continue
        if _all_zeros_or_nan(mov_tzyx[t]) or _all_zeros_or_nan(ref_tzyx[t]):
            click.echo(f"Timepoint {t} has no data, skipping")
            transforms.append(None)
            continue
        user = initial if affine_transform_settings.use_prev_t_transform else None
        result = estimate_tzyx(
            t_idx=t,
            mov_tzyx=mov_tzyx,
            ref_tzyx=ref_tzyx,
            beads_match_settings=beads_match_settings,
            affine_transform_settings=affine_transform_settings,
            verbose=verbose,
            output_folder_path=transforms_dir,
            mode=mode,
            user_transform=user,
        )
        if result is not None:
            transforms.append(np.asarray(result).tolist())
            if affine_transform_settings.use_prev_t_transform:
                # Propagate: this timepoint's result seeds the next
                affine_transform_settings.approx_transform = np.asarray(result).tolist()
        else:
            transforms.append(None)

    # Fill failed timepoints with identity so downstream QC can interpolate
    transforms = [t if t is not None else np.eye(4).tolist() for t in transforms]
    return transforms


def optimize_matches(
    mov,
    ref,
    approx_transform,
    beads_match_settings: BeadsMatchSettings,
    affine_transform_settings: AffineTransformSettings,
    param_grid: dict | None = None,
    verbose: bool = False,
) -> BeadsMatchSettings:
    """Grid-search matching/filter parameters, scored by bead overlap after
    applying each trial's corrected warp (reference:
    biahub/registration/beads.py:59-237)."""
    if param_grid is None:
        param_grid = {
            "min_distance_quantile": [0, 0.01],
            "max_distance_quantile": [0, 0.99],
            "direction_threshold": [0, 50],
            "k": [5, 10],
        }
    score_radius = beads_match_settings.qc_settings.score_centroid_mask_radius
    approx = np.asarray(approx_transform, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float32)
    mov = np.asarray(mov, dtype=np.float32)

    click.echo("Detecting peaks in approximately registered space for grid search...")
    mov_reg = _warp(mov, approx, ref.shape)
    mov_peaks, ref_peaks = peaks_from_beads(
        mov=mov_reg,
        ref=ref,
        mov_peaks_settings=beads_match_settings.source_peaks_settings,
        ref_peaks_settings=beads_match_settings.target_peaks_settings,
        verbose=False,
    )
    if mov_peaks is None or ref_peaks is None or len(mov_peaks) < 2 or len(ref_peaks) < 2:
        click.echo("Not enough peaks detected for optimization, returning original settings.")
        return beads_match_settings

    grid_keys = list(param_grid.keys())
    grid_values = [param_grid[k] for k in grid_keys]
    click.echo(
        f"Starting grid search: {len(mov_peaks)} mov peaks, {len(ref_peaks)} ref peaks, "
        f"{np.prod([len(v) for v in grid_values])} parameter combinations."
    )

    def apply_trial_params(trial, params):
        fm = trial.filter_matches_settings
        hm = trial.hungarian_match_settings
        w = hm.cost_matrix_settings.weights
        setters = {
            "min_distance_quantile": lambda v: setattr(fm, "min_distance_quantile", v),
            "max_distance_quantile": lambda v: setattr(fm, "max_distance_quantile", v),
            "direction_threshold": lambda v: setattr(fm, "direction_threshold", v),
            "cost_threshold": lambda v: setattr(hm, "cost_threshold", v),
            "max_ratio": lambda v: setattr(hm, "max_ratio", v),
            "k": lambda v: setattr(hm.edge_graph_settings, "k", v),
            "weights_dist": lambda v: w.__setitem__("dist", v),
            "weights_edge_angle": lambda v: w.__setitem__("edge_angle", v),
            "weights_edge_length": lambda v: w.__setitem__("edge_length", v),
            "weights_pca_dir": lambda v: w.__setitem__("pca_dir", v),
            "weights_pca_aniso": lambda v: w.__setitem__("pca_aniso", v),
            "weights_edge_descriptor": lambda v: w.__setitem__("edge_descriptor", v),
        }
        for key, val in params.items():
            if key in setters:
                setters[key](val)

    best_score = -1.0
    best_settings = beads_match_settings
    for combo in product(*grid_values):
        params = dict(zip(grid_keys, combo))
        trial = beads_match_settings.model_copy(deep=True)
        apply_trial_params(trial, params)
        try:
            matches = matches_from_beads(mov_peaks, ref_peaks, trial, verbose=False)
            if len(matches) < 3:
                continue
            _, inv = transform_from_matches(
                matches, mov_peaks, ref_peaks, affine_transform_settings,
                ndim=mov_peaks.shape[1],
            )
            composed = approx @ inv
            mov_reg_opt = _warp(mov, composed, ref.shape)
            peaks_opt = peaks_from_beads(
                mov=mov_reg_opt,
                ref=ref,
                mov_peaks_settings=beads_match_settings.source_peaks_settings,
                ref_peaks_settings=beads_match_settings.target_peaks_settings,
                verbose=False,
            )
            if peaks_opt[0] is None:
                continue
            score = overlap_score(peaks_opt[0], peaks_opt[1], radius=score_radius)
            if np.isnan(score):
                continue
            if verbose:
                click.echo(f"  {params} -> matches={len(matches)}, score={score:.4f}")
            if score > best_score:
                best_score = score
                best_settings = trial
        except Exception as e:  # noqa: BLE001 — a failed trial just scores 0
            if verbose:
                click.echo(f"  {params} -> failed: {e}")
            continue

    if verbose:
        click.echo(f"Best score: {best_score:.4f}")
    return best_settings


def _with_propagation_flag(kwargs, flag: bool):
    settings = kwargs.get("affine_transform_settings") or AffineTransformSettings()
    settings = settings.model_copy(update={"use_prev_t_transform": flag})
    kwargs["affine_transform_settings"] = settings
    return kwargs


def estimate_with_propagation(*args, **kwargs):
    """Reference-name wrapper: sequential per-timepoint estimation where each
    result seeds the next (reference: biahub/registration/beads.py:300-560)."""
    return estimate_tczyx(*args, **_with_propagation_flag(kwargs, True))


def estimate_independently(*args, **kwargs):
    """Reference-name wrapper: per-timepoint estimation from scratch."""
    return estimate_tczyx(*args, **_with_propagation_flag(kwargs, False))

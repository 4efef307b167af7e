"""Segmentation + frame-to-frame linking for 2D/3D time-lapse tracking.

A from-scratch tracking engine replacing the reference's ultrack dependency
(reference: biahub/track.py:406-477): the foreground+contour pair becomes
instance labels via marker seeding (low-contour cores) and a nearest-marker
Voronoi split of merged blobs, then frames are linked into tracks with a
confidence-gated Hungarian assignment on centroid distance and size change.
Output: per-frame relabeled instance masks consistent over time plus a tracks
table with ultrack-compatible columns
(track_id, parent_track_id, t, z, y, x, id, parent_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from scipy import ndimage
from scipy.optimize import linear_sum_assignment

__all__ = [
    "segment_foreground_contour",
    "link_labels",
    "track_from_foreground_contour",
    "track_from_labels",
]


def _segment_frame(foreground: np.ndarray, contour: np.ndarray, min_size: int) -> np.ndarray:
    """Instance labels for one frame (2D or 3D arrays)."""
    foreground = np.asarray(foreground) > 0.5
    if not foreground.any():
        return np.zeros(foreground.shape, np.int32)
    contour = np.asarray(contour, dtype=np.float32)

    # Seeds: low-contour cores inside the foreground
    inside = contour[foreground]
    seed_threshold = np.quantile(inside, 0.3)
    seeds = foreground & (contour <= seed_threshold)
    markers, n = ndimage.label(seeds)
    if n == 0:
        markers, n = ndimage.label(foreground)
        return markers.astype(np.int32)

    # Voronoi split: each foreground voxel takes the nearest marker's label
    _, nearest = ndimage.distance_transform_edt(markers == 0, return_indices=True)
    labels = markers[tuple(nearest)]
    labels[~foreground] = 0

    # Drop tiny fragments
    if min_size > 1:
        counts = np.bincount(labels.ravel())
        small = np.where(counts < min_size)[0]
        if len(small):
            labels[np.isin(labels, small)] = 0
    return labels.astype(np.int32)


def segment_foreground_contour(
    foreground: np.ndarray,
    contour: np.ndarray,
    min_size: int = 4,
) -> np.ndarray:
    """Per-frame instance segmentation of (T, [Z,] Y, X) foreground+contour."""
    foreground = np.asarray(foreground)
    contour = np.asarray(contour)
    return np.stack(
        [
            _segment_frame(foreground[t], contour[t], min_size)
            for t in range(foreground.shape[0])
        ]
    )


def _frame_regions(labels: np.ndarray, scale) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ids, centroids(zyx/yx in physical units), sizes) for one label frame."""
    ids = np.unique(labels)
    ids = ids[ids != 0]
    if len(ids) == 0:
        return ids, np.zeros((0, labels.ndim)), np.zeros(0)
    centroids = np.asarray(ndimage.center_of_mass(labels > 0, labels, ids))
    centroids = centroids * np.asarray(scale)[-labels.ndim :]
    sizes = ndimage.sum_labels(np.ones_like(labels), labels, ids)
    return ids, centroids, sizes


def link_labels(
    labels_tzyx: np.ndarray,
    scale=(1.0, 1.0, 1.0),
    max_distance: float = 50.0,
    size_weight: float = 0.2,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Link per-frame instance labels into temporally consistent tracks.

    Consecutive frames are matched with a padded Hungarian assignment; the
    cost is the centroid distance (physical units) plus a relative size-change
    penalty, gated at ``max_distance``. Unmatched detections start new tracks.
    Returns (relabeled stack, tracks dataframe).
    """
    labels_tzyx = np.asarray(labels_tzyx)
    T = labels_tzyx.shape[0]
    spatial_ndim = labels_tzyx.ndim - 1

    out = np.zeros_like(labels_tzyx, dtype=np.uint32)
    rows = []
    next_track = 1
    next_node = 1
    prev: dict[int, dict] = {}  # track_id -> {centroid, size, node_id}
    track_parent: dict[int, int] = {}  # track_id -> parent track (-1 = root)

    for t in range(T):
        ids, centroids, sizes = _frame_regions(labels_tzyx[t], scale)
        assignments: dict[int, int] = {}  # region idx -> track_id
        parents: dict[int, tuple[int, int]] = {}  # region idx -> (parent tid, nid)

        if prev and len(ids):
            prev_tids = list(prev)
            prev_centroids = np.asarray([prev[k]["centroid"] for k in prev_tids])
            prev_sizes = np.asarray([prev[k]["size"] for k in prev_tids])
            dist = np.linalg.norm(
                prev_centroids[:, None, :] - centroids[None, :, :], axis=-1
            )
            size_penalty = (
                np.abs(prev_sizes[:, None] - sizes[None, :])
                / np.maximum(prev_sizes[:, None], 1)
            )
            cost = dist + size_weight * max_distance * size_penalty
            cost = np.where(dist <= max_distance, cost, 1e9)
            r, c = linear_sum_assignment(
                np.pad(cost, ((0, cost.shape[1]), (0, cost.shape[0])),
                       constant_values=1e9)
                if cost.shape[0] != cost.shape[1]
                else cost
            )
            for i, j in zip(r, c):
                if i < cost.shape[0] and j < cost.shape[1] and cost[i, j] < 1e9:
                    tid = prev_tids[i]
                    assignments[j] = tid
                    parents[j] = (tid, prev[tid]["node_id"])

            # Division detection (ultrack convention): an unmatched detection
            # near an already-matched previous track is a second daughter —
            # the parent track ends and BOTH daughters start new tracks with
            # parent_track_id/parent_id pointing at it.
            division_children: dict[int, list[int]] = {}  # prev idx -> regions
            for j in range(len(ids)):
                if j in assignments:
                    continue
                nearest = int(np.argmin(dist[:, j]))
                if dist[nearest, j] <= max_distance and prev_tids[nearest] in (
                    assignments.get(jj) for jj in assignments
                ):
                    division_children.setdefault(nearest, []).append(j)
            for i, extra in division_children.items():
                tid = prev_tids[i]
                matched = [jj for jj, t_ in assignments.items() if t_ == tid]
                for j in matched + extra:
                    assignments.pop(j, None)
                    parents[j] = (tid, prev[tid]["node_id"])

        new_prev: dict[int, dict] = {}
        for j, region_id in enumerate(ids):
            if j in assignments:
                # Continuing node: the track keeps its original parent track
                tid = assignments[j]
                parent_tid = track_parent.get(tid, -1)
                parent_nid = parents[j][1]
            elif j in parents:  # division daughter: fresh track, parent kept
                tid = next_track
                next_track += 1
                parent_tid, parent_nid = parents[j]
                track_parent[tid] = parent_tid
            else:
                tid = next_track
                next_track += 1
                parent_tid, parent_nid = -1, -1
                track_parent[tid] = -1
            nid = next_node
            next_node += 1
            out[t][labels_tzyx[t] == region_id] = tid
            centroid = centroids[j]
            z = float(centroid[0]) if spatial_ndim == 3 else 0.0
            y = float(centroid[-2])
            x = float(centroid[-1])
            rows.append(
                {
                    "track_id": tid,
                    "parent_track_id": parent_tid,
                    "t": t,
                    "z": z,
                    "y": y,
                    "x": x,
                    "id": nid,
                    "parent_id": parent_nid,
                }
            )
            new_prev[tid] = {"centroid": centroids[j], "size": sizes[j], "node_id": nid}
        prev = new_prev

    tracks_df = pd.DataFrame(
        rows, columns=["track_id", "parent_track_id", "t", "z", "y", "x", "id", "parent_id"]
    )
    return out, tracks_df


def track_from_foreground_contour(
    foreground: np.ndarray,
    contour: np.ndarray,
    scale=(1.0, 1.0, 1.0),
    max_distance: float = 50.0,
    min_size: int = 4,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Full pipeline: foreground+contour → instances → linked tracks."""
    labels = segment_foreground_contour(foreground, contour, min_size=min_size)
    return link_labels(labels, scale=scale, max_distance=max_distance)


def track_from_labels(
    labels: np.ndarray,
    scale=(1.0, 1.0, 1.0),
    max_distance: float = 50.0,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Link precomputed instance labels (e.g. from cellpose) into tracks."""
    return link_labels(labels, scale=scale, max_distance=max_distance)

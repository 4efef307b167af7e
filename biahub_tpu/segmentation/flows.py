"""Cellpose-style flow dynamics: masks -> flows, flow following, flows -> masks.

The cellpose package reconstructs instance masks from a network that predicts
a 2D flow field pointing at each cell's center plus a cell probability
(cellpose ``dynamics.py``; the reference consumes it wholesale via
``CellposeModel.eval``, reference: biahub/segment.py:92-99). This module
re-implements that pipeline natively:

- :func:`masks_to_flows` — ground-truth flows from labels by heat diffusion
  from each cell's center (used by the flow-error QC and the test suite).
- :func:`follow_flows` — jitted JAX Euler integration of every foreground
  pixel along the predicted flow field. Bilinear flow sampling is a gather,
  which TPUs dislike on the minor axis — but segmentation is minutes-per-
  plate work dominated by the CPnet conv stack, so the simple formulation is
  deliberate (the MXU does the heavy lifting in the network itself).
- :func:`get_masks` — histogram clustering of the converged pixel positions
  (seeds = local maxima of the arrival density, grown over dense bins).
- :func:`compute_masks` — the full postprocess: threshold cellprob, follow
  flows, cluster, flow-error QC, remove small masks, fill holes.

Conventions match cellpose: the network emits ``5 * flow`` (training target
scaling), so integration steps use ``dP / 5``; ``cellprob`` is a logit
thresholded directly (default 0.0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

__all__ = ["masks_to_flows", "follow_flows", "get_masks", "compute_masks"]


def _cpu_device():
    """The host CPU jax device, if the CPU backend is registered.

    The Euler integration is 200 sequential bilinear gathers — minor-axis
    gathers are ~160x off TPU speed-of-light (CLAUDE.md), and each step is
    tiny, so the host CPU wins by a wide margin; pin it there when possible.
    """
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def masks_to_flows(masks: np.ndarray) -> np.ndarray:
    """Flows (2, H, W) from an instance label image by center heat diffusion.

    For each label: diffuse heat from the cell's median pixel inside its
    bounding box (n_iter ~ 2x its diameter), take the gradient of
    ``log(1 + T)``, and L2-normalise per pixel. Background flow is zero.
    """
    masks = np.asarray(masks)
    H, W = masks.shape
    flows = np.zeros((2, H, W), np.float32)
    slices = ndimage.find_objects(masks)
    for label, slc in enumerate(slices, start=1):
        if slc is None:
            continue
        sy, sx = slc
        h, w = sy.stop - sy.start + 2, sx.stop - sx.start + 2
        inside = np.zeros((h, w), bool)
        inside[1:-1, 1:-1] = masks[sy, sx] == label
        ys, xs = np.nonzero(inside)
        if len(ys) == 0:
            continue
        my, mx = int(np.median(ys)), int(np.median(xs))
        # snap the seed onto the mask if the median fell outside it
        if not inside[my, mx]:
            k = np.argmin((ys - my) ** 2 + (xs - mx) ** 2)
            my, mx = int(ys[k]), int(xs[k])
        T = np.zeros((h, w), np.float64)
        n_iter = 2 * int(np.ptp(ys) + np.ptp(xs)) + 5
        for _ in range(n_iter):
            T[my, mx] += 1.0
            T = ndimage.uniform_filter(T, size=3, mode="constant")
            T *= inside
        T = np.log1p(T)
        dy = (np.roll(T, -1, axis=0) - np.roll(T, 1, axis=0)) / 2.0
        dx = (np.roll(T, -1, axis=1) - np.roll(T, 1, axis=1)) / 2.0
        norm = np.sqrt(dy**2 + dx**2) + 1e-20
        flows[0, sy, sx][inside[1:-1, 1:-1]] = (dy / norm)[inside].astype(np.float32)
        flows[1, sy, sx][inside[1:-1, 1:-1]] = (dx / norm)[inside].astype(np.float32)
    return flows


@partial(jax.jit, static_argnames=("niter",))
def follow_flows(dP: jax.Array, foreground: jax.Array, niter: int = 200) -> jax.Array:
    """Integrate pixel positions along a flow field.

    Parameters
    ----------
    dP : (2, H, W) flow field (already divided by the network's 5x scaling
        and masked to the foreground).
    foreground : (H, W) bool — pixels to move; background pixels stay put.
    niter : Euler steps.

    Returns (2, H, W) final float positions of every pixel.
    """
    _, H, W = dP.shape
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    p0 = jnp.stack([gy, gx])
    fg = foreground.astype(jnp.float32)[None]

    def step(p, _):
        vy = jax.scipy.ndimage.map_coordinates(dP[0], [p[0], p[1]], order=1)
        vx = jax.scipy.ndimage.map_coordinates(dP[1], [p[0], p[1]], order=1)
        v = jnp.stack([vy, vx])
        p = p + v * fg
        p = jnp.stack(
            [jnp.clip(p[0], 0.0, H - 1.0), jnp.clip(p[1], 0.0, W - 1.0)]
        )
        return p, None

    p, _ = jax.lax.scan(step, p0, None, length=niter)
    return p


def get_masks(
    p: np.ndarray,
    foreground: np.ndarray,
    h_seed_min: float = 10.0,
    grow_iters: int = 5,
) -> np.ndarray:
    """Cluster converged pixel positions into instance labels.

    Histogram the final positions of foreground pixels; seeds are local
    maxima of the arrival density with at least ``h_seed_min`` arrivals
    (scaled down for small images); seed regions grow ``grow_iters`` times
    into neighbouring bins holding >2 arrivals; each foreground pixel takes
    the label its converged position lands on.
    """
    foreground = np.asarray(foreground, bool)
    H, W = foreground.shape
    py = np.clip(np.round(np.asarray(p[0])), 0, H - 1).astype(np.int64)
    px = np.clip(np.round(np.asarray(p[1])), 0, W - 1).astype(np.int64)
    ys, xs = np.nonzero(foreground)
    if len(ys) == 0:
        return np.zeros((H, W), np.uint32)
    fy, fx = py[ys, xs], px[ys, xs]
    h = np.zeros((H, W), np.float32)
    np.add.at(h, (fy, fx), 1.0)
    seed_min = min(h_seed_min, max(2.0, 0.1 * float(h.max())))
    hmax = ndimage.maximum_filter(h, size=5)
    seed_mask = (h >= hmax) & (h > seed_min)
    labels, n = ndimage.label(seed_mask, structure=np.ones((3, 3)))
    if n == 0:
        return np.zeros((H, W), np.uint32)
    dense = h > 2.0
    for _ in range(grow_iters):
        grown = ndimage.maximum_filter(labels, size=3)
        labels = np.where((labels == 0) & dense, grown, labels)
    masks = np.zeros((H, W), np.uint32)
    masks[ys, xs] = labels[fy, fx]
    return masks


def _fill_holes_and_filter(
    masks: np.ndarray, min_size: int = 15
) -> np.ndarray:
    """Fill holes per label, drop labels below ``min_size``, renumber 1..N."""
    out = np.zeros_like(masks, dtype=np.uint32)
    next_label = 1
    for label, slc in enumerate(ndimage.find_objects(masks), start=1):
        if slc is None:
            continue
        region = masks[slc] == label
        if region.sum() < min_size:
            continue
        region = ndimage.binary_fill_holes(region)
        out[slc][region] = next_label
        next_label += 1
    return out


def flow_error(masks: np.ndarray, dP_net: np.ndarray) -> np.ndarray:
    """Per-label MSE between network flows and flows recomputed from masks.

    ``dP_net`` is the raw network output (5x-scaled). Matches cellpose's QC
    metric: labels whose shape is inconsistent with the predicted flow field
    score high and get dropped by ``flow_threshold``.
    """
    n = int(masks.max())
    if n == 0:
        return np.zeros(0, np.float32)
    dP_masks = masks_to_flows(masks)
    err2 = ((dP_masks - np.asarray(dP_net, np.float32) / 5.0) ** 2).sum(axis=0)
    sums = ndimage.sum_labels(err2, labels=masks, index=np.arange(1, n + 1))
    counts = ndimage.sum_labels(
        np.ones_like(err2), labels=masks, index=np.arange(1, n + 1)
    )
    return (sums / np.maximum(counts, 1)).astype(np.float32)


def compute_masks(
    dP: np.ndarray,
    cellprob: np.ndarray,
    cellprob_threshold: float = 0.0,
    flow_threshold: float | None = 0.4,
    min_size: int = 15,
    niter: int = 200,
) -> np.ndarray:
    """Network output (flows 2xHxW + cellprob HxW) -> instance labels HxW."""
    foreground = np.asarray(cellprob) > cellprob_threshold
    if not foreground.any():
        return np.zeros(foreground.shape, np.uint32)
    dP_masked = (np.asarray(dP, np.float32) / 5.0) * foreground[None]
    cpu = _cpu_device()
    if cpu is not None:
        with jax.default_device(cpu):
            p = follow_flows(
                jax.device_put(dP_masked, cpu), jax.device_put(foreground, cpu),
                niter=niter,
            )
    else:
        p = follow_flows(jnp.asarray(dP_masked), jnp.asarray(foreground), niter=niter)
    masks = get_masks(np.asarray(p), foreground)
    if flow_threshold is not None and masks.max() > 0:
        errors = flow_error(masks, dP)
        bad = np.nonzero(errors > flow_threshold)[0] + 1
        if len(bad):
            masks[np.isin(masks, bad)] = 0
    return _fill_holes_and_filter(masks, min_size=min_size)

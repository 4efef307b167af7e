"""Device-side stitch blending: weight maps + weighted accumulate as one jit.

The reference blends mosaic chunks on the host (reference:
biahub/stitch.py:199-314): per contributing FOV, scatter the shared
distance-transform map into a chunk-shaped weight array, raise to the
blending exponent, normalize, and multiply-accumulate every (t, c) read.
At plate scale that per-chunk host math saturates the assembly thread pool
(bench.py's stitch_blend_ms measured ~50 ms/chunk of pure NumPy).

TPU-first version: the per-FOV weight map is a WINDOW of the shared
distance map at the FOV's offset — so a zero-padded copy of the distance
map turns the host scatter into one ``lax.dynamic_slice`` per FOV, and the
whole blend (power, normalize, accumulate over FOVs) compiles into one XLA
program. Only the offsets are traced, so one compiled program serves every
chunk of a (n_fov, chunk_shape, T, C) signature.

The data boxes still arrive from tensorstore as ragged overlap reads; the
host pads them into the dense (n, T, C, chunk) stack (a memcpy — cheap next
to the arithmetic it replaces). ``BIAHUB_TPU_HOST_BLEND=1`` restores the
NumPy path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["blend_chunk", "pad_distance_map"]


def pad_distance_map(
    centered_distance: np.ndarray, chunk_extent: tuple[int, int, int]
) -> np.ndarray:
    """Zero-pad the shared FOV distance map by the chunk extent on every
    side, so any chunk-vs-FOV offset becomes an in-bounds dynamic_slice
    (out-of-overlap voxels read the zero padding = zero weight)."""
    cz, cy, cx = (int(c) for c in chunk_extent)
    return np.pad(
        np.asarray(centered_distance, np.float32),
        ((cz, cz), (cy, cy), (cx, cx)),
    )


@partial(jax.jit, static_argnames=("chunk_extent", "exponent"))
def _blend(padded_distance, offsets, data_stack, chunk_extent, exponent):
    """offsets: (n, 3) int32 chunk_corner - fov_corner (+pad, pre-added);
    data_stack: (n, T, C, cz, cy, cx) zero-padded overlap reads."""

    def window(off):
        return jax.lax.dynamic_slice(padded_distance, tuple(off), chunk_extent)

    maps = jax.vmap(window)(offsets)  # (n, cz, cy, cx)
    if exponent == 1.0:
        w = maps
    elif exponent == 0.0:
        w = (maps > 0).astype(jnp.float32)
    else:
        w = jnp.where(maps > 0, jnp.power(maps, exponent), 0.0)
    w = w / (jnp.sum(w, axis=0, keepdims=True) + 1e-8)
    return jnp.einsum(
        "nzyx,ntczyx->tczyx", w, data_stack,
        preferred_element_type=jnp.float32,
    )


def blend_chunk(
    centered_distance_padded: np.ndarray | jax.Array,
    fov_offsets: np.ndarray,
    data_stack: np.ndarray,
    blending_exponent: float = 1.0,
    pad_extent: tuple[int, int, int] | None = None,
) -> np.ndarray:
    """Blend one output chunk from its contributing FOV reads.

    ``centered_distance_padded``: :func:`pad_distance_map` result (device-
    resident across chunks when the caller device_puts it once).
    ``fov_offsets``: (n, 3) int per-FOV ``moving.start - fixed.start`` from
    ``overlap_slices`` — the chunk-local -> FOV-local index shift, so the
    device windows reproduce the host scatter's truncation behavior on
    fractional corners exactly (the ``pad_extent`` shift is added here;
    defaults to this chunk's extent).
    ``data_stack``: (n, T, C, cz, cy, cx) with each FOV's overlap read
    scattered into its chunk-frame box and zeros elsewhere.
    """
    n, t, c, cz, cy, cx = data_stack.shape
    chunk_extent = (cz, cy, cx)
    # The pad shift must match what pad_distance_map was called with; ragged
    # edge chunks reuse a map padded by the NOMINAL chunk shape (windows
    # stay in bounds because their extent is smaller).
    pad = np.asarray(pad_extent if pad_extent is not None else chunk_extent)
    offsets = (np.asarray(fov_offsets, np.int64) + pad).astype(np.int32)
    out = _blend(
        jnp.asarray(centered_distance_padded),
        jnp.asarray(offsets),
        jnp.asarray(data_stack),
        chunk_extent,
        float(blending_exponent),
    )
    return np.asarray(out)

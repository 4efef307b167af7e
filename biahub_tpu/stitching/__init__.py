"""Tile stitching: pairwise PCC shifts and global position optimization.

Replaces the reference's vendored dexp-derived stitcher (reference:
biahub/vendor/stitch/) with a compact re-derivation: grid adjacency from
``RRRCCC`` FOV names, Hanning-windowed phase correlation on overlap strips
(device FFTs), peak-isolation confidence, and a robust global least-squares
position solve per axis.
"""

from biahub_tpu.stitching.tile import (
    optimal_positions,
    pairwise_shifts,
    parse_grid_coords,
    register_translation_nd,
)

__all__ = [
    "optimal_positions",
    "pairwise_shifts",
    "parse_grid_coords",
    "register_translation_nd",
]

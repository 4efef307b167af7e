"""Largest interior rectangle of a binary mask.

Replaces the ``largestinteriorrectangle`` dependency the reference uses for
overlap cropping (reference: biahub/register.py:287-345). Classic
histogram-stack algorithm, O(H*W).
"""

from __future__ import annotations

import numpy as np

__all__ = ["largest_interior_rectangle", "lir"]


def largest_interior_rectangle(mask: np.ndarray) -> tuple[int, int, int, int]:
    """Largest axis-aligned all-True rectangle of a 2D boolean mask.

    Returns (x, y, width, height) with x = column of the left edge and
    y = row of the top edge — the same convention as ``lir.lir``.
    """
    mask = np.asarray(mask, dtype=bool)
    h, w = mask.shape

    from biahub_tpu._native import lir_2d as native_lir

    native = native_lir(mask)
    if native is not None:
        return native

    best_area = 0
    best = (0, 0, 0, 0)
    heights = np.zeros(w, dtype=np.int64)

    for row in range(h):
        heights = np.where(mask[row], heights + 1, 0)
        # Largest rectangle in histogram via a monotonic stack
        stack: list[int] = []
        col = 0
        while col <= w:
            cur = heights[col] if col < w else 0
            if not stack or cur >= heights[stack[-1]]:
                stack.append(col)
                col += 1
            else:
                top = stack.pop()
                width = col if not stack else col - stack[-1] - 1
                area = int(heights[top]) * width
                if area > best_area:
                    best_area = area
                    left = 0 if not stack else stack[-1] + 1
                    best = (left, row - int(heights[top]) + 1, width, int(heights[top]))
    return best


# Alias matching the lir package's entry point
lir = largest_interior_rectangle

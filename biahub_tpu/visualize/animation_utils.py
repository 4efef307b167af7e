"""napari overlay/recording helpers and non-GUI visualization math.

Mirrors the reference's animation utilities (reference:
biahub/visualize/animation_utils.py:19-438). The pure-array functions
(contour extraction, contrast suggestion) run anywhere; the napari-dependent
overlay/recording helpers import napari lazily and raise a clear error when
it is unavailable (headless TPU runs).
"""

from __future__ import annotations

from enum import Enum

import numpy as np
from scipy import ndimage

__all__ = [
    "ElementPosition",
    "get_contours",
    "suggest_contrast_limits",
    "add_scale_bar",
    "add_text_overlay",
    "simple_recording",
]


class ElementPosition(Enum):
    TOP_LEFT = "top_left"
    TOP_RIGHT = "top_right"
    BOTTOM_LEFT = "bottom_left"
    BOTTOM_RIGHT = "bottom_right"


def get_contours(labels: np.ndarray, thickness: int = 1, background_label: int = 0):
    """Contour mask of a label image: labeled pixels whose eroded interior
    differs (reference: biahub/visualize/animation_utils.py:19-47)."""
    labels = np.asarray(labels)
    structure = np.ones((3,) * labels.ndim, dtype=bool)
    eroded = labels.copy()
    for _ in range(thickness):
        eroded = ndimage.grey_erosion(eroded, footprint=structure)
    contours = np.where(labels != eroded, labels, background_label)
    contours[labels == background_label] = background_label
    return contours


def suggest_contrast_limits(intensity_array: np.ndarray) -> tuple[float, float]:
    """Robust display range: the 1st and 99.9th percentiles."""
    data = np.asarray(intensity_array).ravel()
    low, high = np.percentile(data, [1.0, 99.9])
    return float(low), float(high)


def _require_napari():
    try:
        import napari  # type: ignore

        return napari
    except ImportError:
        raise RuntimeError(
            "napari is required for interactive overlays/recordings and is not "
            "installed in this headless build."
        ) from None


def add_scale_bar(viewer, pixel_size_um: float, position=ElementPosition.BOTTOM_RIGHT):
    """Enable napari's scale bar in micrometers."""
    _require_napari()
    viewer.scale_bar.visible = True
    viewer.scale_bar.unit = "um"
    return viewer


def add_text_overlay(viewer, text: str, position=ElementPosition.TOP_LEFT):
    """Add a text overlay that tracks the current timepoint."""
    _require_napari()
    viewer.text_overlay.visible = True
    viewer.text_overlay.text = text
    return viewer


def simple_recording(viewer, output_path, n_frames: int, fps: int = 10):
    """Record a dims sweep to a movie (requires napari-animation)."""
    napari = _require_napari()
    try:
        from napari_animation import Animation  # type: ignore
    except ImportError:
        raise RuntimeError("napari-animation is required for movie recording.") from None
    animation = Animation(viewer)
    for t in range(n_frames):
        viewer.dims.set_point(0, t)
        animation.capture_keyframe()
    animation.animate(output_path, fps=fps)

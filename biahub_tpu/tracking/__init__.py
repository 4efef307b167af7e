"""Native object tracking engine (the framework's ultrack replacement)."""

from biahub_tpu.tracking.engine import (
    link_labels,
    segment_foreground_contour,
    track_from_foreground_contour,
    track_from_labels,
)

__all__ = [
    "link_labels",
    "segment_foreground_contour",
    "track_from_foreground_contour",
    "track_from_labels",
]

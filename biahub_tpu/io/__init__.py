"""OME-Zarr HCS data plane built on tensorstore (native C++ chunked-array I/O).

Replaces the reference's iohub dependency (reference: biahub/deskew.py:12-13)
with a purpose-built layer: the same plate/position model and idempotent
``create_empty_plate``, backed by tensorstore so chunk encode/decode and file
I/O run in native threads that overlap with TPU compute.
"""

from biahub_tpu.io.ngff import (
    ImageArray,
    Plate,
    Position,
    TransformationMeta,
    create_empty_plate,
    open_ome_zarr,
)
from biahub_tpu.io.progress import ProgressStore

__all__ = [
    "ImageArray",
    "Plate",
    "Position",
    "TransformationMeta",
    "create_empty_plate",
    "open_ome_zarr",
    "ProgressStore",
]

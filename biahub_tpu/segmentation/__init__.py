"""TPU-native segmentation engine (CPnet + flow dynamics).

Replaces the reference's cellpose dependency (reference: biahub/segment.py:36)
with an in-repo flax CPnet (models/cpnet.py) and a JAX/NumPy re-implementation
of the flow-following mask reconstruction (flows.py, engine.py).
"""

from biahub_tpu.segmentation.engine import cpnet_segment_czyx
from biahub_tpu.segmentation.flows import (
    compute_masks,
    follow_flows,
    get_masks,
    masks_to_flows,
)

__all__ = [
    "cpnet_segment_czyx",
    "compute_masks",
    "follow_flows",
    "get_masks",
    "masks_to_flows",
]

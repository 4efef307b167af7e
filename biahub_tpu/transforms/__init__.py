"""Host-side geometric transform libraries.

Transforms on point sets and 4x4 matrices are tiny (a few KB) — they stay in
NumPy on the host; only volume resampling runs on device through
:mod:`biahub_tpu.kernels.affine`.
"""

from biahub_tpu.transforms.transform import Transform
from biahub_tpu.transforms.fitting import (
    fit_transform,
    fit_affine,
    fit_euclidean,
    fit_similarity,
)
from biahub_tpu.transforms.lir import largest_interior_rectangle

__all__ = [
    "Transform",
    "fit_transform",
    "fit_affine",
    "fit_euclidean",
    "fit_similarity",
    "largest_interior_rectangle",
]

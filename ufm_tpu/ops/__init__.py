"""TPU-first tensor ops: resize, grid-sample, attention, refinement kernels."""

from ufm_tpu.ops.grid_sample import grid_sample
from ufm_tpu.ops.resize import (
    resize_chw,
    resize_hwc,
    resize_matrix,
    resize_nearest_chw,
    resize_nearest_hwc,
)

__all__ = [
    "grid_sample",
    "resize_chw",
    "resize_hwc",
    "resize_matrix",
    "resize_nearest_chw",
    "resize_nearest_hwc",
]

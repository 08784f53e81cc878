from scflow_tpu.ops.sampling import grid_sample, sample_at_pixels
from scflow_tpu.ops.resize import interpolate_bilinear, avg_pool2, resize_align_corners
from scflow_tpu.ops.corr import correlation_pyramid, corr_lookup
from scflow_tpu.ops.upsample import convex_upsample, unfold3x3
from scflow_tpu.ops.knn import nn_points
from scflow_tpu.ops.warp import backward_warp

__all__ = [
    "grid_sample",
    "sample_at_pixels",
    "interpolate_bilinear",
    "avg_pool2",
    "resize_align_corners",
    "correlation_pyramid",
    "corr_lookup",
    "convex_upsample",
    "unfold3x3",
    "nn_points",
    "backward_warp",
]

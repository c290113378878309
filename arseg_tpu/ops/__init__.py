from arseg_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    adaptive_avg_pool,
    adaptive_max_pool_11,
    pixel_shuffle,
)
from arseg_tpu.ops.warp import grid_sample, warp_feature, scale_and_resize_flow
from arseg_tpu.ops.local_attention import (
    local_similar,
    local_weighting,
    creff_attention,
)

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "adaptive_avg_pool",
    "adaptive_max_pool_11",
    "pixel_shuffle",
    "grid_sample",
    "warp_feature",
    "scale_and_resize_flow",
    "local_similar",
    "local_weighting",
    "creff_attention",
]

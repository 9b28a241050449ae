from tempo_tpu.ops.convs import conv2d_nhwc, space_to_depth_2x, depth_to_space_2x
from tempo_tpu.ops.morphology import (
    dilate3x3,
    erode3x3,
    hmin,
    label_components,
    reconstruct_by_erosion,
    regional_minima,
    watershed,
)
from tempo_tpu.ops.norms import group_norm

__all__ = [
    "conv2d_nhwc",
    "space_to_depth_2x",
    "depth_to_space_2x",
    "group_norm",
    "erode3x3",
    "dilate3x3",
    "reconstruct_by_erosion",
    "hmin",
    "regional_minima",
    "label_components",
    "watershed",
]

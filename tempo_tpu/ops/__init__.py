from tempo_tpu.ops.convs import conv2d_nhwc, space_to_depth_2x, depth_to_space_2x
from tempo_tpu.ops.norms import group_norm

__all__ = [
    "conv2d_nhwc",
    "space_to_depth_2x",
    "depth_to_space_2x",
    "group_norm",
]

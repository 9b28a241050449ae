from tempo_tpu.data.granule import read_radiance, read_l2_field, l2_filename_for
from tempo_tpu.data.normalize import (
    normalize_radiance,
    normalize_l2,
    compute_l2_stats,
)
from tempo_tpu.data.loader import TileLoader, load_normalization_stats
from tempo_tpu.data.device_buffer import DeviceTileBuffer

__all__ = [
    "read_radiance",
    "read_l2_field",
    "l2_filename_for",
    "normalize_radiance",
    "normalize_l2",
    "compute_l2_stats",
    "TileLoader",
    "DeviceTileBuffer",
    "load_normalization_stats",
]

from tempo_tpu.infer.granule_codec import GranuleCodec, crop_to_multiple
from tempo_tpu.infer.sweep import compute_metrics, evaluate_checkpoints

__all__ = [
    "GranuleCodec",
    "crop_to_multiple",
    "compute_metrics",
    "evaluate_checkpoints",
]

from tempo_tpu.models.vae import AutoencoderKL, VAEConfig, build_vae
from tempo_tpu.models.vae_l2 import L2PredictionHead, VAEWithL2Head, L2_PRODUCTS

__all__ = [
    "AutoencoderKL",
    "VAEConfig",
    "build_vae",
    "L2PredictionHead",
    "VAEWithL2Head",
    "L2_PRODUCTS",
]

from tempo_tpu.models.vae import AutoencoderKL, VAEConfig, build_vae
from tempo_tpu.models.vae_l2 import L2PredictionHead, VAEWithL2Head, L2_PRODUCTS
from tempo_tpu.models.diffusion import (
    VDM,
    FixedLinearSchedule,
    LearnedLinearSchedule,
    NNSchedule,
    SigmoidSchedule,
)
from tempo_tpu.models.diffusion import sample as vdm_sample
from tempo_tpu.models.flow import SFM, predict as sfm_predict, sde_integrate

__all__ = [
    "AutoencoderKL",
    "VAEConfig",
    "build_vae",
    "L2PredictionHead",
    "VAEWithL2Head",
    "L2_PRODUCTS",
    "VDM",
    "FixedLinearSchedule",
    "SigmoidSchedule",
    "LearnedLinearSchedule",
    "NNSchedule",
    "vdm_sample",
    "SFM",
    "sfm_predict",
    "sde_integrate",
]

from tempo_tpu.nn.distributions import DiagonalGaussian
from tempo_tpu.nn.encoder import Encoder
from tempo_tpu.nn.decoder import Decoder
from tempo_tpu.nn.beam import beam_search
from tempo_tpu.nn.transformer import Transformer, TransformerConfig, generate
from tempo_tpu.nn.unet import CMLP, CUNet

__all__ = [
    "DiagonalGaussian",
    "Encoder",
    "Decoder",
    "Transformer",
    "TransformerConfig",
    "beam_search",
    "generate",
    "CMLP",
    "CUNet",
]

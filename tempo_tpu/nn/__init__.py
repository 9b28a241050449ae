from tempo_tpu.nn.distributions import DiagonalGaussian
from tempo_tpu.nn.encoder import Encoder
from tempo_tpu.nn.decoder import Decoder

__all__ = ["DiagonalGaussian", "Encoder", "Decoder"]

"""KL-autoencoder for TEMPO hyperspectral patches (flax, NHWC, TPU-first).

Capability parity with the reference AutoencoderKL (reference:
src/model.py:579-705) and its config plumbing (src/model.py:708-759):

- encode: encoder -> 1x1 quant conv -> DiagonalGaussian over 2*embed_dim.
- decode: 1x1 post-quant conv -> decoder.
- loss: per-element L1 (or L2) reconstruction scaled by a *learned scalar*
  logvar initialized to 6.0 (src/model.py:617 — exp(6)=403 tames the huge
  initial summed loss), with SUM reduction divided by batch size; plus
  kl_weight * sum(KL)/B. Sum-not-mean reductions are load-bearing for
  loss-curve parity.

Default instantiation (27,289,893 parameters): input (64,64,1028),
chs=(512,256,128), mid_attn, num_res_blocks=1, z_channels=32, double_z,
embed_dim=32, 4 heads, GroupNorm(8, eps=1e-6), GELU, 3x3 convs
(configs/training/train_vae_default.yaml:29-76 in the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tempo_tpu.nn.blocks import Dense
from tempo_tpu.nn.decoder import Decoder
from tempo_tpu.nn.distributions import DiagonalGaussian
from tempo_tpu.nn.encoder import Encoder


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    # Encoder/decoder architecture (reference enc_dec_params defaults,
    # src/model.py:713-729).
    shape: Tuple[int, int, int] = (1028, 64, 64)  # (C, H, W), reference order
    chs: Tuple[int, ...] = (512, 256, 128)
    attn_sizes: Tuple[int, ...] = ()
    mid_attn: bool = True
    num_res_blocks: int = 1
    dropout_prob: float = 0.0
    z_channels: int = 32
    double_z: bool = True
    n_attention_heads: int = 4
    norm_groups: int = 8
    norm_eps: float = 1e-6
    norm_affine: bool = True
    act: str = "gelu"
    conv_kernel_size: int = 3
    # VAE head / loss (src/model.py:579-617, 654-669).
    embed_dim: int = 32
    kl_weight: float = 1e-6
    nll_loss_type: str = "l1"
    logvar_init: float = 6.0
    # Vestigial in-model NO2 probe (src/model.py:619-632, 671-679): a
    # 1x1-conv ReLU MLP on the latent mean, enabled when no2_mlp_hidden is
    # set and no2_weight > 0. Never enabled by any reference config
    # (superseded by the L2-supervised variant) but part of the API surface.
    no2_weight: float = 0.0
    no2_mlp_hidden: Optional[Tuple[int, ...]] = None
    # TPU compute policy (params stay float32; activations/matmuls in this).
    compute_dtype: str = "bfloat16"
    # Permanently lane-padded boundary convs: when the spectral channel
    # count is ragged (1028 = 8*128 + 4), the input batch is zero-padded
    # ONCE per step to the next 128-lane multiple (1152) and the decoder
    # emits that width (extra channels exactly zero), so encoder conv_in /
    # decoder conv_out and all their gradient convs run fully lane-aligned
    # on the MXU. Parameters keep the logical 1028 shape, and the loss is
    # computed with explicit logical element counts — numerics identical
    # (padded contributions are exact zeros). Only activates for ragged
    # channel counts >= 256 (tiny test configs are untouched).
    pad_boundary: bool = True
    # Rematerialize encoder/decoder activations in the backward pass
    # (jax.checkpoint): trades ~1/3 more forward FLOPs for O(levels) less
    # activation HBM — enables much larger batch/spatial sizes per chip.
    remat: bool = False

    @property
    def in_channels(self) -> int:
        return self.shape[0]

    @property
    def input_size(self) -> int:
        return self.shape[1]

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.chs) - 1)

    @property
    def boundary_pad(self) -> Optional[int]:
        """Lane-padded boundary width (next multiple of 128), or None when
        padding is disabled or pointless (aligned / tiny channel counts)."""
        c = self.in_channels
        if not self.pad_boundary or c % 128 == 0 or c < 256:
            return None
        return ((c + 127) // 128) * 128

    @classmethod
    def from_dict(cls, params: Dict[str, Any]) -> "VAEConfig":
        """Key-filtered update from a config mapping, mirroring the
        reference's get_model (src/model.py:731-742): unknown keys are
        ignored, known keys override defaults."""
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for key, value in params.items():
            if key in known:
                if isinstance(value, list):
                    value = tuple(value)
                kwargs[key] = value
        return cls(**kwargs)


class AutoencoderKL(nn.Module):
    config: VAEConfig

    def setup(self):
        cfg = self.config
        common = dict(
            input_size=cfg.input_size,
            chs=cfg.chs,
            attn_sizes=cfg.attn_sizes,
            mid_attn=cfg.mid_attn,
            num_res_blocks=cfg.num_res_blocks,
            dropout_prob=cfg.dropout_prob,
            z_channels=cfg.z_channels,
            n_attention_heads=cfg.n_attention_heads,
            norm_groups=cfg.norm_groups,
            norm_eps=cfg.norm_eps,
            norm_affine=cfg.norm_affine,
            act=cfg.act,
            conv_kernel_size=cfg.conv_kernel_size,
            dtype=cfg.dtype,
        )
        encoder_cls, decoder_cls = Encoder, Decoder
        if cfg.remat:
            encoder_cls = nn.remat(Encoder, static_argnums=(2,))
            decoder_cls = nn.remat(Decoder, static_argnums=(2,))
        self.encoder = encoder_cls(in_channels=cfg.in_channels,
                                   double_z=cfg.double_z, **common)
        self.decoder = decoder_cls(out_channels=cfg.in_channels,
                                   pad_out_to=cfg.boundary_pad, **common)
        self.quant_conv = Dense(2 * cfg.embed_dim, dtype=cfg.dtype)
        self.post_quant_conv = Dense(cfg.z_channels, dtype=cfg.dtype)
        # Learned scalar observation log-variance (src/model.py:617).
        self.logvar = self.param(
            "logvar",
            lambda key: jnp.asarray(cfg.logvar_init, dtype=jnp.float32),
        )
        if cfg.no2_mlp_hidden is not None and cfg.no2_weight > 0:
            self.no2_probe = [
                Dense(h, dtype=cfg.dtype, name=f"no2_probe_{i}")
                for i, h in enumerate(cfg.no2_mlp_hidden)
            ] + [Dense(1, dtype=cfg.dtype, name="no2_probe_out")]
        else:
            self.no2_probe = None

    def pad_input(self, x: jax.Array) -> jax.Array:
        """Zero-pad the spectral (last) axis to the lane-aligned boundary
        width, once per step. No-op when padding is disabled or x is
        already padded."""
        pad_to = self.config.boundary_pad
        if pad_to is None or x.shape[-1] >= pad_to:
            return x
        widths = [(0, 0)] * (x.ndim - 1) + [(0, pad_to - x.shape[-1])]
        return jnp.pad(x, widths)

    def encode(self, x: jax.Array, deterministic: bool = True) -> DiagonalGaussian:
        h = self.encoder(self.pad_input(x), deterministic)
        moments = self.quant_conv(h)
        return DiagonalGaussian.from_params(moments)

    def decode_padded(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        """Decode WITHOUT slicing the lane-padded output — the training
        path keeps everything aligned and accounts for the (exactly zero)
        padded channels in the loss instead."""
        z = self.post_quant_conv(z.astype(self.config.dtype))
        return self.decoder(z, deterministic)

    def decode(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        recon = self.decode_padded(z, deterministic)
        return recon[..., :self.config.in_channels]

    def forward_padded(self, x: jax.Array, rng: Optional[jax.Array] = None,
                       sample_posterior: bool = True,
                       deterministic: bool = True
                       ) -> Tuple[jax.Array, jax.Array, DiagonalGaussian]:
        """The training forward: returns (x_padded, recon_padded, posterior)
        with both arrays at the lane-aligned width (identical to the
        logical arrays when padding is off)."""
        x = self.pad_input(x)
        posterior = self.encode(x, deterministic)
        if sample_posterior:
            assert rng is not None, "rng required to sample the posterior"
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        recon = self.decode_padded(z, deterministic)
        return x, recon, posterior

    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None,
                 sample_posterior: bool = True, deterministic: bool = True
                 ) -> Tuple[jax.Array, DiagonalGaussian]:
        _, recon, posterior = self.forward_padded(
            x, rng=rng, sample_posterior=sample_posterior,
            deterministic=deterministic)
        return recon[..., :self.config.in_channels], posterior

    def reconstruct(self, x: jax.Array, rng: Optional[jax.Array] = None,
                    sample_posterior: bool = True) -> jax.Array:
        recon, _ = self(x, rng=rng, sample_posterior=sample_posterior)
        return recon

    def predict_no2(self, x: jax.Array) -> jax.Array:
        """Latent-mean -> NO2 map via the in-model probe
        (src/model.py:671-679)."""
        if self.no2_probe is None:
            raise ValueError("NO2 probe not initialized")
        h = self.encode(x).mean.astype(self.config.dtype)
        for layer in self.no2_probe[:-1]:
            h = jax.nn.relu(layer(h))
        return self.no2_probe[-1](h)

    def get_loss(self, x: jax.Array, rng: jax.Array
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        x_p, recon_p, posterior = self.forward_padded(
            x, rng=rng, sample_posterior=True, deterministic=True)
        return vae_loss(x_p, recon_p, posterior, self.logvar, self.config)


def vae_loss(x: jax.Array, recon: jax.Array, posterior: DiagonalGaussian,
             logvar: jax.Array, cfg: VAEConfig
             ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Reference loss semantics (src/model.py:654-669), computed in float32.

    nll = sum(rec_err / exp(logvar) + logvar) / B
    kl  = kl_weight * sum(KL(posterior || N(0,I))) / B

    x/recon may be lane-padded beyond cfg.in_channels (the padded channels
    are exact zeros on both sides). They are sliced back to the logical
    width BEFORE the loss math, so the summands and reduction order are
    identical to the unpadded path; the slice's backward is a zero-pad,
    which keeps every boundary-conv cotangent lane-aligned.
    """
    x32 = x.astype(jnp.float32)[..., :cfg.in_channels]
    r32 = recon.astype(jnp.float32)[..., :cfg.in_channels]
    if cfg.nll_loss_type == "l1":
        rec_err = jnp.abs(x32 - r32)
    elif cfg.nll_loss_type == "l2":
        rec_err = jnp.square(x32 - r32)
    elif cfg.nll_loss_type == "ms_mse":
        # FFT-space wavenumber-weighted MSE (library ancestor capability,
        # reference src/mltools/losses.py:5-31)
        from tempo_tpu.ops.losses import multiscale_mse

        rec_err = multiscale_mse(x32, r32)
    else:
        raise ValueError("nll_loss_type must be l1, l2 or ms_mse")

    batch = x.shape[0]
    nll_loss = jnp.sum(rec_err / jnp.exp(logvar) + logvar) / batch
    pixel_mse = jnp.mean(jnp.square(x32 - r32))
    kl_loss = cfg.kl_weight * jnp.sum(posterior.kl()) / batch
    loss = nll_loss + kl_loss
    metrics = {
        "loss": loss,
        "nll_loss": nll_loss,
        "kl_loss": kl_loss,
        "pixel_mse": pixel_mse,
    }
    return loss, metrics


def build_vae(model_config: Dict[str, Any],
              compute_dtype: Optional[str] = None) -> Tuple[AutoencoderKL, VAEConfig]:
    """Build the VAE from a training-config 'model' section (same schema as
    the reference configs/training/train_vae_default.yaml)."""
    cfg = VAEConfig.from_dict(model_config or {})
    if compute_dtype is not None:
        cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    return AutoencoderKL(cfg), cfg

"""VAE with multi-task L2 atmospheric-product supervision.

Capability parity with the reference L2 variant (reference:
src/model_with_l2.py:11-182):

- L2PredictionHead: 1x1-conv MLP latent->512->512->4 with bias-free hidden
  convs + GroupNorm(8) + GELU, biased output conv (src/model_with_l2.py:14-42).
- Loss: the base VAE loss (same sum-reduction semantics) computed from one
  posterior sample, plus NaN-masked per-product MSE between head predictions
  from a SECOND independent posterior sample (a reference quirk preserved:
  src/model_with_l2.py:124-127 draws a different z for the head than the one
  decoded) and 4x-average-pooled targets. NaN propagates through the pooling
  (torch AvgPool2d semantics): a 4x4 block with any NaN yields a NaN target,
  which the mask then excludes (src/model_with_l2.py:59, 153-168).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tempo_tpu.models.vae import AutoencoderKL, VAEConfig, vae_loss
from tempo_tpu.nn.blocks import GroupNorm
from tempo_tpu.nn.init import torch_bias_init, torch_dense_kernel_init
from tempo_tpu.ops.convs import dense

L2_PRODUCTS: Tuple[str, ...] = ("NO2", "O3TOT", "HCHO", "CLDO4")
DEFAULT_L2_WEIGHTS: Dict[str, float] = {p: 0.1 for p in L2_PRODUCTS}


class L2PredictionHead(nn.Module):
    hidden_dims: Sequence[int] = (512, 512)
    n_outputs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        """z: [B, Hl, Wl, latent_channels] -> [B, Hl, Wl, n_outputs]."""
        h = z.astype(self.dtype)
        for i, hidden in enumerate(self.hidden_dims):
            cin = h.shape[-1]
            kernel = self.param(f"dense{i}_kernel", torch_dense_kernel_init(),
                                (cin, hidden))
            h = dense(h, kernel).astype(self.dtype)  # bias-free (ref: bias=False)
            h = GroupNorm(num_groups=8, eps=1e-5, affine=True, act="gelu",
                          dtype=self.dtype, name=f"norm{i}")(h)
        cin = h.shape[-1]
        kernel = self.param("out_kernel", torch_dense_kernel_init(),
                            (cin, self.n_outputs))
        bias = self.param("out_bias", torch_bias_init(cin), (self.n_outputs,))
        return dense(h, kernel, bias).astype(self.dtype)


class VAEWithL2Head(nn.Module):
    """Base VAE + single 4-product prediction head on the sampled latent."""

    config: VAEConfig
    mlp_hidden: Tuple[int, ...] = (512, 512)

    def setup(self):
        self.vae = AutoencoderKL(self.config)
        self.l2_head = L2PredictionHead(hidden_dims=self.mlp_hidden,
                                        n_outputs=len(L2_PRODUCTS),
                                        dtype=self.config.dtype)

    def __call__(self, x: jax.Array, rng: jax.Array) -> Dict[str, Any]:
        posterior = self.vae.encode(x)
        z = posterior.sample(rng)
        recon = self.vae.decode(z)
        l2_all = self.l2_head(z)
        return {
            "reconstruction": recon,
            "posterior": posterior,
            "z": z,
            "l2_predictions": {p: l2_all[..., i] for i, p in enumerate(L2_PRODUCTS)},
        }

    def encode(self, x: jax.Array) -> Any:
        return self.vae.encode(x)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.vae.decode(z)

    def compute_loss(self, batch: Dict[str, jax.Array], rng: jax.Array,
                     l2_weights: Optional[Dict[str, float]] = None
                     ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """batch: {'spectral': [B,H,W,C], '<PRODUCT>': [B,H,W]} (NaN = invalid)."""
        if l2_weights is None:
            l2_weights = DEFAULT_L2_WEIGHTS
        x = batch["spectral"]
        rng_vae, rng_head = jax.random.split(rng)

        # Lane-padded forward (exact zeros in padded channels; vae_loss uses
        # logical element counts) keeps the boundary convs aligned in the
        # hot multi-task path too.
        x_p, recon_p, posterior = self.vae.forward_padded(
            x, rng=rng_vae, sample_posterior=True)
        loss, metrics = vae_loss(x_p, recon_p, posterior, self.vae.logvar,
                                 self.config)
        # Metric name parity: pixel_mse is tracked but the L2 trainer reports
        # 'loss'/'nll_loss'/'kl_loss' plus per-product losses.
        vae_total = loss

        # Second, independent latent sample feeds the head (reference quirk,
        # src/model_with_l2.py:127).
        z = posterior.sample(rng_head)
        l2_all = self.l2_head(z).astype(jnp.float32)  # [B, Hl, Wl, 4]

        total_l2 = jnp.asarray(0.0, dtype=jnp.float32)
        for i, product in enumerate(L2_PRODUCTS):
            if product not in batch:
                continue
            target = avg_pool_4x_nan(batch[product].astype(jnp.float32))
            pred = l2_all[..., i]
            l2_mse = masked_mse(pred, target)
            metrics[f"{product}_loss"] = l2_mse
            total_l2 = total_l2 + l2_weights[product] * l2_mse

        total = vae_total + total_l2
        metrics["loss"] = total
        return total, metrics


def avg_pool_4x_nan(x: jax.Array) -> jax.Array:
    """[B, H, W] -> [B, H/4, W/4] mean over 4x4 blocks; NaN propagates (torch
    AvgPool2d semantics on NaN inputs)."""
    b, h, w = x.shape
    x = x.reshape(b, h // 4, 4, w // 4, 4)
    return jnp.mean(x, axis=(2, 4))


def masked_mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """MSE over non-NaN target positions; 0 when no position is valid."""
    mask = jnp.logical_not(jnp.isnan(target))
    safe_target = jnp.where(mask, target, 0.0)
    sq = jnp.square(pred - safe_target)
    total = jnp.sum(jnp.where(mask, sq, 0.0))
    count = jnp.sum(mask)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)

"""Masked-autoencoder training wrapper (TPU-first).

TPU-native re-design of the reference toolkit's `MaskedEncoder`
(reference: src/mltools/models/masked_encoder_model.py:5-55) with the same
semantics but static shapes throughout:

- The reference gathers masked elements with boolean advanced indexing
  (`x[masks]`) — a dynamic-shape op XLA cannot compile. Here the masked
  MSE is computed densely: sum(mask * (x - x_pred)^2) / sum(mask * 1s),
  which equals `F.mse_loss(x[masks], x_pred[masks])` exactly and stays one
  fused kernel.
- Masks are explicit function inputs (drawn by the caller or from an rng),
  so losses are reproducible without monkeypatching a global RNG.

`x` is [B, T, C] token-major (transformer layout). A (B, T) mask zeroes
whole tokens; with `mask_channels` only the flagged channels are zeroed
(masked_encoder_model.py:30-34); with `input_mask` the token mask is
appended as an extra input channel and stripped from the prediction
(masked_encoder_model.py:36-48).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def random_token_masks(rng: jax.Array, batch_size: int, seq_len: int,
                       mask_frac: float) -> jax.Array:
    """iid Bernoulli(mask_frac) token masks, [B, T] bool — a convenience
    default for the reference's user-supplied `random_masks_func`."""
    return jax.random.uniform(rng, (batch_size, seq_len)) < mask_frac


class MaskedEncoder:
    """Wraps any `net_apply(x) -> x_pred` (e.g. a Transformer apply
    closure) with masked-reconstruction training."""

    def __init__(self, net_apply: Callable[[jax.Array], jax.Array],
                 mask_channels: Optional[Sequence[bool]] = None,
                 input_mask: bool = False):
        self.net_apply = net_apply
        self.mask_channels = (None if mask_channels is None
                              else jnp.asarray(mask_channels, bool))
        self.input_mask = input_mask

    def _expand(self, masks: jax.Array) -> jax.Array:
        """(B, T) token mask -> (B, T, C) element mask
        (masked_encoder_model.py:30-34)."""
        if self.mask_channels is not None:
            return masks[:, :, None] & self.mask_channels[None, None, :]
        return masks[:, :, None]

    def get_masked_x(self, x: jax.Array,
                     masks: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Zero the masked elements; optionally append the token mask as an
        input channel. Returns (x_masked, element_mask [B,T,C-like])."""
        el = self._expand(masks)
        x_masked = jnp.where(el, 0.0, x)
        if self.input_mask:
            x_masked = jnp.concatenate(
                [x_masked, masks[:, :, None].astype(x.dtype)], axis=-1)
        return x_masked, el

    def get_loss(self, x: jax.Array, masks: jax.Array) -> jax.Array:
        """MSE over masked elements only (masked_encoder_model.py:50-53),
        computed densely (static shapes)."""
        x_masked, el = self.get_masked_x(x, masks)
        x_pred = self.net_apply(x_masked)
        if self.input_mask:
            x_pred = x_pred[..., : x.shape[-1]]
        el_f = jnp.broadcast_to(el, x.shape).astype(jnp.float32)
        sq = (x_pred.astype(jnp.float32) - x.astype(jnp.float32)) ** 2
        return jnp.sum(sq * el_f) / jnp.maximum(jnp.sum(el_f), 1.0)

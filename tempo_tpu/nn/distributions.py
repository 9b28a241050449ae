"""Diagonal Gaussian posterior for the KL-VAE latent.

Semantics match the reference distribution (reference: src/model.py:47-87):
parameters are [B, H, W, 2*Z] (NHWC here; the reference is NCHW), split into
mean / logvar along the channel axis, logvar clamped to [-30, 20]; KL is the
standard-normal KL summed over latent dims per sample.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiagonalGaussian(NamedTuple):
    mean: jax.Array   # [B, H, W, Z]
    logvar: jax.Array  # [B, H, W, Z], already clamped

    @classmethod
    def from_params(cls, parameters: jax.Array) -> "DiagonalGaussian":
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
        return cls(mean=mean.astype(jnp.float32), logvar=logvar)

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jax.Array:
        return jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        noise = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        """KL(q || N(0, I)) summed over latent dims -> [B]."""
        reduce_axes = tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + self.var - 1.0 - self.logvar,
            axis=reduce_axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        """Negative log likelihood of `sample` under the Gaussian -> [B]."""
        logtwopi = jnp.log(2.0 * jnp.pi)
        reduce_axes = tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=reduce_axes,
        )

"""Variational diffusion (VDM) + noise schedules (TPU-first).

TPU-native re-design of the reference toolkit's diffusion stack
(reference: src/mltools/models/vdm_model.py:20-446 `VDM`,
src/mltools/models/ddpm_model.py:22-397 — the same class minus
classifier-free guidance, so this one implementation covers both;
schedules src/mltools/models/model_tools.py:7-110) with identical math:

- Continuous-time ELBO in bits/dim (arXiv:2107.00630 Eq. 11):
  diffusion loss 0.5 * ||eps_hat - eps||^2 * dgamma/dt, latent KL to
  N(0,1) at t=1, and the Gaussian reconstruction term at t=0.
- dgamma/dt comes from `jax.jvp` of the schedule — one forward-mode pass
  instead of the reference's `autograd.grad(create_graph=True)` trick
  (vdm_model.py:288-295), exact for learned schedules too.
- Classifier-free guidance: conditioning dropout with probability `p_cfg`
  during training (masked v-conditionings set to -1, vdm_model.py:224-232)
  and guided prediction `eps_uncond + w_cfg (eps_cond - eps_uncond)` at
  sampling (vdm_model.py:308-345).
- Ancestral sampling (Eq. 34) runs under `lax.scan` — one compiled step —
  with the DDNM weight decomposition available for inverse problems
  (vdm_model.py:346-394).

Randomness is explicit: every stochastic entry takes a JAX rng (or the
concrete tensors), so losses are reproducible and trivially testable —
the torch oracle needs monkeypatched globals for the same property.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tempo_tpu.nn.init import torch_bias_init, torch_dense_kernel_init

Dtype = Any


def kl_std_normal(mean_squared: jax.Array, var: jax.Array) -> jax.Array:
    """KL(N(m, var) || N(0, 1)) per element (model_tools.py:7-8)."""
    return 0.5 * (var + mean_squared
                  - jnp.log(jnp.clip(var, min=1e-15)) - 1.0)


class FixedLinearSchedule(nn.Module):
    """gamma(t) = gamma_min + (gamma_max - gamma_min) t
    (model_tools.py:11-18)."""

    gamma_min: float
    gamma_max: float

    def __call__(self, t: jax.Array) -> jax.Array:
        return self.gamma_min + (self.gamma_max - self.gamma_min) * t


class SigmoidSchedule(nn.Module):
    """Sigmoid-warped schedule (model_tools.py:21-30)."""

    gamma_min: float
    gamma_max: float

    def __call__(self, t: jax.Array) -> jax.Array:
        b = 1.0 / (math.exp(-self.gamma_min) + 1.0)
        a = 1.0 / (math.exp(-self.gamma_max) + 1.0) - b
        return -jnp.log(1.0 / (a * t + b) - 1.0)


class LearnedLinearSchedule(nn.Module):
    """gamma(t) = b + |w| t with learned scalars, monotone by construction
    (model_tools.py:33-40)."""

    gamma_min: float
    gamma_max: float

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        b = self.param("b", lambda _: jnp.float32(self.gamma_min))
        w = self.param("w", lambda _: jnp.float32(self.gamma_max
                                                  - self.gamma_min))
        return b + jnp.abs(w) * t


class MonotonicDense(nn.Module):
    """Dense with |kernel| — every output is non-decreasing in every input
    (model_tools.py:44-90 MonotonicLinear, torch-default init)."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Any] = None
    bias_init: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param("kernel",
                            self.kernel_init or torch_dense_kernel_init(),
                            (cin, self.features))
        y = x @ jnp.abs(kernel)
        if self.use_bias:
            y = y + self.param("bias",
                               self.bias_init or torch_bias_init(cin),
                               (self.features,))
        return y


class NNSchedule(nn.Module):
    """Monotone-MLP noise schedule: a linear ramp plus a bounded monotone
    correction (model_tools.py:93-110)."""

    gamma_min: float
    gamma_max: float
    mid_dim: int = 1024

    @nn.compact
    def __call__(self, t: jax.Array, scale: float = 1.0) -> jax.Array:
        t_sh = jnp.shape(t)
        t = jnp.reshape(jnp.asarray(t, jnp.float32), (-1, 1))
        # the reference overwrites l1's init to the plain gamma ramp
        # (model_tools.py:96-99)
        l1 = MonotonicDense(
            1, name="l1",
            kernel_init=nn.initializers.constant(self.gamma_max
                                                 - self.gamma_min),
            bias_init=nn.initializers.constant(self.gamma_min))
        l2 = MonotonicDense(self.mid_dim, name="l2")
        l3 = MonotonicDense(1, use_bias=False, name="l3")
        g = l1(t)
        _g = 2.0 * (t - 0.5)
        _g = l2(_g)
        _g = 2.0 * (jax.nn.sigmoid(_g) - 0.5)
        _g = l3(_g) / self.mid_dim
        g = g + _g * scale
        return jnp.reshape(g, t_sh)


SCHEDULES = {
    "fixed_linear": FixedLinearSchedule,
    "sigmoid": SigmoidSchedule,
    "learned_linear": LearnedLinearSchedule,
    "learned_nn": NNSchedule,
}


class VDM(nn.Module):
    """Continuous-time variational diffusion model
    (reference: vdm_model.py:20-446; pre-CFG variant ddpm_model.py:22-397).

    `score_model` is any module called as (x, t=..., **conditioning) ->
    predicted noise — CUNet or CMLP (tempo_tpu.nn.unet)."""

    score_model: nn.Module
    noise_schedule: str = "fixed_linear"
    gamma_min: float = -13.3
    gamma_max: float = 5.0
    antithetic_time_sampling: bool = True
    data_noise: float = 1.0e-3
    p_cfg: Optional[float] = None
    w_cfg: Optional[float] = None

    def setup(self):
        if self.noise_schedule not in SCHEDULES:
            raise ValueError(f"Unknown noise schedule {self.noise_schedule}")
        self.gamma = SCHEDULES[self.noise_schedule](self.gamma_min,
                                                    self.gamma_max)

    # --- schedule-derived quantities (vdm_model.py:286-307) ---

    @staticmethod
    def alpha(gamma_t: jax.Array) -> jax.Array:
        return jnp.sqrt(jax.nn.sigmoid(-gamma_t))

    @staticmethod
    def sigma(gamma_t: jax.Array) -> jax.Array:
        return jnp.sqrt(jax.nn.sigmoid(gamma_t))

    def gamma_and_grad(self, times: jax.Array):
        """(gamma(t), dgamma/dt) in one forward-mode pass — replaces the
        reference's autograd.grad of the traced schedule
        (vdm_model.py:288-295)."""
        return jax.jvp(lambda t: self.gamma(t), (times,),
                       (jnp.ones_like(times),))

    def variance_preserving_map(self, x: jax.Array, times: jax.Array,
                                noise: jax.Array):
        """z_t = alpha(t) x + sigma(t) eps (Eq. 10; vdm_model.py:73-94)."""
        times = jnp.reshape(times, (-1,) + (1,) * (x.ndim - 1))
        gamma_t = self.gamma(times)
        return self.alpha(gamma_t) * x + noise * self.sigma(gamma_t), gamma_t

    def sample_times(self, batch_size: int, rng: jax.Array) -> jax.Array:
        """Antithetic (low-discrepancy) or iid U[0,1) times
        (vdm_model.py:108-127)."""
        if self.antithetic_time_sampling:
            t0 = jax.random.uniform(rng, (), maxval=1.0 / batch_size)
            return t0 + jnp.arange(batch_size) / batch_size
        return jax.random.uniform(rng, (batch_size,))

    # --- prediction (with classifier-free guidance) ---

    def get_pred_noise(self, zt: jax.Array, gamma_t: jax.Array,
                       guided: bool = False, **kwargs) -> jax.Array:
        """Score-model call on normalized time; with `guided` and `w_cfg`,
        the CFG combination of unconditional (all v = -1) and conditional
        predictions (vdm_model.py:308-345)."""
        t_norm = (gamma_t - self.gamma_min) / (self.gamma_max
                                               - self.gamma_min)
        if not (guided and self.w_cfg is not None):
            return self.score_model(zt, t=t_norm, **kwargs)
        v_conds = kwargs.pop("v_conditionings")
        uncond = [jnp.full_like(v, -1.0) for v in v_conds]
        eps_u = self.score_model(zt, t=t_norm, v_conditionings=uncond,
                                 **kwargs)
        eps_c = self.score_model(zt, t=t_norm, v_conditionings=v_conds,
                                 **kwargs)
        return eps_u + self.w_cfg * (eps_c - eps_u)

    # --- training loss (vdm_model.py:128-285) ---

    def __call__(self, x, rng=None, noise=None, times=None, noise_0=None,
                 reduction: str = "mean", **kwargs):
        return self.get_loss(x, rng=rng, noise=noise, times=times,
                             noise_0=noise_0, reduction=reduction, **kwargs)

    def get_loss(self, x: jax.Array, rng: Optional[jax.Array] = None,
                 noise: Optional[jax.Array] = None,
                 times: Optional[jax.Array] = None,
                 noise_0: Optional[jax.Array] = None,
                 reduction: str = "mean", **kwargs):
        """Per-sample ELBO in bits/dim and its three terms
        (vdm_model.py:206-285). Stochastic inputs (times, the diffused
        noise, the reconstruction noise, CFG dropout) draw from `rng`
        unless given explicitly."""
        b = x.shape[0]
        need = (times is None) + (noise is None) + (noise_0 is None) + \
            (self.p_cfg is not None)
        keys = iter(jax.random.split(rng, need)) if need else iter(())

        if self.p_cfg is not None:
            assert "v_conditionings" in kwargs, "CFG needs v_conditionings"
            mask = jax.random.uniform(next(keys), (b,)) < self.p_cfg
            kwargs["v_conditionings"] = [
                jnp.where(mask[:, None], -1.0, v)
                for v in kwargs["v_conditionings"]]

        bpd_factor = 1.0 / (math.prod(x.shape[1:]) * math.log(2.0))
        if times is None:
            times = self.sample_times(b, next(keys))
        if noise is None:
            noise = jax.random.normal(next(keys), x.shape, jnp.float32)
        x_t, gamma_t_full = self.variance_preserving_map(x, times, noise)
        pred_noise = self.get_pred_noise(
            x_t, jnp.reshape(gamma_t_full, (b,)), **kwargs)

        _, gamma_grad = self.gamma_and_grad(times)
        pred_loss = jnp.sum(jnp.reshape(
            (pred_noise.astype(jnp.float32) - noise) ** 2, (b, -1)), axis=-1)
        diffusion_loss = bpd_factor * 0.5 * pred_loss * gamma_grad

        gamma_1 = self.gamma(jnp.float32(1.0))
        sigma_1_sq = jax.nn.sigmoid(gamma_1)
        mean_sq = (1.0 - sigma_1_sq) * x.astype(jnp.float32) ** 2
        latent_loss = bpd_factor * jnp.sum(jnp.reshape(
            kl_std_normal(mean_sq, sigma_1_sq), (b, -1)), axis=-1)

        if noise_0 is None:
            noise_0 = jax.random.normal(next(keys), x.shape, jnp.float32)
        z_0, gamma_0 = self.variance_preserving_map(
            x, jnp.zeros((b,), jnp.float32), noise_0)
        alpha_0 = jnp.sqrt(jax.nn.sigmoid(-gamma_0))
        z_0_rescaled = z_0 / alpha_0
        log_prob = (-0.5 * ((x - z_0_rescaled) / self.data_noise) ** 2
                    - math.log(self.data_noise)
                    - 0.5 * math.log(2.0 * math.pi))
        recons_loss = -bpd_factor * jnp.sum(jnp.reshape(log_prob, (b, -1)),
                                            axis=-1)

        loss = diffusion_loss + latent_loss + recons_loss
        metrics = {"elbo": loss, "diffusion_loss": diffusion_loss,
                   "latent_loss": latent_loss,
                   "reconstruction_loss": recons_loss}
        if reduction == "mean":
            metrics = {k: jnp.mean(v) for k, v in metrics.items()}
            return jnp.mean(loss), metrics
        return loss, metrics

    # --- ancestral sampling (vdm_model.py:346-446) ---

    def sample_zs_given_zt(self, zt: jax.Array, t: jax.Array, s: jax.Array,
                           rng: Optional[jax.Array] = None,
                           noise: Optional[jax.Array] = None,
                           return_ddnm: bool = False, **kwargs):
        """One ancestral step p(z_s | z_t) (Eq. 34; vdm_model.py:346-394);
        `return_ddnm` yields the (w_z, w_x0, x0_pred, scale) decomposition
        instead."""
        gamma_t = self.gamma(t)
        gamma_s = self.gamma(s)
        c = -jnp.expm1(gamma_s - gamma_t)
        alpha_t, alpha_s = self.alpha(gamma_t), self.alpha(gamma_s)
        sigma_t, sigma_s = self.sigma(gamma_t), self.sigma(gamma_s)
        pred_noise = self.get_pred_noise(zt, gamma_t, guided=True, **kwargs)
        if not return_ddnm:
            mean = alpha_s / alpha_t * (zt - c * sigma_t * pred_noise)
            scale = sigma_s * jnp.sqrt(c)
            if noise is None:
                noise = jax.random.normal(rng, zt.shape, jnp.float32)
            return mean + scale * noise
        gamma_0 = self.gamma(jnp.float32(0.0))
        alpha_0 = self.alpha(gamma_0)
        c0 = -jnp.expm1(gamma_0 - gamma_t)
        x_0t = alpha_0 / alpha_t * (zt - c0 * sigma_t * pred_noise)
        alpha_ts = alpha_t / alpha_s
        sigma_ts_sq = sigma_t ** 2 - (alpha_ts ** 2) * (sigma_s ** 2)
        w_z = alpha_ts * (sigma_s / sigma_t) ** 2
        w_x_0t = alpha_s * sigma_ts_sq / sigma_t ** 2
        scale = jnp.sqrt(sigma_ts_sq * (sigma_s / sigma_t) ** 2)
        return w_z, w_x_0t, x_0t, scale

    def sample_zs_given_zt_ddim(self, zt: jax.Array, t: jax.Array,
                                s: jax.Array, eta: float = 0.0,
                                rng: Optional[jax.Array] = None,
                                noise: Optional[jax.Array] = None,
                                **kwargs) -> jax.Array:
        """One DDIM step (Song et al. 2020, eq. 12) in VDM gamma
        parameterization — a fast-sampling capability the reference's
        ancestral-only sampler (vdm_model.py:346-446) lacks.

        z_s = alpha_s * x0_pred + sqrt(sigma_s^2 - var) * eps_pred
              + sqrt(var) * xi,      var = eta^2 * sigma_s^2 * c,
        with c = -expm1(gamma_s - gamma_t). In the variance-preserving
        process (alpha^2 + sigma^2 = 1) eta=1 reproduces the ancestral
        posterior EXACTLY (test-pinned against sample_zs_given_zt); eta=0
        is the deterministic probability-flow corner, which stays accurate
        at step counts where ancestral sampling falls apart.
        """
        gamma_t, gamma_s = self.gamma(t), self.gamma(s)
        c = -jnp.expm1(gamma_s - gamma_t)
        alpha_t, alpha_s = self.alpha(gamma_t), self.alpha(gamma_s)
        sigma_t, sigma_s = self.sigma(gamma_t), self.sigma(gamma_s)
        pred_noise = self.get_pred_noise(zt, gamma_t, guided=True, **kwargs)
        x0_pred = (zt - sigma_t * pred_noise) / alpha_t
        var = (eta ** 2) * (sigma_s ** 2) * c
        mean = alpha_s * x0_pred + jnp.sqrt(
            jnp.maximum(sigma_s ** 2 - var, 0.0)) * pred_noise
        if eta == 0.0:  # static python branch: fully deterministic
            return mean
        if noise is None:
            noise = jax.random.normal(rng, zt.shape, jnp.float32)
        return mean + jnp.sqrt(var) * noise


def sample(model: VDM, params, rng: jax.Array, batch_size: int,
           n_sampling_steps: int, sample_shape: Sequence[int],
           z: Optional[jax.Array] = None, return_all: bool = False,
           method: str = "ancestral", eta: float = 0.0,
           **kwargs) -> jax.Array:
    """Generate samples by scanning the compiled reverse step from t=1 to
    t=0 (reference python loop: vdm_model.py:395-446).

    method='ancestral' is the reference's sampler; method='ddim' runs the
    eta-parameterized DDIM step (eta=0 deterministic fast sampling, eta=1
    equivalent to ancestral) — usable at ~10x fewer steps."""
    if method not in ("ancestral", "ddim"):
        raise ValueError(f"unknown sampling method {method!r}")
    if z is None:
        rng, key = jax.random.split(rng)
        z = jax.random.normal(key, (batch_size, *sample_shape), jnp.float32)
    steps = jnp.linspace(1.0, 0.0, n_sampling_steps + 1)

    def step(carry, inp):
        z, rng = carry
        t, s = inp
        rng, key = jax.random.split(rng)
        if method == "ddim":
            z = model.apply({"params": params}, z, t, s, eta=eta, rng=key,
                            method=VDM.sample_zs_given_zt_ddim, **kwargs)
        else:
            z = model.apply({"params": params}, z, t, s, rng=key,
                            method=VDM.sample_zs_given_zt, **kwargs)
        return (z, rng), z if return_all else None

    (z, _), zs = jax.lax.scan(step, (z, rng),
                              (steps[:-1], steps[1:]))
    return zs if return_all else z

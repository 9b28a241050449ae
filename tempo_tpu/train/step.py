"""Jitted train/eval steps.

TPU-first design: the whole step — forward, loss, backward, global-norm clip,
AdamW update — is ONE compiled function with the train state donated, so
parameters never round-trip to the host and XLA fuses the optimizer into the
backward pass. The reference runs these as separate eager torch calls plus a
redundant second no-grad forward for pixel_mse (src/train_utils.py:149-183,
~1.5x forward cost); here pixel_mse falls out of the same reconstruction.

Data parallelism: callers place the batch with a 'data'-sharded leading axis
and keep params replicated (tempo_tpu.parallel); XLA then partitions the step
and inserts the gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from tempo_tpu.train.state import TrainState

LossFn = Callable[[Any, Any, jax.Array], Tuple[jax.Array, Dict[str, jax.Array]]]


def vae_loss_fn(model) -> LossFn:
    """Loss closure for the base VAE: batch is a [B,H,W,C] array."""

    def loss_fn(params, batch, rng):
        return model.apply({"params": params}, batch, rng,
                           method=type(model).get_loss)

    return loss_fn


def vae_l2_loss_fn(model) -> LossFn:
    """Loss closure for the L2-supervised variant: batch is a dict."""

    def loss_fn(params, batch, rng):
        return model.apply({"params": params}, batch, rng,
                           method=type(model).compute_loss)

    return loss_fn


def diffusion_loss_fn(model, encode_fn=None) -> LossFn:
    """Loss closure for a VDM (tempo_tpu.models.diffusion): batch is a
    [B,H,W,C] array. With `encode_fn(batch, rng) -> latents` (a frozen-VAE
    posterior sample) the diffusion trains in latent space; the encode is
    fused INTO the jitted step, so every step sees a fresh posterior draw
    (stronger than a pre-encoded dataset) and the pipeline stays one
    compiled program. The ELBO is renamed 'loss' for the trainer's
    plots/metrics contract."""

    def loss_fn(params, batch, rng):
        if encode_fn is not None:
            rng, enc_rng = jax.random.split(rng)
            batch = jax.lax.stop_gradient(encode_fn(batch, enc_rng))
        loss, metrics = model.apply({"params": params}, batch, rng=rng)
        metrics = dict(metrics)
        metrics["loss"] = metrics.pop("elbo")
        return loss, metrics

    return loss_fn


def flow_loss_fn(model, encode_fn=None) -> LossFn:
    """Loss closure for stochastic flow matching
    (tempo_tpu.models.flow.SFM; reference: src/mltools/models/sfm_model.py
    :123-137). The source sample x0 is a fresh standard-normal draw every
    step — a generative flow from noise to tiles — and the target x1 is
    the batch, optionally pushed through a frozen-VAE `encode_fn` fused
    into the jitted step exactly like diffusion_loss_fn."""

    def loss_fn(params, batch, rng):
        if encode_fn is not None:
            rng, enc_rng = jax.random.split(rng)
            batch = jax.lax.stop_gradient(encode_fn(batch, enc_rng))
        rng, src_rng = jax.random.split(rng)
        x0 = jax.random.normal(src_rng, batch.shape, jnp.float32)
        loss = model.apply({"params": params}, x0, batch, rng=rng)
        return loss, {"loss": loss}

    return loss_fn


def make_train_step(loss_fn: LossFn, tx: optax.GradientTransformation,
                    donate: bool = True, ema_alpha: float = 0.99,
                    grad_accum: int = 1):
    """Returns jitted (state, batch) -> (state, metrics).

    state.ema (when present) is updated on-device with EMA(ema_alpha); the
    first step seeds it with the raw metrics (alpha=0), matching the
    reference's host-side running average exactly.

    grad_accum > 1 splits the batch's leading axis into that many
    microbatches and runs them through a `lax.scan` INSIDE the one jitted
    step — peak activation memory is one microbatch's, the carry is a
    single grads-tree accumulator, and the optimizer still updates once.
    Grads and metrics are microbatch means, so for an rng-free loss the
    update equals the unaccumulated step exactly (every loss here is a
    per-sample mean; equal microbatches make mean-of-means the full-batch
    mean). Each microbatch gets its own rng split (fresh posterior/noise
    draws — for stochastic losses the draws differ from the one-shot step
    but the estimator is the same)."""
    assert grad_accum >= 1, grad_accum

    def _grads_and_metrics(params, batch, step_rng):
        if grad_accum == 1:
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, step_rng)
            return grads, metrics

        def split(x):
            b = x.shape[0]
            assert b % grad_accum == 0, (
                f"batch {b} not divisible by grad_accum {grad_accum}")
            return x.reshape((grad_accum, b // grad_accum) + x.shape[1:])

        micro = jax.tree_util.tree_map(split, batch)
        rngs = jax.random.split(step_rng, grad_accum)
        one = jax.tree_util.tree_map(lambda x: x[0], micro)
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda p, b, r: jax.value_and_grad(
                loss_fn, has_aux=True)(p, b, r), params, one, rngs[0]))
        ((_, m0), g0) = zeros

        def body(carry, xs):
            gsum, msum = carry
            rng_i, mb = xs
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, mb, rng_i)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            msum = jax.tree_util.tree_map(jnp.add, msum, metrics)
            return (gsum, msum), None

        (gsum, msum), _ = jax.lax.scan(body, (g0, m0), (rngs, micro))
        inv = 1.0 / grad_accum
        return (jax.tree_util.tree_map(lambda g: g * inv, gsum),
                jax.tree_util.tree_map(lambda m: m * inv, msum))

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        step_rng = jax.random.fold_in(state.rng, state.step)
        grads, metrics = _grads_and_metrics(state.params, batch, step_rng)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ema = state.ema
        if ema is not None:
            is_first = (state.step == 0)
            ema = {
                k: jnp.where(is_first, metrics[k],
                             ema_alpha * ema[k] + (1 - ema_alpha) * metrics[k])
                for k in ema
            }

        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, ema=ema)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def init_ema(state: TrainState, metric_keys) -> TrainState:
    """Attach a zeroed EMA slot for the given metric names, placed like the
    state's step counter (replicated over whatever mesh the state lives on)
    so the scalars don't end up committed to a single device of a
    multi-device state."""
    sharding = getattr(state.step, "sharding", None)
    mesh_placed = (sharding is not None
                   and getattr(sharding, "mesh", None) is not None)

    def _zero():
        # a fresh buffer per key — the donated train step may not see the
        # same buffer twice
        if not mesh_placed:
            return jnp.zeros((), jnp.float32)
        if jax.process_count() > 1:
            import numpy as np

            return jax.make_array_from_process_local_data(
                sharding, np.zeros((), np.float32))
        return jax.device_put(jnp.zeros((), jnp.float32), sharding)

    ema = {k: _zero() for k in metric_keys}
    return state.replace(ema=ema)


def make_eval_step(loss_fn: LossFn):
    """Returns jitted (params, batch, rng) -> metrics (no grads)."""

    def eval_step(params, batch, rng) -> Dict[str, jax.Array]:
        _, metrics = loss_fn(params, batch, rng)
        return metrics

    return jax.jit(eval_step)

"""Train-state pytree and optimizer construction.

Optimizer parity with the reference (src/model.py:756-758 +
configs/training/train_vae_default.yaml:79-87): AdamW(lr=1e-4,
betas=(0.9, 0.95), eps=1e-8, weight_decay=0.05) applied to ALL parameters
(the reference uses a single param group, so norm scales, biases and the
scalar logvar all receive weight decay), preceded by global-norm gradient
clipping at 1.0 (src/train_utils.py:175).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array         # int32 scalar
    params: Any             # model parameter pytree (float32)
    opt_state: Any
    rng: jax.Array          # PRNG key threaded through training
    # EMA(0.99)-smoothed metrics, updated ON DEVICE inside the train step so
    # the host never synchronizes per step (reference smooths on host every
    # step, src/train_utils.py:246-248 — same math, zero sync cost).
    ema: Any = None         # dict[str, f32 scalar] or None before first use


def make_optimizer(lr: float = 1e-4, betas=(0.9, 0.95), eps: float = 1e-8,
                   weight_decay: float = 0.05,
                   max_grad_norm: Optional[float] = 1.0
                   ) -> optax.GradientTransformation:
    parts = []
    if max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(optax.adamw(learning_rate=lr, b1=betas[0], b2=betas[1],
                             eps=eps, weight_decay=weight_decay))
    return optax.chain(*parts)


def make_optimizer_from_config(optimizer_config: Dict[str, Any],
                               max_grad_norm: Optional[float] = 1.0,
                               n_steps: Optional[int] = None
                               ) -> optax.GradientTransformation:
    """Build from a training-config 'optimizer' section (reference schema).

    `schedule: cosine|linear` (+ warmup_steps/min_lr/decay_steps) selects a
    learning-rate schedule (train/schedules.py lr_schedule); the default
    stays the reference's constant lr. Pass n_steps when the config may
    carry a schedule — it is the decay horizon default."""
    cfg = optimizer_config or {}
    if cfg.get("schedule", "constant") != "constant":
        from tempo_tpu.train.schedules import lr_schedule

        if n_steps is None and "decay_steps" not in cfg:
            raise ValueError(
                "FATAL: optimizer.schedule needs n_steps (or an explicit "
                "optimizer.decay_steps) for the decay horizon")
        lr = lr_schedule(cfg, n_steps if n_steps is not None else 0)
    else:
        lr = cfg.get("lr", 1e-4)
    return make_optimizer(
        lr=lr,
        betas=tuple(cfg.get("betas", (0.9, 0.95))),
        eps=cfg.get("eps", 1e-8),
        weight_decay=cfg.get("weight_decay", 0.05),
        max_grad_norm=max_grad_norm,
    )


def create_train_state(params: Any, tx: optax.GradientTransformation,
                       rng: jax.Array) -> TrainState:
    # jit the optimizer init: eagerly it dispatches one tiny op per parameter
    # leaf, which is pathological on high-latency device transports.
    opt_state = jax.jit(tx.init)(params)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=opt_state,
        rng=rng,
        ema=None,
    )

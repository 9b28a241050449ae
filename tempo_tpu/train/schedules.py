"""Checkpoint-step and learning-rate schedules.

sqrt_save_steps reproduces the reference's (unused but public) sqrt save
schedule (reference: src/train_utils.py:41-63): checkpoint steps spaced as
sqrt(linspace(0,1))*n_steps, deduplicated and guaranteed to include the
final step — checkpoint density increases toward the end of training.

lr_schedule builds the learning-rate schedule from a training-config
'optimizer' section. The reference trains at a constant lr everywhere
(src/train_utils.py AdamW with a fixed lr; no scheduler object in the
repo), so 'constant' is the default; 'cosine' (linear warmup -> cosine
decay to min_lr, the standard GPT recipe) and 'linear' (warmup -> linear
decay) are framework capabilities on top. The returned value is either a
float (constant — keeps jitted step programs identical to round-2 ones)
or an optax schedule callable, both accepted by optax.adamw.
"""

from __future__ import annotations

from typing import Any, Dict, List, Union

import numpy as np
import optax


def lr_schedule(optimizer_cfg: Dict[str, Any],
                n_steps: int) -> Union[float, optax.Schedule]:
    cfg = optimizer_cfg or {}
    lr = float(cfg.get("lr", 1e-4))
    kind = str(cfg.get("schedule", "constant"))
    if kind == "constant":
        return lr
    warmup = int(cfg.get("warmup_steps", 0))
    min_lr = float(cfg.get("min_lr", 0.0))
    decay_steps = int(cfg.get("decay_steps", n_steps))
    if not 0 <= warmup <= decay_steps:
        raise ValueError(
            f"FATAL: warmup_steps {warmup} outside [0, {decay_steps}]")
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup else lr, peak_value=lr,
            warmup_steps=warmup, decay_steps=decay_steps,
            end_value=min_lr)
    if kind == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0 if warmup else lr, lr, max(warmup, 1)),
             optax.linear_schedule(lr, min_lr, max(decay_steps - warmup, 1))],
            boundaries=[warmup])
    raise ValueError(
        f"FATAL: optimizer.schedule must be 'constant', 'cosine' or "
        f"'linear', got {kind!r}")


def sqrt_save_steps(n_steps: int, n_saves: int = 100) -> List[int]:
    sqrt_points = np.sqrt(np.linspace(0, 1, n_saves))
    save_steps = (sqrt_points * n_steps).astype(int)
    save_steps = sorted(set(save_steps.tolist()))
    if n_steps not in save_steps:
        save_steps.append(n_steps)
    return save_steps

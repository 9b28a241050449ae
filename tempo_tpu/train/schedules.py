"""Checkpoint-step schedules.

sqrt_save_steps reproduces the reference's (unused but public) sqrt save
schedule (reference: src/train_utils.py:41-63): checkpoint steps spaced as
sqrt(linspace(0,1))*n_steps, deduplicated and guaranteed to include the
final step — checkpoint density increases toward the end of training.
"""

from __future__ import annotations

from typing import List

import numpy as np


def sqrt_save_steps(n_steps: int, n_saves: int = 100) -> List[int]:
    sqrt_points = np.sqrt(np.linspace(0, 1, n_saves))
    save_steps = (sqrt_points * n_steps).astype(int)
    save_steps = sorted(set(save_steps.tolist()))
    if n_steps not in save_steps:
        save_steps.append(n_steps)
    return save_steps

"""Running-metric tracking and metrics.json output.

Parity with the reference trainer's observability (src/train_utils.py:
246-262, 303-315): EMA(alpha=0.99) smoothing of per-step metrics, appended to
a history every log_every steps, and a final metrics.json of
{"train": [...], "val": [...]}.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Union


class RunningMetrics:
    """EMA-smoothed metrics; first update seeds the average (alpha=0 on the
    first step, exactly like the reference)."""

    def __init__(self, alpha: float = 0.99):
        self.alpha = alpha
        self.values: Dict[str, float] = {}

    def update(self, metrics: Dict[str, float]) -> Dict[str, float]:
        alpha = self.alpha if self.values else 0.0
        for k, v in metrics.items():
            self.values[k] = alpha * self.values.get(k, 0.0) + (1 - alpha) * float(v)
        return dict(self.values)

    def snapshot(self) -> Dict[str, float]:
        return dict(self.values)


def save_metrics(output_dir: Union[str, Path], train_metrics: List[Dict],
                 val_metrics: List[Dict]) -> Path:
    path = Path(output_dir) / "metrics.json"
    with open(path, "w") as f:
        json.dump({"train": train_metrics, "val": val_metrics}, f, indent=2)
    return path


class JsonlSink:
    """Metric sink appending one JSON line per emission to a .jsonl file —
    the pluggable observability hook matching the reference's latent wandb
    capability (wired only in its inactive mltools, src/mltools/
    ml_utils.py:30-31). Pass instances via Trainer(metric_sinks=[...]);
    signature: sink(step, metrics_dict, kind) with kind in {'train','val'}."""

    def __init__(self, path: Union[str, Path]):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def __call__(self, step: int, metrics: Dict[str, float], kind: str) -> None:
        record = {"step": step, "kind": kind, **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

"""Checkpoint-sweep reconstruction evaluation.

Parity with the reference sweep (reference:
src/scripts/evaluate_reconstruction.py:23-95): for each ckpt_step=* in an
experiment's checkpoints/, run the validation tiles through the model and
report per-sample MSE / MAE / PSNR (PSNR uses max_val=20 — the [-10, 10]
clipped z-score range) averaged over samples.

TPU-first: tiles are evaluated through one jitted batched reconstruct; the
per-sample metric reductions happen on-device.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from tempo_tpu.models.vae import AutoencoderKL
from tempo_tpu.train.checkpoint import (
    CKPT_PREFIX,
    checkpoint_step,
    list_checkpoints,
    load_params,
)

PSNR_MAX_VAL = 20.0  # data range [-10, 10] after clipping


def _load_ckpt_params(path: Path, params_template):
    """Load checkpoint parameters from either a native msgpack checkpoint or
    a reference torch .pt checkpoint (converted on the fly through the
    interop layer) — the reference analysis consumes its own ckpt_step=*.pt
    files directly (reference:
    src/scripts/evaluate_reconstruction.py:145-149), so the sweep does too."""
    return load_params(path, params_template)


def compute_metrics(gt: np.ndarray, recon: np.ndarray,
                    metrics_list: Sequence[str]) -> Dict[str, float]:
    """Whole-tensor metrics (reference: evaluate_reconstruction.py:23-42)."""
    gt = np.asarray(gt, dtype=np.float64).ravel()
    recon = np.asarray(recon, dtype=np.float64).ravel()
    out: Dict[str, float] = {}
    for metric in metrics_list:
        if metric == "mse":
            out["mse"] = float(np.mean((gt - recon) ** 2))
        elif metric == "mae":
            out["mae"] = float(np.mean(np.abs(gt - recon)))
        elif metric == "psnr":
            mse = float(np.mean((gt - recon) ** 2))
            out["psnr"] = float(10 * np.log10(PSNR_MAX_VAL ** 2 / (mse + 1e-10)))
    return out


def _make_batch_metrics_fn(model: AutoencoderKL, with_pk: bool = False):
    pk = None
    if with_pk:
        from tempo_tpu.analysis.spectrum import pk_op

        # tiles are square; the operator is shape-only and built once
        pk = pk_op(model.config.input_size, 2)

    @jax.jit
    def batch_metrics(params, batch, rng):
        recon = model.apply({"params": params}, batch, rng=rng,
                            method=AutoencoderKL.reconstruct)
        diff = (batch.astype(jnp.float32) - recon.astype(jnp.float32))
        axes = tuple(range(1, batch.ndim))
        mse = jnp.mean(jnp.square(diff), axis=axes)
        mae = jnp.mean(jnp.abs(diff), axis=axes)
        psnr = 10.0 * jnp.log10(PSNR_MAX_VAL ** 2 / (mse + 1e-10))
        out = {"mse": mse, "mae": mae, "psnr": psnr}
        if pk is not None:
            # spatial-spectrum fidelity: mean |log10 ratio| of the radial
            # power spectra — pixel-MSE misses blur/over-smoothing that
            # this catches (framework extra; no reference counterpart)
            from tempo_tpu.analysis.spectrum import get_pk

            pk_gt = get_pk(batch.astype(jnp.float32), pk)
            pk_re = get_pk(recon.astype(jnp.float32), pk)
            ratio = jnp.log10((pk_re + 1e-12) / (pk_gt + 1e-12))
            out["pk_err"] = jnp.mean(jnp.abs(ratio), axis=(1, 2))
        return out

    return batch_metrics


def evaluate_checkpoint(model: AutoencoderKL, params, val_tiles: np.ndarray,
                        batch_size: int = 8,
                        metrics_list: Sequence[str] = ("mse", "mae", "psnr"),
                        seed: int = 42) -> Dict[str, float]:
    """val_tiles: [N, H, W, C]. Returns sample-averaged metrics.

    metrics_list may include 'pk_err' (mean |log10| radial power-spectrum
    ratio, lower is better) alongside the reference's mse/mae/psnr."""
    batch_metrics = _make_batch_metrics_fn(model,
                                           with_pk="pk_err" in metrics_list)
    rng = jax.random.PRNGKey(seed)
    acc: Dict[str, List[float]] = {m: [] for m in metrics_list}
    n = val_tiles.shape[0]
    # fixed batch shape (pad the tail) => exactly one compile
    for start in range(0, n, batch_size):
        chunk = val_tiles[start:start + batch_size]
        valid = chunk.shape[0]
        if valid < batch_size:
            pad = np.repeat(chunk[-1:], batch_size - valid, axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        rng, sub = jax.random.split(rng)
        out = jax.device_get(batch_metrics(params, jnp.asarray(chunk), sub))
        for m in metrics_list:
            acc[m].extend(np.asarray(out[m][:valid]).tolist())
    return {m: float(np.mean(v)) for m, v in acc.items()}


def evaluate_checkpoints(model: AutoencoderKL, params_template,
                         ckpt_dir: Union[str, Path], val_tiles: np.ndarray,
                         batch_size: int = 8,
                         metrics_list: Sequence[str] = ("mse", "mae", "psnr"),
                         max_checkpoints: int | None = None,
                         pattern: str | None = None,
                         verbose: bool = True) -> List[Dict]:
    """Sweep every ckpt_step=* checkpoint — native .msgpack and reference
    torch .pt alike — or a custom glob `pattern` relative to ckpt_dir;
    returns [{'checkpoint', 'step', <metrics>...}] sorted by step."""
    results = []
    if pattern is not None:
        paths = sorted(Path(ckpt_dir).glob(pattern), key=checkpoint_step)
    else:
        paths = list_checkpoints(ckpt_dir)
        paths += sorted(Path(ckpt_dir).glob(f"{CKPT_PREFIX}*.pt"))
        paths = sorted(paths, key=checkpoint_step)
    if max_checkpoints is not None:
        paths = paths[:max_checkpoints]
    if not paths:
        raise ValueError(f"FATAL: no checkpoints found in {ckpt_dir}")
    for path in paths:
        params = _load_ckpt_params(path, params_template)
        metrics = evaluate_checkpoint(model, params, val_tiles, batch_size,
                                      metrics_list)
        entry = {"checkpoint": path.name, "step": checkpoint_step(path),
                 **metrics}
        results.append(entry)
        if verbose:
            print(f"{path.name}: {metrics}")
    return results

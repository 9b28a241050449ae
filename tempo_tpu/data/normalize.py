"""Normalization semantics for spectral radiance and L2 product fields.

Exact behavioral parity with the reference preprocessing:

Spectral (reference: src/scripts/prepare_tempo_tiles.py:70-83):
  z = clip((log(clamp(rad, min_radiance)) - mean) / (std + 1e-8),
           clip_min, clip_max)
  with per-channel global mean/std (or per-file stats as fallback).

L2 products (reference: src/scripts/prepare_tempo_tiles_with_l2.py:119-168
and src/scripts/linear_probe_analysis.py:85-127):
  zscore : (x - mean) / (std + 1e-8)
  minmax : (x - min) / (max - min + 1e-8)
  asinh  : asinh(x / (1.4826 * MAD + 1e-8))   [no median subtraction]
  logit  : log(s / (1 - s)), s = eps + (1 - 2 eps) x, eps = 0.01
NaNs pass through every transform untouched.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def normalize_radiance(rad: np.ndarray,
                       mean_spectrum: Optional[np.ndarray] = None,
                       std_spectrum: Optional[np.ndarray] = None,
                       min_radiance: float = 1.0,
                       clip_min: float = -10.0,
                       clip_max: float = 10.0) -> np.ndarray:
    """rad: [..., spectral] -> z-scored log radiance, same shape."""
    log_rad = np.log(np.clip(rad, min_radiance, None))
    if mean_spectrum is not None and std_spectrum is not None:
        z = (log_rad - mean_spectrum) / (std_spectrum + 1e-8)
    else:
        axes = tuple(range(log_rad.ndim - 1))
        mean = log_rad.mean(axis=axes)
        std = log_rad.std(axis=axes)
        z = (log_rad - mean) / (std + 1e-8)
    return np.clip(z, clip_min, clip_max).astype(np.float32)


def compute_l2_stats(values: np.ndarray, norm_type: str) -> Optional[Dict[str, float]]:
    """Stats from valid (non-NaN) values, matching the reference's per-type
    statistics (MAD scale for asinh, fixed eps for logit)."""
    valid = values[~np.isnan(values)]
    if valid.size == 0:
        return None
    if norm_type == "zscore":
        return {"mean": float(np.mean(valid)), "std": float(np.std(valid))}
    if norm_type == "minmax":
        return {"min": float(np.min(valid)), "max": float(np.max(valid))}
    if norm_type == "asinh":
        median = float(np.median(valid))
        mad = float(np.median(np.abs(valid - median)))
        return {"scale": 1.4826 * mad, "median": median}
    if norm_type == "logit":
        return {"eps": 0.01}
    raise ValueError(f"Unknown normalization type: {norm_type}")


def normalize_l2(data: np.ndarray, norm_type: str,
                 stats: Optional[Dict[str, float]] = None
                 ) -> Tuple[np.ndarray, Optional[Dict[str, float]]]:
    """Returns (normalized, stats); stats computed from `data` when None."""
    if stats is None:
        stats = compute_l2_stats(data, norm_type)
        if stats is None:
            return data, None

    if norm_type == "zscore":
        out = (data - stats["mean"]) / (stats["std"] + 1e-8)
    elif norm_type == "minmax":
        out = (data - stats["min"]) / (stats["max"] - stats["min"] + 1e-8)
    elif norm_type == "asinh":
        out = np.arcsinh(data / (stats["scale"] + 1e-8))
    elif norm_type == "logit":
        eps = stats["eps"]
        squeezed = eps + (1 - 2 * eps) * data
        squeezed = np.where(np.isnan(data), np.nan, squeezed)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.log(squeezed / (1 - squeezed))
    else:
        raise ValueError(f"Unknown normalization type: {norm_type}")
    return out.astype(np.float32), stats

#!/usr/bin/env python3
"""Compute global per-channel mean/std of log radiance for normalization.

Parity with the reference (src/scripts/compute_tempo_stats.py:20-123), with a
streaming twist: statistics accumulate as (count, sum, sumsq) per channel so
memory stays flat instead of vstacking every pixel. Population std (ddof=0)
matches numpy's default used by the reference.

Outputs: tempo_mean_spectrum.npy/.txt, tempo_std_spectrum.npy/.txt,
manifest.yaml (+ mean_spectrum.npy/std_spectrum.npy aliases that the tile
prep and loaders accept).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tempo_tpu.cli import run_cli
from tempo_tpu.data.granule import DEFAULT_BAND, read_radiance
from tempo_tpu.utils.config import copy_config, load_config, require_keys, save_yaml
from tempo_tpu.utils.dirs import init_directory


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    require_keys(config, ["output_dir", "input_dir"])

    input_dir = Path(config["input_dir"])
    if not input_dir.exists():
        raise ValueError(f"FATAL: input_dir doesn't exist: {input_dir}")

    output_dir = init_directory(config["output_dir"], overwrite=overwrite)
    copy_config(config_path, output_dir)

    nc_files = sorted(input_dir.glob("**/*.nc"))
    if not nc_files:
        raise ValueError(f"No .nc files found in {input_dir}")

    max_files = config.get("max_files", 10)
    if debug:
        max_files = min(3, max_files)
    n_files = min(max_files, len(nc_files))
    print(f"Computing statistics from {n_files} files (of {len(nc_files)} total)")

    band = config.get("band", DEFAULT_BAND)
    min_radiance = config.get("min_radiance", 1.0)

    count = 0
    total = None
    total_sq = None
    for nc_path in nc_files[:n_files]:
        try:
            rad = read_radiance(nc_path, band)
        except (OSError, KeyError) as e:
            print(f"  Error with {nc_path.name}: {e}")
            continue
        log_rad = np.log(np.clip(rad, min_radiance, None)).astype(np.float64)
        flat = log_rad.reshape(-1, log_rad.shape[-1])
        if total is None:
            total = flat.sum(axis=0)
            total_sq = (flat ** 2).sum(axis=0)
        else:
            total += flat.sum(axis=0)
            total_sq += (flat ** 2).sum(axis=0)
        count += flat.shape[0]

    if count == 0:
        raise ValueError("FATAL: No files could be loaded")

    mean_spectrum = (total / count).astype(np.float32)
    var = total_sq / count - (total / count) ** 2
    std_spectrum = np.sqrt(np.clip(var, 0, None)).astype(np.float32)

    print(f"Total pixels: {count:,}")
    print(f"  Mean range: [{mean_spectrum.min():.3f}, {mean_spectrum.max():.3f}]")
    print(f"  Std range: [{std_spectrum.min():.3f}, {std_spectrum.max():.3f}]")

    for name, arr in [("tempo_mean_spectrum", mean_spectrum),
                      ("tempo_std_spectrum", std_spectrum)]:
        np.save(output_dir / f"{name}.npy", arr)
        np.savetxt(output_dir / f"{name}.txt", arr)
    # aliases matching the tiles-directory naming the loaders accept
    np.save(output_dir / "mean_spectrum.npy", mean_spectrum)
    np.save(output_dir / "std_spectrum.npy", std_spectrum)

    save_yaml({
        "n_files_used": n_files,
        "total_pixels": int(count),
        "band": band,
        "min_radiance": min_radiance,
        "mean_range": [float(mean_spectrum.min()), float(mean_spectrum.max())],
        "std_range": [float(std_spectrum.min()), float(std_spectrum.max())],
    }, output_dir / "manifest.yaml")
    print("Done!")


if __name__ == "__main__":
    run_cli(main, "Compute TEMPO normalization statistics")

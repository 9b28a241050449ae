#!/usr/bin/env python3
"""Extract PCA components from normalized TEMPO spectra.

Parity with the reference (src/scripts/extract_pca_components.py:22-181):
sample `pixels_per_file` random normalized pixels from up to `max_files`
granules, fit `n_components` PCA, save components/mean/explained-variance and
sample projections plus a summary.yaml. (SVD-based PCA, sklearn-equivalent —
see tempo_tpu.analysis.pca.)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tempo_tpu.analysis.pca import fit_pca
from tempo_tpu.cli import run_cli
from tempo_tpu.data.granule import DEFAULT_BAND, read_radiance
from tempo_tpu.data.normalize import normalize_radiance
from tempo_tpu.utils.config import copy_config, load_config, require_keys, save_yaml
from tempo_tpu.utils.dirs import init_directory


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    require_keys(config, ["output_dir", "input_dir", "normalization",
                          "sampling", "pca"])

    input_dir = Path(config["input_dir"])
    if not input_dir.exists():
        raise ValueError(f"FATAL: input_dir doesn't exist: {input_dir}")

    output_dir = init_directory(config["output_dir"], overwrite=overwrite)
    copy_config(config_path, output_dir)

    norm_cfg = config["normalization"]
    mean_path, std_path = Path(norm_cfg["mean_file"]), Path(norm_cfg["std_file"])
    for p in (mean_path, std_path):
        if not p.exists():
            raise ValueError(f"FATAL: stats file doesn't exist: {p}")

    def load_spec(p: Path) -> np.ndarray:
        if p.suffix == ".pt":
            import torch

            return torch.load(p, weights_only=False).numpy()
        return np.load(p)

    mean_spectrum = load_spec(mean_path).astype(np.float32)
    std_spectrum = load_spec(std_path).astype(np.float32)

    params = config.get("processing", {})
    sampling = config["sampling"]
    rng = np.random.default_rng(sampling.get("seed", 42))

    nc_files = sorted(input_dir.glob("*.nc")) or sorted(input_dir.glob("**/*.nc"))
    if not nc_files:
        raise ValueError(f"No .nc files found in {input_dir}")
    max_files = sampling["max_files"]
    if debug:
        max_files = min(3, max_files)
    nc_files = nc_files[:max_files]

    print(f"Processing {len(nc_files)} files, "
          f"{sampling['pixels_per_file']} pixels each")

    all_samples = []
    for nc_path in nc_files:
        try:
            rad = read_radiance(nc_path, params.get("band", DEFAULT_BAND))
        except (OSError, KeyError) as e:
            print(f"Error processing {nc_path}: {e}")
            continue
        z = normalize_radiance(
            rad, mean_spectrum, std_spectrum,
            min_radiance=params.get("min_radiance", 1.0),
            clip_min=params.get("clip_min", -10),
            clip_max=params.get("clip_max", 10))
        flat = z.reshape(-1, z.shape[-1])
        n_sample = min(sampling["pixels_per_file"], flat.shape[0])
        idx = rng.choice(flat.shape[0], n_sample, replace=False)
        all_samples.append(flat[idx])

    X = np.concatenate(all_samples, axis=0)
    print(f"Collected samples shape: {X.shape}")

    n_components = config["pca"]["n_components"]
    pca = fit_pca(X, n_components)
    print(f"Explained variance ratio: {pca.explained_variance_ratio}")
    print(f"Total variance explained: {pca.explained_variance_ratio.sum():.4f}")

    pca.save(output_dir / "pca_components.npz")
    np.save(output_dir / "sample_projections.npy", pca.transform(X))

    save_yaml({
        "n_files_processed": len(nc_files),
        "pixels_per_file": sampling["pixels_per_file"],
        "total_samples": int(X.shape[0]),
        "n_spectral_channels": int(X.shape[1]),
        "n_components": n_components,
        "explained_variance_ratio": pca.explained_variance_ratio.tolist(),
        "total_variance_explained": float(pca.explained_variance_ratio.sum()),
    }, output_dir / "summary.yaml")
    print("Done!")


if __name__ == "__main__":
    run_cli(main, "Extract PCA components from TEMPO spectra")

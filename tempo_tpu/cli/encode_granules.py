#!/usr/bin/env python3
"""Full-granule latent encode/decode sweep.

Serves the reference's inference surface (SURVEY.md SS3.5: `encode(granule)`,
`decode(z)`, `reconstruct(granule)` at arbitrary /64 sizes) as a batch job:
for every granule in a directory (or an explicit list), normalize exactly as
training, run ONE whole-granule encoder forward, and persist the
posterior-mean latent [H/4, W/4, Z] as .npz; optionally decode back and
record reconstruction metrics per granule (the encode/decode throughput and
fidelity sweep of PROGRESS config #4).

Config keys: output_dir, input_dir (or nc_files list), tiles_path (norm
stats), model.{checkpoint_path,training_config_path}, decode_roundtrip,
max_files.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import numpy as np

from tempo_tpu.cli import run_cli
from tempo_tpu.data.granule import read_radiance
from tempo_tpu.data.loader import load_normalization_stats
from tempo_tpu.infer.granule_codec import GranuleCodec
from tempo_tpu.infer.sweep import compute_metrics
from tempo_tpu.models.vae import build_vae
from tempo_tpu.train.checkpoint import load_params
from tempo_tpu.utils.config import copy_config, load_config, require_keys
from tempo_tpu.utils.dirs import init_directory


def main(config_path: str, overwrite: bool = False, debug: bool = False) -> None:
    config = load_config(config_path)
    require_keys(config, ["output_dir", "model"])

    output_dir = init_directory(config["output_dir"], overwrite=overwrite)
    copy_config(config_path, output_dir)
    latents_dir = output_dir / "latents"
    latents_dir.mkdir(exist_ok=True)

    if "nc_files" in config:
        nc_files = [Path(f) for f in config["nc_files"]]
    else:
        require_keys(config, ["input_dir"])
        input_dir = Path(config["input_dir"])
        nc_files = sorted(input_dir.glob("**/*.nc"))
    if not nc_files:
        raise ValueError("FATAL: no granules to encode")
    max_files = config.get("max_files")
    if debug:
        max_files = 2
    if max_files:
        nc_files = nc_files[:max_files]

    mean_spectrum = std_spectrum = None
    if "tiles_path" in config.get("data", {}):
        mean_spectrum, std_spectrum = load_normalization_stats(
            Path(config["data"]["tiles_path"]))

    train_config = load_config(config["model"]["training_config_path"])
    model, model_cfg = build_vae(train_config.get("model", {}))
    tile = model_cfg.input_size
    sample = np.zeros((1, tile, tile, model_cfg.in_channels), np.float32)
    init_fn = jax.jit(lambda k1, k2, x: model.init(k1, x, rng=k2))
    params_template = init_fn(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                              sample)["params"]
    params = load_params(config["model"]["checkpoint_path"], params_template)
    # spatial_sharding: true splits every whole-granule forward along the
    # track axis across all chips (for granules past one chip's HBM)
    mesh = None
    if config.get("spatial_sharding", False) and jax.device_count() > 1:
        from tempo_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
        print(f"Spatially sharding granules over {jax.device_count()} chips")
    codec = GranuleCodec(model, params, mean_spectrum, std_spectrum,
                         multiple=tile, seed=config.get("seed", 42),
                         mesh=mesh,
                         shape_bucket=int(config.get("shape_bucket", 1)))

    decode_roundtrip = bool(config.get("decode_roundtrip", False))
    results = []
    total_pixels = 0
    t_start = time.perf_counter()
    for nc_file in nc_files:
        rad = read_radiance(nc_file)
        gt = codec.normalize(rad)
        t0 = time.perf_counter()
        latent = np.asarray(codec.encode(gt))
        encode_s = time.perf_counter() - t0
        np.savez(latents_dir / f"{nc_file.stem}.npz", latent=latent,
                 shape=np.asarray(gt.shape))
        entry = {
            "granule": nc_file.name,
            "input_shape": list(gt.shape),
            "latent_shape": list(latent.shape),
            "encode_seconds": encode_s,
        }
        if decode_roundtrip:
            t0 = time.perf_counter()
            recon = codec.decode(latent)
            entry["decode_seconds"] = time.perf_counter() - t0
            entry.update(compute_metrics(gt, recon, ["mse", "mae", "psnr"]))
        total_pixels += gt.shape[0] * gt.shape[1]
        results.append(entry)
        print(f"{nc_file.name}: latent {latent.shape} "
              f"({entry['encode_seconds']:.2f}s)")

    elapsed = time.perf_counter() - t_start
    summary = {
        "n_granules": len(results),
        "total_pixels": int(total_pixels),
        "elapsed_seconds": elapsed,
        "pixels_per_second": total_pixels / max(elapsed, 1e-9),
        "granules": results,
    }
    with open(output_dir / "encode_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(f"\nEncoded {len(results)} granules in {elapsed:.1f}s "
          f"({summary['pixels_per_second']:.0f} px/s)")


if __name__ == "__main__":
    run_cli(main, "Encode granules to latents (full-granule inference sweep)")

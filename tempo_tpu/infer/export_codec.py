"""AOT export of the trained codec for serving.

Serializes the jitted encode/decode (params baked in) to portable
StableHLO artifacts via jax.export — a serving host can run them with NO
model code, config, or checkpoint importer, just `jax.export.deserialize`.
Batch size is exported as a symbolic dimension so one artifact serves any
batch. The reference has no serving story (analysis re-instantiates the
torch model from source every time); this is the TPU-native equivalent of
shipping a compiled SavedModel.

Artifacts (one directory):
  encode.stablehlo   [b, H, W, C_spectral] -> [b, H/4, W/4, embed]   (mean)
  decode.stablehlo   [b, H/4, W/4, embed]  -> [b, H, W, C_spectral]
  meta.json          shapes/dtypes/config provenance
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import export as jexport

from tempo_tpu.models.vae import AutoencoderKL, VAEConfig


def export_codec(params, config: VAEConfig, out_dir: Union[str, Path],
                 tile_hw: Tuple[int, int] = (64, 64)) -> Path:
    """Write encode/decode StableHLO artifacts with `params` baked in."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    model = AutoencoderKL(config)
    h, w = tile_hw
    c = config.shape[0]
    f = 2 ** (len(config.chs) - 1)
    zc = config.embed_dim

    def encode(x):
        return model.apply({"params": params}, x,
                           method=AutoencoderKL.encode).mean

    def decode(z):
        return model.apply({"params": params}, z,
                           method=AutoencoderKL.decode)

    (b,) = jexport.symbolic_shape("b")
    enc_spec = jax.ShapeDtypeStruct((b, h, w, c), jnp.float32)
    dec_spec = jax.ShapeDtypeStruct((b, h // f, w // f, zc), jnp.float32)

    # cross-platform lowering: one artifact serves CPU and TPU hosts
    # regardless of which platform ran the export
    platforms = ("cpu", "tpu")
    enc = jexport.export(jax.jit(encode), platforms=platforms)(enc_spec)
    dec = jexport.export(jax.jit(decode), platforms=platforms)(dec_spec)
    (out_dir / "encode.stablehlo").write_bytes(enc.serialize())
    (out_dir / "decode.stablehlo").write_bytes(dec.serialize())
    (out_dir / "meta.json").write_text(json.dumps({
        "spectral_channels": c,
        "tile_hw": [h, w],
        "latent_hw": [h // f, w // f],
        "embed_dim": zc,
        "downsample_factor": f,
        "compute_dtype": config.compute_dtype,
        "format": "jax.export StableHLO",
        "platforms": list(platforms),
    }, indent=2))
    return out_dir


def load_exported(out_dir: Union[str, Path]):
    """Returns (encode_fn, decode_fn, meta) rehydrated from the artifacts —
    callable with any batch size, no model code needed."""
    out_dir = Path(out_dir)
    enc = jexport.deserialize((out_dir / "encode.stablehlo").read_bytes())
    dec = jexport.deserialize((out_dir / "decode.stablehlo").read_bytes())
    meta = json.loads((out_dir / "meta.json").read_text())
    return jax.jit(enc.call), jax.jit(dec.call), meta

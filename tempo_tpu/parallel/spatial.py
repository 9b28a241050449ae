"""Spatial sharding for whole-granule inference (the context-parallel
analogue for conv nets — SURVEY.md SS5.7).

A full TEMPO granule activation ([1, 128, 2048, 1028] and 512-channel
feature maps behind it) can exceed a single chip's comfortable HBM budget at
higher batch or larger scenes. Convolution is translation-equivariant, so
the granule can be split along the track (W) axis across the mesh; under
jit, XLA's SPMD partitioner inserts the halo exchanges each 3x3 conv and
stride-2 resample needs over ICI automatically — no manual ppermute. This
module provides the sharding rules and a sharded encode/decode wrapper.

Constraint: W must be divisible by (devices * total stride) so the strided
resamples stay aligned to the shard boundaries; the /64-crop contract
already guarantees 64 | W, so any power-of-two mesh up to 16 qualifies.
"""

from __future__ import annotations

import functools
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tempo_tpu.models.vae import AutoencoderKL

SPATIAL_AXIS = "data"  # reuse the mesh's single axis for spatial splits


def spatial_sharding(mesh: Mesh, axis_name: str = SPATIAL_AXIS) -> NamedSharding:
    """[B, H, W, C] arrays sharded along W."""
    return NamedSharding(mesh, P(None, None, axis_name, None))


def encode_spatially_sharded(model: AutoencoderKL, params, granule_bhwc,
                             mesh: Mesh, axis_name: str = SPATIAL_AXIS):
    """Whole-granule encode with the track axis sharded across the mesh.
    Returns the posterior-mean latent with the same W-sharding (1/4 grid)."""
    sharding = spatial_sharding(mesh, axis_name)
    x = jax.device_put(granule_bhwc, sharding)
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)

    @functools.partial(jax.jit, out_shardings=sharding)
    def encode(params, x):
        return model.apply({"params": params}, x,
                           method=AutoencoderKL.encode).mean

    return encode(params, x)


def decode_spatially_sharded(model: AutoencoderKL, params, latent_bhwc,
                             mesh: Mesh, axis_name: str = SPATIAL_AXIS):
    sharding = spatial_sharding(mesh, axis_name)
    z = jax.device_put(latent_bhwc, sharding)
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)

    @functools.partial(jax.jit, out_shardings=sharding)
    def decode(params, z):
        return model.apply({"params": params}, z,
                           method=AutoencoderKL.decode)

    return decode(params, z)

"""Full-granule encode/decode at arbitrary /64 spatial sizes.

Inference API parity with the reference analysis path (reference:
src/scripts/analyze_reconstruction.py:96-130 and
linear_probe_analysis.py:113-146): normalize exactly as training, crop H and
W down to multiples of the tile size, run ONE forward over the whole granule
(e.g. [1, 128, 2048, 1028]), return the reconstruction and/or posterior-mean
latent on the 4x-downsampled grid.

XLA static shapes: jitted encode/decode are cached per (H, W) shape class;
TEMPO granules share a handful of shapes (131x2048 etc.), so in practice each
shape compiles once per process. shape_bucket > 1 coarsens the crop grid
(multiple * shape_bucket) to bound recompiles further on heterogeneous
archives.

With a mesh, every forward routes through the spatial (halo) sharding in
tempo_tpu.parallel.spatial: the track axis is split across the devices and
XLA inserts the conv halo exchanges — granules larger than one chip's HBM
decode across the slice (test-pinned equal to the unsharded result).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tempo_tpu.data.normalize import normalize_radiance
from tempo_tpu.models.vae import AutoencoderKL


def crop_to_multiple(arr: np.ndarray, multiple: int = 64) -> np.ndarray:
    """[mirror, track, spectral] -> cropped so mirror/track % multiple == 0."""
    h = (arr.shape[0] // multiple) * multiple
    w = (arr.shape[1] // multiple) * multiple
    return arr[:h, :w]


class GranuleCodec:
    """Whole-granule encoder/decoder around a trained AutoencoderKL."""

    def __init__(self, model: AutoencoderKL, params,
                 mean_spectrum: Optional[np.ndarray] = None,
                 std_spectrum: Optional[np.ndarray] = None,
                 multiple: int = 64, seed: int = 42,
                 mesh=None, shape_bucket: int = 1):
        self.model = model
        self.mean_spectrum = mean_spectrum
        self.std_spectrum = std_spectrum
        self.multiple = multiple * shape_bucket
        self.rng = jax.random.PRNGKey(seed)
        self.mesh = mesh

        if mesh is not None:
            from tempo_tpu.parallel.mesh import replicate_sharding
            from tempo_tpu.parallel.spatial import spatial_sharding

            self._sharding = spatial_sharding(mesh)
            params = jax.device_put(params, replicate_sharding(mesh))
            # a single sharding broadcasts over the output pytree (the
            # posterior's mean/logvar leaves share the [B,h,w,c] layout)
            import functools

            sharded_jit = functools.partial(jax.jit,
                                            out_shardings=self._sharding)
        else:
            self._sharding = None
            sharded_jit = jax.jit
        self.params = params

        self._encode = sharded_jit(lambda p, x: model.apply(
            {"params": p}, x, method=AutoencoderKL.encode))
        self._decode = sharded_jit(lambda p, z: model.apply(
            {"params": p}, z, method=AutoencoderKL.decode))
        self._reconstruct = sharded_jit(lambda p, x, rng: model.apply(
            {"params": p}, x, rng=rng, method=AutoencoderKL.reconstruct))

    def _put(self, arr) -> jax.Array:
        """Batchify + (optionally) shard the track axis across the mesh."""
        x = jnp.asarray(arr)[None]
        if self._sharding is not None:
            x = jax.device_put(x, self._sharding)
        return x

    # ------------------------------------------------------------ plumbing

    def normalize(self, rad: np.ndarray) -> np.ndarray:
        """Training-equivalent normalization + /multiple crop.
        rad: [mirror, track, spectral]."""
        z = normalize_radiance(rad, self.mean_spectrum, self.std_spectrum)
        return crop_to_multiple(z, self.multiple)

    # ------------------------------------------------------------- the API

    def encode(self, granule_hwc: np.ndarray) -> jax.Array:
        """Normalized [H, W, C] -> posterior MEAN latent [H/4, W/4, Z]
        (the representation the probes consume)."""
        posterior = self._encode(self.params, self._put(granule_hwc))
        return posterior.mean[0]

    def encode_posterior(self, granule_hwc: np.ndarray):
        return self._encode(self.params, self._put(granule_hwc))

    def decode(self, latent_hwc: jax.Array) -> np.ndarray:
        z = self._put(latent_hwc)
        return np.asarray(self._decode(self.params, z)[0])

    def reconstruct(self, granule_hwc: np.ndarray,
                    sample_posterior: bool = True) -> np.ndarray:
        """Normalized [H, W, C] -> single-forward reconstruction [H, W, C]."""
        x = self._put(granule_hwc)
        if sample_posterior:
            self.rng, sub = jax.random.split(self.rng)
            out = self._reconstruct(self.params, x, sub)
        else:
            posterior = self._encode(self.params, x)
            out = self._decode(self.params, posterior.mean)
        return np.asarray(out[0])

    def reconstruct_raw(self, rad: np.ndarray,
                        sample_posterior: bool = True
                        ) -> Tuple[np.ndarray, np.ndarray]:
        """Raw radiance [mirror, track, spectral] -> (normalized GT crop,
        reconstruction), both [H, W, C]."""
        gt = self.normalize(rad)
        return gt, self.reconstruct(gt, sample_posterior)

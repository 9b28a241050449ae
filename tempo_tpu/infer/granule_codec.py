"""Full-granule encode/decode at arbitrary /64 spatial sizes.

Inference API parity with the reference analysis path (reference:
src/scripts/analyze_reconstruction.py:96-130 and
linear_probe_analysis.py:113-146): normalize exactly as training, crop H and
W down to multiples of the tile size, run ONE forward over the whole granule
(e.g. [1, 128, 2048, 1028]), return the reconstruction and/or posterior-mean
latent on the 4x-downsampled grid.

XLA static shapes: jitted encode/decode are cached per (H, W) shape class;
TEMPO granules share a handful of shapes (131x2048 etc.), so in practice each
shape compiles once per process.
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
                 multiple: int = 64, seed: int = 42):
        self.model = model
        self.params = params
        self.mean_spectrum = mean_spectrum
        self.std_spectrum = std_spectrum
        self.multiple = multiple
        self.rng = jax.random.PRNGKey(seed)

        self._encode = jax.jit(lambda p, x: model.apply(
            {"params": p}, x, method=AutoencoderKL.encode))
        self._decode = jax.jit(lambda p, z: model.apply(
            {"params": p}, z, method=AutoencoderKL.decode))
        self._reconstruct = jax.jit(lambda p, x, rng: model.apply(
            {"params": p}, x, rng=rng, method=AutoencoderKL.reconstruct))

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
        x = jnp.asarray(granule_hwc)[None]
        posterior = self._encode(self.params, x)
        return posterior.mean[0]

    def encode_posterior(self, granule_hwc: np.ndarray):
        x = jnp.asarray(granule_hwc)[None]
        return self._encode(self.params, x)

    def decode(self, latent_hwc: jax.Array) -> np.ndarray:
        z = jnp.asarray(latent_hwc)[None]
        return np.asarray(self._decode(self.params, z)[0])

    def reconstruct(self, granule_hwc: np.ndarray,
                    sample_posterior: bool = True) -> np.ndarray:
        """Normalized [H, W, C] -> single-forward reconstruction [H, W, C]."""
        x = jnp.asarray(granule_hwc)[None]
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

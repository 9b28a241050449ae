"""Isotropic power spectra + spectrum matching (TPU-first).

TPU-native re-design of the reference toolkit's Fourier power-spectrum
utilities (reference: src/mltools/utils/pk_utils.py:3-72 — `get_ks_pkop`,
`get_pk`, `pk_rescale`) with identical math:

- Radial binning |k| -> floor(|k|+0.5) over the fftfreq grid.
- The binning operator is a *dense* (pk_len, N^dim) matrix applied as one
  matmul on the MXU, instead of the reference's sparse COO matrix (TPUs
  have no sparse kernels; at analysis sizes the dense operator is tiny and
  the matmul is effectively free).
- `get_pk` returns the mean squared Fourier amplitude per radial bin;
  `pk_rescale` multiplies each Fourier mode by sqrt(target_pk / pk) of its
  bin (a half-spectrum rfft scatter, then irfft).

Everything is jittable with static shapes: the operator is built once in
numpy (host, shape-only work) and closed over by the jitted transforms.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PkOp(NamedTuple):
    """Radial-binning operator for an N^dim grid.

    ks:     [pk_len] mean |k| of each radial bin (float64 -> float32).
    weight: [pk_len, N^dim] dense row-normalized membership (W[i,j] =
            1/count_i if mode j falls in bin i) — `get_pk` averaging.
    member: [pk_len, N^dim] unnormalized 0/1 membership — the scatter-back
            operator for `pk_rescale` (the reference's broadcast_op=True
            variant, pk_utils.py:22-25).
    """

    ks: jax.Array
    weight: jax.Array
    member: jax.Array
    n: int
    dim: int


def pk_op(n: int, dim: int) -> PkOp:
    """Build the radial binning operator (pk_utils.py:3-42 get_ks_pkop).

    Host-side numpy: this is shape-only preprocessing, done once."""
    if dim not in (2, 3):
        raise ValueError("dim must be 2 or 3")
    if n % 2 != 0:
        raise ValueError("N must be even")
    k_arr = np.fft.fftfreq(n, 1.0 / n)
    grids = np.meshgrid(*([k_arr] * dim), indexing="ij")
    k_abs = np.sqrt(sum(g ** 2 for g in grids))
    pk_len = int(k_abs.max() + 0.5) + 1
    pkind = np.floor(k_abs + 0.5).reshape(-1).astype(np.int64)

    member = np.zeros((pk_len, n ** dim), np.float32)
    member[pkind, np.arange(n ** dim)] = 1.0
    counts = member.sum(axis=1)
    weight = member / counts[:, None]
    k_flat = k_abs.reshape(-1)
    ks = np.array([k_flat[pkind == i].mean() for i in range(pk_len)])
    return PkOp(jnp.asarray(ks, jnp.float32), jnp.asarray(weight),
                jnp.asarray(member), n, dim)


def get_pk(images: jax.Array, op: PkOp) -> jax.Array:
    """Mean |FFT|^2 per radial bin (pk_utils.py:44-52).

    images: [B, H, W(, D), C] channel-last (NHWC — the framework layout;
    the reference is channel-first). Returns [B, C, pk_len]."""
    spatial = tuple(range(1, 1 + op.dim))
    images_k = jnp.fft.fftn(images, axes=spatial)
    power = (images_k.real ** 2 + images_k.imag ** 2).astype(jnp.float32)
    b, c = images.shape[0], images.shape[-1]
    # [B, spatial..., C] -> [B*C, N^dim]
    flat = jnp.moveaxis(power, -1, 1).reshape(b * c, -1)
    pks = flat @ op.weight.T
    return pks.reshape(b, c, -1)


def pk_rescale(images: jax.Array, pks: jax.Array, target_pks: jax.Array,
               op: PkOp) -> jax.Array:
    """Rescale each Fourier mode so the radial spectrum matches target_pks
    (pk_utils.py:54-72). 2D only, matching the reference.

    images: [B, H, W, C]; pks/target_pks: [B, C, pk_len] (from get_pk).
    Zero-power bins are zeroed rather than amplified. The reference also
    zeroes rescaler[:, 0, 0] — channel 0, row 0 of the factor grid (its
    DC-suppression line, kept bug-for-bug for parity)."""
    if op.dim != 2:
        raise NotImplementedError("3D not implemented (as in the reference)")
    n = op.n
    b, c = images.shape[0], images.shape[-1]
    fac = jnp.where(pks > 0, jnp.sqrt(target_pks / pks),
                    jnp.zeros_like(pks))
    # scatter bin factors back onto the full k-grid: [B, C, N, N]
    rescaler = (fac.reshape(b * c, -1) @ op.member).reshape(b, c, n, n)
    rescaler = rescaler.at[:, 0, 0].set(0.0)
    rescaler = rescaler[..., : n // 2 + 1]

    x = jnp.moveaxis(images, -1, 1)  # [B, C, H, W]
    x_k = jnp.fft.rfftn(x, axes=(2, 3))
    x_r = jnp.fft.irfftn(x_k * rescaler, axes=(2, 3), s=(n, n))
    return jnp.moveaxis(x_r, 1, -1).astype(images.dtype)

"""Initializers matching PyTorch layer defaults in distribution.

The reference model uses torch defaults everywhere except explicitly
zero-initialized convs (reference: src/model.py:13-17, 205, 402-408, 544-550).
For loss-curve parity the initial weight *distributions* must match:

- torch Conv2d / Linear default: kaiming_uniform_(a=sqrt(5)), which reduces to
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = cin*kh*kw (or in_features);
  bias ~ U(+-1/sqrt(fan_in)).
- torch ConvTranspose2d: fan_in is computed from weight dim 1, i.e.
  cout*kh*kw.

All initializers emit HWIO kernels (or [in, out] dense kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def torch_conv_kernel_init(fan_in: int | None = None):
    """HWIO kernel init; fan_in defaults to kh*kw*cin from the shape."""

    def init(key, shape, dtype=jnp.float32):
        f = fan_in if fan_in is not None else int(np.prod(shape[:-1]))
        return _uniform(key, shape, 1.0 / np.sqrt(f), dtype)

    return init


def torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, 1.0 / np.sqrt(fan_in), dtype)

    return init


def torch_dense_kernel_init():
    """[in, out] dense kernel init, fan_in = in."""

    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, 1.0 / np.sqrt(shape[0]), dtype)

    return init


def zeros_init():
    def init(key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)

    return init

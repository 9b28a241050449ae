"""GroupNorm (+fused activation) for NHWC activations.

Semantics match torch.nn.GroupNorm(num_groups, C, eps, affine): per sample and
per group, normalize over (spatial x group-channels), then affine transform
(reference usage: src/model.py:105,179,201 with groups=8, eps=1e-6).

Statistics are always computed in float32 regardless of the compute dtype;
the normalized output is cast back to the input dtype. XLA fuses the
elementwise tail (affine + activation) into the surrounding computation; a
Pallas fused kernel for the GN->GELU->conv-input path lives in
tempo_tpu.ops.pallas_gn (perf pass).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def group_norm(x: jax.Array, num_groups: int, scale: Optional[jax.Array],
               bias: Optional[jax.Array], eps: float = 1e-6,
               act: Optional[Callable[[jax.Array], jax.Array]] = None) -> jax.Array:
    """x: [B, H, W, C] (or [B, ..., C]); normalizes over all non-batch dims
    within each channel group."""
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"

    x32 = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 3), keepdims=True)
    x32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    x32 = x32.reshape(b, *spatial, c)

    if scale is not None:
        x32 = x32 * scale.astype(jnp.float32)
    if bias is not None:
        x32 = x32 + bias.astype(jnp.float32)
    if act is not None:
        x32 = act(x32)
    return x32.astype(orig_dtype)


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU, matching torch.nn.GELU(approximate='none').
    jax.nn.gelu defaults to the tanh approximation, which does NOT match."""
    return jax.nn.gelu(x, approximate=False)

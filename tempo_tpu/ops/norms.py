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

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp

# GroupNorm backend selection (env TEMPO_TPU_PALLAS_GN = xla | pallas).
# Measured on v5e (flagship config, bf16): the Pallas fused kernel beats the
# XLA lowering in isolation (1.14 ms vs 1.62 ms at [8,64,64,512]), but
# inside the full train step the custom-call acts as a fusion barrier for
# the surrounding conv chains and the step regresses 107 -> 119 ms.
# Default is therefore 'xla'; 'pallas' remains available for kernel work
# and for configurations where the tradeoff differs.
GN_BACKEND = os.environ.get("TEMPO_TPU_PALLAS_GN", "xla")


def _pallas_gn_applicable(shape, dtype) -> bool:
    if GN_BACKEND != "pallas":
        return False
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    from tempo_tpu.ops.pallas_gn import pallas_gn_supported

    return pallas_gn_supported(shape, dtype)


def group_norm_act(x: jax.Array, num_groups: int, scale: Optional[jax.Array],
                   bias: Optional[jax.Array], eps: float = 1e-6,
                   act_name: Optional[str] = None) -> jax.Array:
    """GroupNorm + optional named activation, routed to the Pallas fused
    kernel on TPU when the shape qualifies (see tempo_tpu.ops.pallas_gn)."""
    if (scale is not None and bias is not None
            and _pallas_gn_applicable(x.shape, x.dtype)):
        from tempo_tpu.ops.pallas_gn import fused_group_norm_act

        return fused_group_norm_act(x, scale, bias, num_groups, eps, act_name)
    act = None
    if act_name is not None:
        from tempo_tpu.nn.blocks import ACTIVATIONS

        act = ACTIVATIONS[act_name]
    return group_norm(x, num_groups, scale, bias, eps, act=act)


def group_norm(x: jax.Array, num_groups: int, scale: Optional[jax.Array],
               bias: Optional[jax.Array], eps: float = 1e-6,
               act: Optional[Callable[[jax.Array], jax.Array]] = None) -> jax.Array:
    """x: [B, H, W, C] (or [B, ..., C]); normalizes over all non-batch dims
    within each channel group.

    TPU layout strategy: the big activation is NEVER reshaped — a
    channel-splitting reshape would shrink the lane axis (C -> C/groups)
    and force a full relayout copy in and out of the op. Instead, sum and
    sum-of-squares reduce over the spatial axes only (a layout-friendly
    [B, C] reduction XLA fuses into ONE pass over the input); the
    channel->group fold then happens on the tiny [B, C] tensors, and the
    apply step is a pure per-(batch, channel) affine the compiler fuses
    into the neighboring ops."""
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_per_group = (np_prod(x.shape[1:-1]) * c) // num_groups

    x32 = x.astype(jnp.float32)
    # one fused pass: both rowwise moments from a single read of x
    sum_c = jnp.sum(x32, axis=spatial_axes)            # [B, C]
    sumsq_c = jnp.sum(jnp.square(x32), axis=spatial_axes)
    sum_g = jnp.sum(sum_c.reshape(b, num_groups, -1), axis=-1)      # [B, G]
    sumsq_g = jnp.sum(sumsq_c.reshape(b, num_groups, -1), axis=-1)
    mean_g = sum_g / n_per_group
    # E[x^2] - E[x]^2 in float32 (the formulation torch's rowwise-moments
    # kernels use); activations are O(1) here so cancellation is benign
    var_g = jnp.maximum(sumsq_g / n_per_group - jnp.square(mean_g), 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)                 # [B, G]

    # fold the group stats (and affine) into per-(B, C) coefficients
    alpha = jnp.repeat(inv_g, c // num_groups, axis=1)   # [B, C]
    mean_c = jnp.repeat(mean_g, c // num_groups, axis=1)
    if scale is not None:
        alpha = alpha * scale.astype(jnp.float32)[None, :]
    beta = -mean_c * alpha
    if bias is not None:
        beta = beta + bias.astype(jnp.float32)[None, :]

    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    out = x32 * alpha.reshape(shape) + beta.reshape(shape)
    if act is not None:
        out = act(out)
    return out.astype(orig_dtype)


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU, matching torch.nn.GELU(approximate='none').
    jax.nn.gelu defaults to the tanh approximation, which does NOT match."""
    return jax.nn.gelu(x, approximate=False)

"""Core network blocks (flax.linen, NHWC, TPU-first).

Functional re-design of the reference blocks (reference: src/model.py:92-289)
with identical math:

- ResNetBlock: GN -> GELU -> conv3x3; GN -> GELU -> (dropout) -> zero-init
  conv3x3; 1x1 skip conv on channel change (src/model.py:155-231).
- AttnBlock: GN, 1x1 q/k/v, *channel-major* multi-head attention — heads are
  the fastest-varying sub-index of the channel axis (src/model.py:120-152) —
  softmax over keys, 1x1 proj, residual.
- Down/Up sample: kernel-2 stride-2 (transposed) convs, implemented as
  space-to-depth/depth-to-space + matmul (see tempo_tpu.ops.convs).

Compute dtype is configurable (bfloat16 for speed); GroupNorm statistics and
softmax always run in float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tempo_tpu.nn.init import (
    torch_bias_init,
    torch_conv_kernel_init,
    torch_dense_kernel_init,
    zeros_init,
)
from tempo_tpu.ops.convs import (
    conv2d_nhwc,
    conv3d_ndhwc,
    dense,
    depth_to_space_2x,
    depth_to_space_2x3d,
    space_to_depth_2x,
    space_to_depth_2x3d,
)
from tempo_tpu.ops.norms import gelu_exact

Dtype = Any

ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "gelu": gelu_exact,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


class Conv(nn.Module):
    """kxk SAME conv with torch-default (or zero) init.

    Lane-padding support (the permanently-padded boundary-conv
    parameterization, see docs/DESIGN.md "Speed of light"): the PARAMETER
    always has the logical channel shape — `logical_in` input channels
    (default: x's width) and `features` output channels — so parameter
    counts, checkpoints, and the torch importer are untouched. At apply
    time the kernel is zero-padded to match a lane-aligned activation:

    - If x is wider than `logical_in` (the caller lane-padded the
      activation with zeros), zero kernel rows are appended — the conv is
      then fully 128-lane aligned and numerically identical, since the
      padded activation channels are zero.
    - If `pad_out_to` is set, zero kernel columns and bias entries are
      appended so the OUTPUT is lane-aligned too; the extra output
      channels are exactly zero.

    The per-step weight pad/slice is a ~10 MB copy (microseconds); the
    win is that every conv direction (fwd, dgrad, wgrad) of a ragged
    channel count like 1028 = 8*128 + 4 runs on full 128-lane MXU windows.
    """

    features: int
    kernel_size: int = 3
    zero: bool = False
    logical_in: Optional[int] = None
    pad_out_to: Optional[int] = None
    dim: int = 2  # 2 = NHWC conv2d; 3 = NDHWC conv3d (volumetric CUNet)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = self.logical_in if self.logical_in is not None else x.shape[-1]
        k = self.kernel_size
        fan_in = cin * k ** self.dim
        k_init = zeros_init() if self.zero else torch_conv_kernel_init()
        b_init = zeros_init() if self.zero else torch_bias_init(fan_in)
        kernel = self.param("kernel", k_init,
                            (k,) * self.dim + (cin, self.features))
        bias = self.param("bias", b_init, (self.features,))
        kern, b = kernel, bias
        spatial_pad = ((0, 0),) * self.dim
        if x.shape[-1] != cin:
            assert x.shape[-1] > cin, (
                f"input width {x.shape[-1]} < logical_in {cin}")
            kern = jnp.pad(kern, spatial_pad
                           + ((0, x.shape[-1] - cin), (0, 0)))
        if self.pad_out_to is not None and self.pad_out_to > self.features:
            kern = jnp.pad(kern, spatial_pad
                           + ((0, 0), (0, self.pad_out_to - self.features)))
            b = jnp.pad(b, (0, self.pad_out_to - self.features))
        conv = conv2d_nhwc if self.dim == 2 else conv3d_ndhwc
        out = conv(x.astype(self.dtype), kern, b, padding=k // 2)
        return out.astype(self.dtype)


class Dense(nn.Module):
    """Channel-last dense == 1x1 conv, torch-default (or zero) init."""

    features: int
    zero: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        k_init = zeros_init() if self.zero else torch_dense_kernel_init()
        b_init = zeros_init() if self.zero else torch_bias_init(cin)
        kernel = self.param("kernel", k_init, (cin, self.features))
        bias = self.param("bias", b_init, (self.features,))
        return dense(x.astype(self.dtype), kernel, bias).astype(self.dtype)


class Downsample2x(nn.Module):
    """Kernel-2 stride-2 conv as space-to-depth + matmul (dim=3: the
    kernel-2 stride-2 Conv3d as an 8x voxel-to-depth + matmul)."""

    features: int
    dim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        blk = 2 ** self.dim
        fan_in = cin * blk
        kernel = self.param(
            "kernel", torch_conv_kernel_init(fan_in=fan_in),
            (blk * cin, self.features)
        )
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        s2d = space_to_depth_2x if self.dim == 2 else space_to_depth_2x3d
        h = s2d(x.astype(self.dtype))
        return dense(h, kernel, bias).astype(self.dtype)


class Upsample2x(nn.Module):
    """Kernel-2 stride-2 transposed conv as matmul + depth-to-space.

    Matches torch ConvTranspose2d/3d(k=2, s=2) init: fan_in = cout * 2**dim
    (torch computes fan-in from weight dim 1 = out channels)."""

    features: int
    dim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        blk = 2 ** self.dim
        fan_in = self.features * blk
        kernel = self.param(
            "kernel", torch_conv_kernel_init(fan_in=fan_in),
            (cin, blk * self.features)
        )
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        h = dense(x.astype(self.dtype), kernel)  # [B,*S,(d...,cout)]
        d2s = depth_to_space_2x if self.dim == 2 else depth_to_space_2x3d
        h = d2s(h)
        return (h + bias.astype(h.dtype)).astype(self.dtype)


class GroupNorm(nn.Module):
    num_groups: int = 8
    eps: float = 1e-6
    affine: bool = True
    act: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from tempo_tpu.ops.norms import group_norm_act

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,)) if self.affine else None
        bias = self.param("bias", nn.initializers.zeros, (c,)) if self.affine else None
        return group_norm_act(x, self.num_groups, scale, bias, self.eps,
                              act_name=self.act)


class ResNetBlock(nn.Module):
    features: int
    num_groups: int = 8
    norm_eps: float = 1e-6
    norm_affine: bool = True
    act: str = "gelu"
    kernel_size: int = 3
    dropout_prob: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cin = x.shape[-1]
        h = GroupNorm(self.num_groups, self.norm_eps, self.norm_affine,
                      act=self.act, dtype=self.dtype, name="norm1")(x)
        h = Conv(self.features, self.kernel_size, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(self.num_groups, self.norm_eps, self.norm_affine,
                      act=self.act, dtype=self.dtype, name="norm2")(h)
        if self.dropout_prob > 0.0:
            h = nn.Dropout(self.dropout_prob)(h, deterministic=deterministic)
        h = Conv(self.features, self.kernel_size, zero=True, dtype=self.dtype,
                 name="conv2")(h)
        if cin != self.features:
            x = Dense(self.features, dtype=self.dtype, name="skip")(x)
        return x + h


class AttnBlock(nn.Module):
    """Channel-major multi-head self-attention over the spatial grid.

    The channel axis is split as (c_per_head, n_heads) with the *head* index
    fastest-varying — a deliberate quirk of the reference
    (src/model.py:129-137) preserved for checkpoint/numerics parity."""

    n_heads: int = 4
    num_groups: int = 8
    norm_eps: float = 1e-6
    norm_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        n = self.n_heads
        assert c % n == 0, "channels must be divisible by n_heads"
        ch = c // n

        h = GroupNorm(self.num_groups, self.norm_eps, self.norm_affine,
                      dtype=self.dtype, name="norm")(x)
        q = Dense(c, dtype=self.dtype, name="q")(h)
        k = Dense(c, dtype=self.dtype, name="k")(h)
        v = Dense(c, dtype=self.dtype, name="v")(h)

        # [B, HW, c_per_head, n_heads]: channel index == c_idx * n + head.
        q = q.reshape(b, hh * ww, ch, n).astype(jnp.float32)
        k = k.reshape(b, hh * ww, ch, n).astype(jnp.float32)
        v = v.reshape(b, hh * ww, ch, n).astype(jnp.float32)

        scale = float(ch) ** -0.5
        scores = jnp.einsum("bqcn,bkcn->bqkn", q, k,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32) * scale
        weights = jax.nn.softmax(scores, axis=2)
        out = jnp.einsum("bdcn,bqdn->bqcn", v, weights,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, hh, ww, c).astype(self.dtype)
        out = Dense(c, dtype=self.dtype, name="proj_out")(out)
        return x + out

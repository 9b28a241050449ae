"""Hierarchical conv decoder, mirror of the encoder (reference semantics:
src/model.py:436-574).

conv_in maps z_channels -> chs[-1] at the latent grid; mid blocks (+attn);
then levels in reverse channel order, each ending in a kernel-2 stride-2
transposed-conv upsample — except the LAST processed level (i_level == 0),
which skips its upsample (src/model.py:569) so the spatial factor is 4x.
The skipped level's upsample weights are still allocated (the reference
creates them in ResNetUp regardless), preserving exact parameter-count and
checkpoint-import parity. Final: GroupNorm -> act -> zero-init conv back to
the input channel count.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tempo_tpu.nn.blocks import AttnBlock, Conv, GroupNorm, ResNetBlock
from tempo_tpu.nn.init import torch_bias_init, torch_conv_kernel_init
from tempo_tpu.ops.convs import dense, depth_to_space_2x


class DecoderLevel(nn.Module):
    features: int       # channel width of this level's res blocks
    up_features: int    # channel width after the upsample
    num_res_blocks: int
    use_attn: bool
    n_heads: int
    num_groups: int
    norm_eps: float
    norm_affine: bool
    act: str
    kernel_size: int
    dropout_prob: float
    last: bool          # last processed level skips its upsample
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        for i in range(self.num_res_blocks):
            x = ResNetBlock(self.features, self.num_groups, self.norm_eps,
                            self.norm_affine, self.act, self.kernel_size,
                            self.dropout_prob, dtype=self.dtype,
                            name=f"res{i}")(x, deterministic)
            if self.use_attn:
                x = AttnBlock(self.n_heads, self.num_groups, self.norm_eps,
                              self.norm_affine, dtype=self.dtype,
                              name=f"attn{i}")(x)
        # Transposed-conv weights allocated unconditionally (parity with the
        # reference, which never applies the last level's upsample).
        cin, cout = self.features, self.up_features
        fan_in = cout * 4  # torch ConvTranspose2d fan-in convention
        up_kernel = self.param(
            "up_kernel", torch_conv_kernel_init(fan_in=fan_in), (cin, 4 * cout)
        )
        up_bias = self.param("up_bias", torch_bias_init(fan_in), (cout,))
        if self.last:
            return x
        h = dense(x.astype(self.dtype), up_kernel)
        h = depth_to_space_2x(h)
        return (h + up_bias.astype(h.dtype)).astype(self.dtype)


class Decoder(nn.Module):
    out_channels: int = 1028
    input_size: int = 64
    chs: Sequence[int] = (512, 256, 128)
    attn_sizes: Sequence[int] = ()
    mid_attn: bool = True
    num_res_blocks: int = 1
    dropout_prob: float = 0.0
    z_channels: int = 32
    n_attention_heads: int = 4
    norm_groups: int = 8
    norm_eps: float = 1e-6
    norm_affine: bool = True
    act: str = "gelu"
    conv_kernel_size: int = 3
    # When set, conv_out emits this (lane-aligned) channel width; channels
    # beyond out_channels are exactly zero (zero-padded kernel columns and
    # bias — see nn.blocks.Conv). The caller slices or masks at the loss.
    pad_out_to: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        assert self.conv_kernel_size % 2 == 1, "conv_kernel_size must be odd"
        n_levels = len(self.chs)

        h = Conv(self.chs[-1], self.conv_kernel_size, dtype=self.dtype,
                 name="conv_in")(z)

        mid_ch = self.chs[-1]
        h = ResNetBlock(mid_ch, self.norm_groups, self.norm_eps, self.norm_affine,
                        self.act, self.conv_kernel_size, self.dropout_prob,
                        dtype=self.dtype, name="mid1")(h, deterministic)
        if self.mid_attn:
            h = AttnBlock(self.n_attention_heads, self.norm_groups, self.norm_eps,
                          self.norm_affine, dtype=self.dtype, name="mid_attn1")(h)
        h = ResNetBlock(mid_ch, self.norm_groups, self.norm_eps, self.norm_affine,
                        self.act, self.conv_kernel_size, self.dropout_prob,
                        dtype=self.dtype, name="mid2")(h, deterministic)

        # Attention placement tracks the current spatial size just like the
        # encoder; latent grid starts at input_size / 2^(n_levels-1).
        curr_size = self.input_size // (2 ** (n_levels - 1))
        for idx, i_level in enumerate(reversed(range(n_levels))):
            last = idx == n_levels - 1
            up_ch = self.chs[0] if i_level == 0 else self.chs[i_level - 1]
            h = DecoderLevel(
                features=self.chs[i_level],
                up_features=up_ch,
                num_res_blocks=self.num_res_blocks,
                use_attn=curr_size in self.attn_sizes,
                n_heads=self.n_attention_heads,
                num_groups=self.norm_groups,
                norm_eps=self.norm_eps,
                norm_affine=self.norm_affine,
                act=self.act,
                kernel_size=self.conv_kernel_size,
                dropout_prob=self.dropout_prob,
                last=last,
                dtype=self.dtype,
                name=f"up{idx}",
            )(h, deterministic)
            curr_size //= 2

        h = GroupNorm(self.norm_groups, self.norm_eps, self.norm_affine,
                      act=self.act, dtype=self.dtype, name="norm_out")(h)
        h = Conv(self.out_channels, self.conv_kernel_size, zero=True,
                 pad_out_to=self.pad_out_to, dtype=self.dtype,
                 name="conv_out")(h)
        return h

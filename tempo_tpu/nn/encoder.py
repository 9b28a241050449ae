"""Hierarchical conv encoder (reference semantics: src/model.py:294-431).

Default TEMPO configuration: input [B,64,64,1028], chs=[512,256,128],
num_res_blocks=1, mid attention (4 heads), GroupNorm(8, eps=1e-6), GELU,
zero-initialized final conv to 2*z_channels. The LAST level skips its
downsample (src/model.py:416-419), so 64 -> 32 -> 16 spatially (4x).

Note: the reference allocates a downsample conv for every level even though
the last level never applies it; we allocate it too ("down" in the last
level) so the parameter count (27,289,893) and torch-checkpoint import match
exactly.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tempo_tpu.nn.blocks import AttnBlock, Conv, GroupNorm, ResNetBlock
from tempo_tpu.nn.init import torch_bias_init, torch_conv_kernel_init
from tempo_tpu.ops.convs import dense, space_to_depth_2x


class EncoderLevel(nn.Module):
    features: int
    num_res_blocks: int
    use_attn: bool
    n_heads: int
    num_groups: int
    norm_eps: float
    norm_affine: bool
    act: str
    kernel_size: int
    dropout_prob: float
    last: bool
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
        # The downsample weights exist for every level — the reference
        # allocates them even on the last level, which never applies them
        # (src/model.py:240-247, 416-419) — so the parameter count and
        # torch-checkpoint import match exactly.
        ch = self.features
        fan_in = ch * 4
        down_kernel = self.param(
            "down_kernel", torch_conv_kernel_init(fan_in=fan_in), (4 * ch, ch)
        )
        down_bias = self.param("down_bias", torch_bias_init(fan_in), (ch,))
        if self.last:
            return x
        h = space_to_depth_2x(x.astype(self.dtype))
        return dense(h, down_kernel, down_bias).astype(self.dtype)


class Encoder(nn.Module):
    in_channels: int = 1028
    input_size: int = 64
    chs: Sequence[int] = (512, 256, 128)
    attn_sizes: Sequence[int] = ()
    mid_attn: bool = True
    num_res_blocks: int = 1
    dropout_prob: float = 0.0
    z_channels: int = 32
    double_z: bool = True
    n_attention_heads: int = 4
    norm_groups: int = 8
    norm_eps: float = 1e-6
    norm_affine: bool = True
    act: str = "gelu"
    conv_kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        assert self.conv_kernel_size % 2 == 1, "conv_kernel_size must be odd"
        n_levels = len(self.chs)

        # x may arrive lane-padded (zeros beyond in_channels); conv_in's
        # parameter stays logically in_channels wide and is zero-padded to
        # match at apply time (see nn.blocks.Conv).
        h = Conv(self.chs[0], self.conv_kernel_size,
                 logical_in=self.in_channels, dtype=self.dtype,
                 name="conv_in")(x)

        curr_size = self.input_size
        for i, ch in enumerate(self.chs):
            last = i == n_levels - 1
            h = EncoderLevel(
                features=ch,
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
                name=f"down{i}",
            )(h, deterministic)
            curr_size //= 2

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

        h = GroupNorm(self.norm_groups, self.norm_eps, self.norm_affine,
                      act=self.act, dtype=self.dtype, name="norm_out")(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        h = Conv(out_ch, self.conv_kernel_size, zero=True, dtype=self.dtype,
                 name="conv_out")(h)
        return h

"""Conditional UNet + conditional MLP (flax.linen, NHWC, TPU-first).

TPU-native re-design of the reference toolkit's diffusion backbones
(reference: src/mltools/networks/networks.py:13-294 `CUNet`, 296-403
`CMLP`; conditioning blocks src/mltools/networks/blocks.py:74-206;
sinusoidal embedding src/mltools/networks/network_tools.py:38-63) with
identical math on the 2-D path:

- Same skip topology: per-level pre-downsample activations are concatenated
  after the matching upsample; the deepest level has no skip and the level-0
  up keeps full resolution (`no_down`/`no_up` on the last level).
- Conditioning: timestep embedding -> 2-layer GELU MLP; vector conditionings
  through shared embed MLPs ("common_*" modes, optional reparameterized
  `v_augment`); every conditional ResNet block adds per-conditioning
  projections (zero-init linear / linear / MLP) after its first conv.
- Output: GN -> act -> zero-init conv, plus the input residual (through a
  zero-init 3x3 conv when channel counts differ) — the v-prediction-friendly
  residual form (networks.py:283-293).

Differences by design: NHWC layout, kernel-2 resamples as
space-to-depth/depth-to-space matmuls (tempo_tpu.ops.convs), conditioning
projections as channel-last matmuls that XLA fuses into the conv epilogues.
The reference's volumetric dim=3 path (networks.py:43; mid-attn refused per
its own networks.py:65-66) is carried: pass a 4-tuple shape (D, H, W, C) —
NDHWC convs, 8x voxel-to-depth resample matmuls. Spatial scaling is the
halo-sharded spatial parallelism in tempo_tpu.parallel.spatial.

The reference multiplies EVERY parameter by `init_scale` (default 0.02)
after construction (networks.py:295-296) — reproduce with
`scale_params(params, init_scale)` after `.init`.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tempo_tpu.nn.blocks import (
    ACTIVATIONS,
    AttnBlock,
    Conv,
    Dense,
    Downsample2x,
    GroupNorm,
    Upsample2x,
)

Dtype = Any


def timestep_embedding(t: jax.Array, embedding_dim: int, T: float = 1000.0,
                       max_timescale: float = 10_000.0,
                       min_timescale: float = 1.0) -> jax.Array:
    """Sinusoidal embedding of diffusion time t in [0, 1]
    (reference: network_tools.py:38-63 — t is scaled by T, timescales are
    log-spaced, sin block then cos block)."""
    assert embedding_dim % 2 == 0
    t = jnp.asarray(t, jnp.float32) * T
    num = embedding_dim // 2
    inv = jnp.logspace(-math.log10(min_timescale), -math.log10(max_timescale),
                       num, dtype=jnp.float32)
    emb = t[..., None] * inv
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def scale_params(params, init_scale: float = 0.02):
    """The reference's global post-init parameter scaling
    (networks.py:295-296: `p.data *= init_scale`)."""
    return jax.tree_util.tree_map(lambda p: p * init_scale, params)


class CondMLP(nn.Module):
    """Linear -> GELU -> Linear (-> GELU): the embed MLP shape used for both
    t-conditioning (networks.py:74-81) and common v-conditioning
    (networks.py:85-97)."""

    features: int
    final_act: bool = True
    zero_last: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = Dense(self.features, dtype=self.dtype, name="fc1")(x)
        h = ACTIVATIONS["gelu"](h)
        h = Dense(self.features, zero=self.zero_last, dtype=self.dtype,
                  name="fc2")(h)
        if self.final_act:
            h = ACTIVATIONS["gelu"](h)
        return h


class CondResNetBlock(nn.Module):
    """ResNet block with additive per-conditioning projections after the
    first conv (reference: blocks.py:74-152)."""

    features: int
    conditioning_dims: Optional[Tuple[int, ...]] = None
    cond_proj_type: str = "zerolinear"
    num_groups: int = 8
    norm_eps: float = 1e-6
    act: str = "gelu"
    dropout_prob: float = 0.0
    dim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 conditionings: Optional[Sequence[jax.Array]] = None,
                 deterministic: bool = True) -> jax.Array:
        cin = x.shape[-1]
        h = GroupNorm(self.num_groups, self.norm_eps, act=self.act,
                      dtype=self.dtype, name="norm1")(x)
        h = Conv(self.features, dim=self.dim, dtype=self.dtype,
                 name="conv1")(h)
        if conditionings is not None:
            assert self.conditioning_dims is not None
            assert len(conditionings) == len(self.conditioning_dims)
            for i, cond in enumerate(conditionings):
                if self.cond_proj_type == "zerolinear":
                    proj = Dense(self.features, zero=True, dtype=self.dtype,
                                 name=f"cond_proj{i}")(cond)
                elif self.cond_proj_type == "linear":
                    proj = Dense(self.features, dtype=self.dtype,
                                 name=f"cond_proj{i}")(cond)
                elif self.cond_proj_type == "mlp":
                    proj = CondMLP(self.features, dtype=self.dtype,
                                   name=f"cond_proj{i}")(cond)
                else:
                    raise ValueError(
                        f"unknown cond_proj_type {self.cond_proj_type!r}")
                # broadcast [B, C] over the dim spatial axes (channel-last
                # mirror of blocks.py:141-144's [:, :, None*dim])
                h = h + proj.reshape(proj.shape[0],
                                     *((1,) * self.dim), -1)
        h = GroupNorm(self.num_groups, self.norm_eps, act=self.act,
                      dtype=self.dtype, name="norm2")(h)
        if self.dropout_prob > 0.0:
            h = nn.Dropout(self.dropout_prob)(h, deterministic=deterministic)
        h = Conv(self.features, zero=True, dim=self.dim, dtype=self.dtype,
                 name="conv2")(h)
        if cin != self.features:
            x = Dense(self.features, dtype=self.dtype, name="skip")(x)
        return x + h


class CUNet(nn.Module):
    """Conditional UNet over NHWC tiles (reference: networks.py:13-294).

    __call__(x, t=None, s_conditioning=None, v_conditionings=None):
      x [B, H, W, C] (or [B, D, H, W, C] volumetric); t scalar or [B]
      diffusion time in [0, 1];
      s_conditioning [B, *spatial, Cs] concatenated onto the input;
      v_conditionings: list of [B, dim_i] vectors.

    A 4-tuple `shape` (D, H, W, C) selects the reference's volumetric
    dim=3 path (networks.py:43 `self.dim = len(shape)-1`): 3x3x3 convs,
    kernel-2-stride-2 resamples over all three spatial axes (as 8x
    voxel-to-depth matmuls), and `mid_attn` refused exactly like the
    reference's "3D attention very highly discouraged" (networks.py:65-66).
    """

    shape: Tuple[int, ...]           # (H, W, C) or (D, H, W, C) per sample
    out_channels: Optional[int] = None
    chs: Tuple[int, ...] = (48, 96, 192, 384)
    s_conditioning_channels: int = 0
    v_conditioning_dims: Tuple[int, ...] = ()
    v_conditioning_type: str = "common_zerolinear"
    v_embedding_dim: int = 64
    v_augment: bool = False
    v_embed_no_s_gelu: bool = False
    t_conditioning: bool = False
    t_embedding_dim: int = 64
    num_res_blocks: int = 1
    norm_groups: int = 8
    mid_attn: bool = True
    n_attention_heads: int = 4
    dropout_prob: float = 0.1
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def dim(self) -> int:
        d = len(self.shape) - 1
        assert d in (2, 3), f"shape must be (H,W,C) or (D,H,W,C), got {self.shape}"
        return d

    def _conditioning_dims(self) -> Optional[Tuple[int, ...]]:
        dims = []
        common, _ = self.v_conditioning_type.split("_")
        if self.t_conditioning:
            dims.append(4 * self.t_embedding_dim)
        for v_dim in self.v_conditioning_dims:
            dims.append(self.v_embedding_dim if common == "common" else v_dim)
        return tuple(dims) if dims else None

    @nn.compact
    def __call__(self, x: jax.Array, t: Optional[jax.Array] = None,
                 s_conditioning: Optional[jax.Array] = None,
                 v_conditionings: Optional[Sequence[jax.Array]] = None,
                 deterministic: bool = True) -> jax.Array:
        common, cond_proj_type = self.v_conditioning_type.split("_")
        common = common == "common"
        if self.v_augment:
            assert common, "v_augment requires a common_* conditioning type"
        if self.mid_attn and self.dim == 3:
            # reference networks.py:65-66
            raise ValueError("3D attention very highly discouraged.")
        out_ch = (self.out_channels if self.out_channels is not None
                  else self.shape[-1])

        if s_conditioning is not None:
            assert s_conditioning.shape[-1] == self.s_conditioning_channels
            h = jnp.concatenate([x, s_conditioning.astype(x.dtype)], axis=-1)
        else:
            assert self.s_conditioning_channels == 0
            h = x

        conditionings = []
        if t is not None:
            assert self.t_conditioning, "t given but t_conditioning is off"
            t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x.shape[0],))
            t_emb = timestep_embedding(t, self.t_embedding_dim)
            conditionings.append(
                CondMLP(4 * self.t_embedding_dim, dtype=self.dtype,
                        name="embed_t")(t_emb))
        else:
            assert not self.t_conditioning, "t_conditioning needs t"

        if v_conditionings is not None:
            assert len(v_conditionings) == len(self.v_conditioning_dims)
            for i, v in enumerate(v_conditionings):
                assert v.shape[-1] == self.v_conditioning_dims[i]
                if common:
                    dim = (2 * self.v_embedding_dim if self.v_augment
                           else self.v_embedding_dim)
                    v = CondMLP(dim, final_act=not self.v_embed_no_s_gelu,
                                zero_last=self.v_augment, dtype=self.dtype,
                                name=f"embed_v{i}")(v)
                    if self.v_augment:
                        means, logs = v[:, ::2], v[:, 1::2]
                        noise = jax.random.normal(
                            self.make_rng("v_augment"), means.shape,
                            jnp.float32)
                        v = means + jnp.exp(logs) * noise.astype(means.dtype)
                conditionings.append(v)
        conds = conditionings if conditionings else None

        block = dict(conditioning_dims=self._conditioning_dims(),
                     cond_proj_type=cond_proj_type,
                     num_groups=self.norm_groups,
                     dropout_prob=self.dropout_prob, dim=self.dim,
                     dtype=self.dtype)
        n = len(self.chs)

        h = Conv(self.chs[0], dim=self.dim, dtype=self.dtype,
                 name="conv_in")(h)
        skips = []
        for i, ch in enumerate(self.chs):
            for j in range(self.num_res_blocks):
                h = CondResNetBlock(ch, name=f"down{i}_res{j}", **block)(
                    h, conds, deterministic)
            if i != n - 1:
                skips.append(h)
                h = Downsample2x(ch, dim=self.dim, dtype=self.dtype,
                                 name=f"down{i}_down")(h)

        h = CondResNetBlock(self.chs[-1], name="mid1", **block)(
            h, conds, deterministic)
        if self.mid_attn:
            h = AttnBlock(self.n_attention_heads, self.norm_groups,
                          dtype=self.dtype, name="mid_attn")(h)
        h = CondResNetBlock(self.chs[-1], name="mid2", **block)(
            h, conds, deterministic)

        for idx, i in enumerate(reversed(range(n))):
            ch = self.chs[i]
            for j in range(self.num_res_blocks):
                h = CondResNetBlock(ch, name=f"up{idx}_res{j}", **block)(
                    h, conds, deterministic)
            if idx != n - 1:
                ch_out = self.chs[0] if i == 0 else self.chs[i - 1]
                h = Upsample2x(ch_out, dim=self.dim, dtype=self.dtype,
                               name=f"up{idx}_up")(h)
                h = jnp.concatenate([h, skips.pop().astype(h.dtype)],
                                    axis=-1)

        h = GroupNorm(self.norm_groups, act="gelu", dtype=self.dtype,
                      name="norm_out")(h)
        h = Conv(out_ch, zero=True, dim=self.dim, dtype=self.dtype,
                 name="conv_out")(h)
        if self.shape[-1] != out_ch:
            x = Conv(out_ch, zero=True, dim=self.dim, dtype=self.dtype,
                     name="conv_residual_out")(x)
        return h + x


class CMLP(nn.Module):
    """Conditional MLP for flat data (reference: networks.py:296-403):
    per-hidden-layer additive conditioning through 2-layer GELU embedders;
    t-conditioning through the sinusoidal embedding + embed MLP (without
    the final GELU, networks.py:320-325); raw v-vectors are consumed
    directly (networks.py:380-385)."""

    in_dim: int
    out_dim: Optional[int] = None
    h_dims: Tuple[int, ...] = (64,)
    v_conditioning_dims: Tuple[int, ...] = ()
    t_conditioning: bool = False
    t_embedding_dim: int = 64
    act: str = "gelu"
    compute_dtype: str = "float32"

    @property
    def shape(self):
        return (self.in_dim,)

    @nn.compact
    def __call__(self, x: jax.Array, t: Optional[jax.Array] = None,
                 v_conditionings: Optional[Sequence[jax.Array]] = None
                 ) -> jax.Array:
        dtype = jnp.dtype(self.compute_dtype)
        act = ACTIVATIONS[self.act]
        out_dim = self.out_dim if self.out_dim is not None else self.in_dim
        dims = (self.in_dim,) + tuple(self.h_dims) + (out_dim,)

        conditionings = []
        if t is not None:
            assert self.t_conditioning, "t given but t_conditioning is off"
            t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x.shape[0],))
            t_emb = timestep_embedding(t, self.t_embedding_dim)
            conditionings.append(
                CondMLP(4 * self.t_embedding_dim, final_act=False,
                        dtype=dtype, name="embed_t")(t_emb))
        else:
            assert not self.t_conditioning, "t_conditioning needs t"
        if v_conditionings is not None:
            for v in v_conditionings:
                assert v.shape[0] == x.shape[0], "batch not matching"
                conditionings.append(v)

        h = x
        n_layers = len(dims) - 1
        for i in range(n_layers):
            h = Dense(dims[i + 1], dtype=dtype, name=f"layer{i}")(h)
            if i < n_layers - 1:
                for k, cond in enumerate(conditionings):
                    h = h + CondMLP(dims[i + 1], dtype=dtype,
                                    name=f"embed{i}_{k}")(cond)
                h = act(h)
        return h

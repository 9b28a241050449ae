"""Decoder-style Transformer (flax.linen, TPU-first).

TPU-native re-design of the reference toolkit's GPT
(reference: src/mltools/networks/networks.py:418-754 `Transformer`,
src/mltools/networks/blocks.py:208-474 `LayerNorm`/`SelfAttentionBlock`/
`MLPBlock`/`TransformerBlock`, src/mltools/models/configs.py `GPTConfig`)
with identical math but an XLA-friendly execution model:

- The hot attention path lowers through `jax.nn.dot_product_attention`
  (fused flash-style kernel on TPU); the *interpretability* path — the
  reference's `cached_forward` (activation capture) and `patched_forward`
  (activation patching, `network_tools.py:65-76 patch_interpolate`) — runs
  a manual einsum attention that exposes the score/weight tensors. Capture
  is a flax `'hiddens'` collection (jit-safe), patching is a pytree input
  (dict name -> (array, weight)); both use the reference's key naming
  ("x_0", "attn_res^1", "k_rope^2", ...) so probes written against the
  torch toolkit translate 1:1.
- Generation uses a preallocated static-shape KV cache driven by
  `lax.scan` — one compiled decode step, O(T) per token — instead of the
  reference's full re-forward per token (networks.py:727-754, O(T^2)).
- RoPE (blocks.py:252-292): adjacent-pair rotation, computed in float32,
  theta = base^(-2j/dim); applied to q and k before the head transpose.
- Init parity (networks.py:606-612, 476-478): normal(0.02) linears and
  embeddings, zero biases, residual projections scaled by 1/sqrt(2L).
- LayerNorm eps 1e-5 with optional bias (blocks.py:208-217); exact-erf
  GELU in the MLP; softmax/LayerNorm statistics in float32.

Three embedding modes, as in the reference (networks.py:429-466, 480-527):
tokenized (embedding table + weight-tied lm_head), untokenized
(`TiedLinear` — one kernel used forward and transposed,
networks.py:405-416), and a dict of named embedder/unembedder modules.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tempo_tpu.ops.norms import gelu_exact

Dtype = Any
Taps = Optional[Dict[str, Tuple[jax.Array, float]]]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Mirrors the reference GPTConfig (src/mltools/models/configs.py)."""

    in_size: int = 50304          # vocab size (tokenized) or feature dim
    block_size: int = 1024
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    rmlp: float = 4               # MLP hidden = rmlp * n_embd
    dropout: float = 0.0
    bias: bool = True
    causal: bool = True
    pos_embed: bool = True
    rope: bool = False
    tokenized: bool = True
    mlp: bool = True
    ln: bool = True
    tie_emb: bool = True
    rope_base: float = 10_000.0
    compute_dtype: str = "float32"
    # mixture-of-experts FFN (nn/moe.py); 0 = dense MLP (the reference GPT)
    n_experts: int = 0
    expert_capacity_factor: float = 1.25
    expert_top_k: int = 1  # 1 = Switch routing, 2 = GShard top-2
    # 'int8' = weight-only quantized block matmuls for serving
    # (nn/quant.py; convert a trained tree with quantize_lm_params)
    quantize: str = "none"
    # training-attention kernel: 'auto' = Pallas TPU flash attention for
    # the hot (no-tap / no-cache / no-dropout) path when the sequence tiles
    # cleanly, XLA otherwise; 'flash' / 'xla' force one. Measured on v5e at
    # [8,12,1024,64] fwd+bwd: flash 4.30 ms vs XLA 5.91 ms per layer
    # (block_q=1024, block_k=512 — tools/profile_gpt.py attribution).
    attn_impl: str = "auto"
    # context parallelism: name of the mesh axis the SEQUENCE dimension is
    # sharded over. When set, __call__ must run INSIDE a shard_map over
    # that axis on [B, T_local, ...] shards with input_pos giving the
    # shard's global origin; attention becomes exact ring attention
    # (parallel/context.py). Use make_cp_model/cp_loss_fn, not this field
    # directly.
    seq_axis: Optional[str] = None
    # with seq_axis: zigzag chunk layout — each shard holds chunks
    # (d, 2S-1-d), input_pos is the explicit [1, t] position vector, and
    # attention computes only the causally-needed chunk pairs (~half the
    # FLOPs of the plain rotation; see ring_attention_zigzag)
    seq_zigzag: bool = False

    # grouped-query attention: number of K/V heads (0 = n_head, plain MHA).
    # Each group of n_head/n_kv_head query heads shares one K/V head — the
    # KV cache and its per-token decode HBM stream shrink by that factor
    # (the first-order serving-decode cost at batch size; see
    # docs/DESIGN.md "Serving-decode roofline"). Beyond the reference
    # toolkit's MHA-only GPT (src/mltools/networks/blocks.py:219-410).
    n_kv_head: int = 0

    # single-token KV-cache decode attention: 'xla' = the masked einsum
    # over the full static cache buffer; 'pallas' = the active-length
    # kernel (ops/pallas_decode.py) that fetches only the live cache
    # prefix from HBM — rung 4 of the serving-decode ladder, for serving
    # windows much longer than typical requests. 'pallas_interpret' runs
    # the same kernel in interpret mode (CPU tests). TPU-only when
    # exported: export_lm switches platforms to ("tpu",).
    decode_attn: str = "xla"

    # rematerialize each block in the backward pass (jax.checkpoint via
    # nn.remat): activation residuals per block drop from O(t * rmlp *
    # n_embd) to the block boundary only, traded for one extra forward.
    # The lever for the batch-16/32 HBM wall documented in docs/DESIGN.md
    # "Toolkit throughput" — same trade the VAE exposes (models/vae.py).
    # Ignored on the capture/taps/cache paths (remat would recompute and
    # double-sow).
    remat: bool = False

    @property
    def head_dim(self) -> int:
        assert self.n_embd % self.n_head == 0
        return self.n_embd // self.n_head

    @property
    def kv_heads(self) -> int:
        kv = self.n_kv_head or self.n_head
        assert self.n_head % kv == 0, (self.n_head, kv)
        return kv

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def _flash_ok(cfg: "TransformerConfig", t: int) -> bool:
    """Resolve cfg.attn_impl for a [*, t, n_head, head_dim] attention call.
    'auto' requires a TPU backend and a sequence the tuned block sizes
    (512/1024) tile exactly; anything else falls back to the XLA path."""
    if cfg.attn_impl == "flash":
        return True
    if cfg.attn_impl == "xla":
        return False
    assert cfg.attn_impl == "auto", f"unknown attn_impl {cfg.attn_impl!r}"
    return jax.default_backend() == "tpu" and t >= 512 and t % 512 == 0


def _flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     causal: bool, sm_scale: float) -> jax.Array:
    """Pallas TPU flash attention over [b, t, n, hd] inputs, with the block
    sizes measured fastest on v5e (tools/profile_gpt.py). Differentiable —
    the kernel ships its own dq/dkv passes."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (BlockSizes,
                                                                 flash_attention)

    t = q.shape[1]
    bq = 1024 if t % 1024 == 0 else 512
    bk = 512
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bk,
                    block_q_dkv=bq, block_k_dkv=bk,
                    block_q_dq=bq, block_k_major_dq=bk, block_k_dq=bk)
    out = flash_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                          v.transpose(0, 2, 1, 3), causal=causal,
                          sm_scale=sm_scale, block_sizes=bs)
    return out.transpose(0, 2, 1, 3)


def _patch(x: jax.Array, name: str, patches: Taps) -> jax.Array:
    """Activation patching: x + w * (patch - x) when `name` is patched
    (reference: src/mltools/networks/network_tools.py:65-76)."""
    if patches and name in patches:
        patch, w = patches[name]
        x = x + w * (patch.astype(x.dtype) - x)
    return x


def rope_cache(seq_len: int, head_dim: int,
               base: float = 10_000.0) -> jax.Array:
    """[seq_len, head_dim//2, 2] (cos, sin) table, float32
    (reference: blocks.py:252-259 create_rope_cache)."""
    theta = jnp.exp(jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                    * (-math.log(base) / head_dim))
    idx_theta = jnp.arange(seq_len, dtype=jnp.float32)[:, None] * theta[None]
    return jnp.stack([jnp.cos(idx_theta), jnp.sin(idx_theta)], axis=-1)


def apply_rope(x: jax.Array, cache: jax.Array) -> jax.Array:
    """Rotate adjacent feature pairs. x: [B, T, n_head, head_dim]; cache:
    [T, head_dim//2, 2] (already gathered at the right positions), or
    [B, T, head_dim//2, 2] when every row sits at its own position
    (continuous-batching decode). Float32 rotation, cast back
    (reference: blocks.py:265-292)."""
    b, t, n, d = x.shape
    xs = x.astype(jnp.float32).reshape(b, t, n, d // 2, 2)
    if cache.ndim == 4:  # per-row positions
        cos = cache[:, :, None, :, 0]
        sin = cache[:, :, None, :, 1]
        out = jnp.stack([xs[..., 0] * cos - xs[..., 1] * sin,
                         xs[..., 1] * cos + xs[..., 0] * sin], axis=-1)
        return out.reshape(b, t, n, d).astype(x.dtype)
    cos = cache[None, :, None, :, 0]
    sin = cache[None, :, None, :, 1]
    out = jnp.stack([xs[..., 0] * cos - xs[..., 1] * sin,
                     xs[..., 1] * cos + xs[..., 0] * sin], axis=-1)
    return out.reshape(b, t, n, d).astype(x.dtype)


class LayerNorm(nn.Module):
    """eps=1e-5, optional bias, float32 statistics (blocks.py:208-217)."""

    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        h = x.astype(jnp.float32)
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * scale
        if self.bias:
            h = h + self.param("bias", nn.initializers.zeros, (c,))
        return h.astype(self.dtype)


def _linear_init(std: float = 0.02):
    return nn.initializers.normal(stddev=std)


def _dense(cfg: TransformerConfig, features: int, kernel_init, name: str,
           use_bias: Optional[bool] = None) -> nn.Module:
    """The block matmul layer: nn.Dense, or its int8 weight-only twin when
    cfg.quantize == 'int8' (nn/quant.py — serving path; param tree comes
    from quantize_lm_params, kernel_init is unused there)."""
    if use_bias is None:
        use_bias = cfg.bias
    if cfg.quantize == "int8":
        from tempo_tpu.nn.quant import QuantDense

        return QuantDense(features, use_bias=use_bias, dtype=cfg.dtype,
                          name=name)
    assert cfg.quantize == "none", f"unknown quantize mode {cfg.quantize!r}"
    return nn.Dense(features, use_bias=use_bias, dtype=cfg.dtype,
                    kernel_init=kernel_init, name=name)


class SelfAttention(nn.Module):
    """Causal multi-head attention with optional RoPE and KV cache.

    Fused-kernel path (`jax.nn.dot_product_attention`) when no taps are
    requested; manual einsum path exposing "attn_um"/"attn" when capturing
    or patching (reference: blocks.py:219-410)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 taps: Taps = None, capture: bool = False, suffix: str = "",
                 cache: Optional[Tuple[jax.Array, jax.Array]] = None,
                 input_pos: Optional[jax.Array] = None):
        cfg = self.config
        b, t, c = x.shape
        n, hd = cfg.n_head, cfg.head_dim
        kv = cfg.kv_heads  # < n = grouped-query attention

        qkv = _dense(cfg, c + 2 * kv * hd, _linear_init(), "c_attn")(x)
        q = qkv[..., :c].reshape(b, t, n, hd)
        k = qkv[..., c:c + kv * hd].reshape(b, t, kv, hd)
        v = qkv[..., c + kv * hd:].reshape(b, t, kv, hd)

        def tap(val, name):
            name = name + suffix
            if capture:
                self.sow("hiddens", name, val,
                         init_fn=lambda: None, reduce_fn=lambda _, y: y)
            return _patch(val, name, taps)

        if cfg.rope:
            # pre-rotation tensors are tappable as kT/qT, post as k_rope/
            # q_rope (blocks.py:338-347); positions follow the cache offset.
            k = tap(k, "kT")
            q = tap(q, "qT")
            full = rope_cache(cfg.block_size, hd, cfg.rope_base)
            if input_pos is None:
                rc = full[:t]
            elif jnp.ndim(input_pos) == 1:
                # per-row positions [b] (continuous-batching decode):
                # gather each row's own rotation angles -> [b, t, hd//2, 2]
                rc = full[input_pos[:, None] + jnp.arange(t)[None]]
            elif jnp.ndim(input_pos) == 2:
                # explicit per-token positions [b|1, t] (non-contiguous
                # layouts, e.g. the zigzag context-parallel sharding)
                rc = full[input_pos]
            else:
                rc = jax.lax.dynamic_slice_in_dim(full, input_pos, t, axis=0)
            q = apply_rope(q, rc)
            k = apply_rope(k, rc)
            # reference taps k_rope/q_rope/v in [B, n_head, T, hd] layout
            q = tap(q.transpose(0, 2, 1, 3), "q_rope").transpose(0, 2, 1, 3)
            k = tap(k.transpose(0, 2, 1, 3), "k_rope").transpose(0, 2, 1, 3)
            v = tap(v.transpose(0, 2, 1, 3), "v").transpose(0, 2, 1, 3)
        else:
            q = tap(q.transpose(0, 2, 1, 3), "q").transpose(0, 2, 1, 3)
            k = tap(k.transpose(0, 2, 1, 3), "k").transpose(0, 2, 1, 3)
            v = tap(v.transpose(0, 2, 1, 3), "v").transpose(0, 2, 1, 3)

        new_cache = None
        if cfg.seq_axis is not None:
            # ring attention over sequence shards (parallel/context.py).
            # Decode caches, activation taps and attention-weight dropout
            # all want the full score matrix on one device — they belong to
            # the unsharded model (params are interchangeable).
            assert cache is None, (
                "KV-cache decode is not sequence-sharded; restore the "
                "params into a seq_axis=None model to serve")
            assert not (capture or taps), (
                "activation capture/patching is not sequence-sharded")
            assert cfg.dropout == 0.0 or deterministic, (
                "attention-weight dropout is not sequence-sharded")
            if kv < n:
                # the ring kernels take matched head counts; broadcasting
                # the KV groups here keeps GQA training correct (the ICI
                # ring then carries MHA-sized K/V shards — GQA's win is
                # the decode cache, not this training path)
                k = jnp.repeat(k, n // kv, axis=2)
                v = jnp.repeat(v, n // kv, axis=2)
            if cfg.seq_zigzag:
                from tempo_tpu.parallel.context import ring_attention_zigzag

                assert cfg.causal, "zigzag balances the CAUSAL schedule"
                y = ring_attention_zigzag(
                    q, k, v, axis_name=cfg.seq_axis).astype(cfg.dtype)
            else:
                from tempo_tpu.parallel.context import ring_attention

                y = ring_attention(q, k, v, axis_name=cfg.seq_axis,
                                   causal=cfg.causal).astype(cfg.dtype)
        elif cache is not None:
            # static-shape KV cache: write this call's keys/values at
            # input_pos, attend over the valid prefix only.
            pos = input_pos if input_pos is not None else jnp.int32(0)
            assert jnp.ndim(pos) <= 1, (
                "per-token [b, t] positions are a training-layout feature "
                "(zigzag cp); decode caches take scalar or per-row [b] pos")
            paged = len(cache) == 3
            if paged:
                # paged cache (pk/pv [P, page, kv, hd] shared pools +
                # per-row block table [b, max_pages]): logical position p
                # of row r lives at pool slot (table[r, p//page], p%page).
                # Pages are assigned to rows by a host allocator
                # (infer/paged.py) — rows reserve only the pages they use,
                # so the pool oversubscribes: n_slots * window can exceed
                # P * page. One flat scatter writes this call's tokens;
                # the gather below materializes each row's logical window,
                # bit-identical to the dense layout (never-written slots
                # land on the allocator's trash page and are masked by the
                # absolute-position causal mask exactly like dense
                # never-written slots).
                pk, pv, table = cache
                assert jnp.ndim(pos) == 1, (
                    "paged decode is slot-scheduled: positions are per-row")
                n_pages, pg = pk.shape[0], pk.shape[1]
                tok_pos = pos[:, None] + jnp.arange(t)[None]     # [b, t]
                page_ids = jnp.take_along_axis(table, tok_pos // pg, axis=1)
                flat = (page_ids * pg + tok_pos % pg).reshape(-1)
                pk = pk.reshape(n_pages * pg, kv, hd).at[flat].set(
                    k.astype(pk.dtype).reshape(b * t, kv, hd)
                ).reshape(n_pages, pg, kv, hd)
                pv = pv.reshape(n_pages * pg, kv, hd).at[flat].set(
                    v.astype(pv.dtype).reshape(b * t, kv, hd)
                ).reshape(n_pages, pg, kv, hd)
                new_cache = (pk, pv, table)
                ck = pk[table].reshape(b, -1, kv, hd)
                cv = pv[table].reshape(b, -1, kv, hd)
                q_idx = tok_pos
            elif jnp.ndim(pos) == 1:
                # per-row positions: each batch row writes its own slice
                # (vmapped dynamic_update_slice lowers to one scatter)
                ck, cv = cache
                row_upd = jax.vmap(
                    lambda c, u, p: jax.lax.dynamic_update_slice_in_dim(
                        c, u, p, axis=0))
                ck = row_upd(ck, k.astype(ck.dtype), pos)
                cv = row_upd(cv, v.astype(cv.dtype), pos)
                q_idx = pos[:, None] + jnp.arange(t)        # [b, t]
            else:
                ck, cv = cache
                ck = jax.lax.dynamic_update_slice_in_dim(
                    ck, k.astype(ck.dtype), pos, axis=1)
                cv = jax.lax.dynamic_update_slice_in_dim(
                    cv, v.astype(cv.dtype), pos, axis=1)
                q_idx = (pos + jnp.arange(t))[None]         # [1, t]
            if not paged:
                new_cache = (ck, cv)
            s = ck.shape[1]
            if (t == 1 and paged
                    and cfg.decode_attn in ("pallas", "pallas_interpret")):
                # paged active-length decode: HBM reads only the row's
                # LIVE pages, straight from the pool via the block table
                # (no gathered dense view is ever materialized)
                from tempo_tpu.ops.pallas_decode import \
                    paged_decode_attention

                y = paged_decode_attention(
                    q, new_cache[0], new_cache[1], table, pos,
                    interpret=cfg.decode_attn == "pallas_interpret"
                ).astype(cfg.dtype)
            elif (t == 1
                    and cfg.decode_attn in ("pallas", "pallas_interpret")):
                # active-length decode: HBM reads scale with pos, not s
                # (ops/pallas_decode.py — dead cache blocks are never
                # fetched; exact vs the masked einsum below)
                from tempo_tpu.ops.pallas_decode import decode_attention

                y = decode_attention(
                    q, ck, cv, pos,
                    interpret=cfg.decode_attn == "pallas_interpret"
                ).astype(cfg.dtype)
            else:
                kv_idx = jnp.arange(s)
                # causal over absolute positions; never attend beyond
                # pos+t
                mask = kv_idx[None, None, :] <= q_idx[:, :, None]  # [b|1,t,s]
                if kv < n:
                    # grouped-query decode: the cache holds kv heads and
                    # is streamed as-is (the whole point — n/kv fewer HBM
                    # bytes per token); the group dim rides inside the
                    # einsum, no repeated K/V is ever materialized
                    g = n // kv
                    qg = q.reshape(b, t, kv, g, hd)
                    scores = jnp.einsum(
                        "bqkgh,bskh->bkgqs", qg.astype(jnp.float32),
                        ck.astype(jnp.float32)) / math.sqrt(hd)
                    scores = jnp.where(mask[:, None, None], scores,
                                       -jnp.inf)
                    weights = jax.nn.softmax(scores, axis=-1)
                    y = jnp.einsum("bkgqs,bskh->bqkgh", weights,
                                   cv.astype(jnp.float32))
                    y = y.reshape(b, t, n, hd).astype(cfg.dtype)
                else:
                    scores = jnp.einsum("bqnh,bknh->bnqk",
                                        q.astype(jnp.float32),
                                        ck.astype(jnp.float32)) \
                        / math.sqrt(hd)
                    scores = jnp.where(mask[:, None], scores, -jnp.inf)
                    weights = jax.nn.softmax(scores, axis=-1)
                    y = jnp.einsum("bnqk,bknh->bqnh", weights,
                                   cv.astype(jnp.float32)).astype(cfg.dtype)
        elif capture or taps:
            # manual path exposing the score matrix (blocks.py:352-363);
            # GQA broadcasts the KV groups so the tapped score/weight
            # tensors keep the reference's [b, n_head, t, t] layout
            if kv < n:
                k = jnp.repeat(k, n // kv, axis=2)
                v = jnp.repeat(v, n // kv, axis=2)
            scores = jnp.einsum("bqnh,bknh->bnqk", q.astype(jnp.float32),
                                k.astype(jnp.float32)) / math.sqrt(hd)
            scores = tap(scores, "attn_um")
            if cfg.causal:
                mask = jnp.tril(jnp.ones((t, t), bool))
                scores = jnp.where(mask[None, None], scores, -jnp.inf)
            weights = jax.nn.softmax(scores, axis=-1)
            weights = tap(weights, "attn")
            if cfg.dropout > 0.0 and not deterministic:
                weights = nn.Dropout(cfg.dropout)(weights,
                                                  deterministic=False)
            y = jnp.einsum("bnqk,bknh->bqnh", weights,
                           v.astype(jnp.float32)).astype(cfg.dtype)
        else:
            if cfg.dropout > 0.0 and not deterministic:
                # attention-weight dropout needs the materialized weights
                if kv < n:
                    k = jnp.repeat(k, n // kv, axis=2)
                    v = jnp.repeat(v, n // kv, axis=2)
                scores = jnp.einsum("bqnh,bknh->bnqk",
                                    q.astype(jnp.float32),
                                    k.astype(jnp.float32)) / math.sqrt(hd)
                if cfg.causal:
                    mask = jnp.tril(jnp.ones((t, t), bool))
                    scores = jnp.where(mask[None, None], scores, -jnp.inf)
                weights = nn.Dropout(cfg.dropout)(
                    jax.nn.softmax(scores, axis=-1), deterministic=False)
                y = jnp.einsum("bnqk,bknh->bqnh", weights,
                               v.astype(jnp.float32)).astype(cfg.dtype)
            elif _flash_ok(cfg, t):
                if kv < n:
                    # GQA trains at MHA FLOPs regardless (its win is the
                    # decode cache); broadcasting K/V here keeps the hot
                    # training path on the Pallas flash kernel instead of
                    # the score-materializing XLA fallback
                    k = jnp.repeat(k, n // kv, axis=2)
                    v = jnp.repeat(v, n // kv, axis=2)
                y = _flash_attention(q, k, v, causal=cfg.causal,
                                     sm_scale=1.0 / math.sqrt(hd))
                y = y.astype(cfg.dtype)
            else:
                # handles GQA natively (K/V with kv < n heads broadcast
                # per group inside the fused kernel)
                y = jax.nn.dot_product_attention(
                    q, k, v, is_causal=cfg.causal)

        y = y.reshape(b, t, c)
        y = tap(y, "y_out")
        y = _dense(cfg, c,
                   _linear_init(0.02 / math.sqrt(2 * cfg.n_layer)),
                   "c_proj")(y)
        if cfg.dropout > 0.0 and not deterministic:
            y = nn.Dropout(cfg.dropout)(y, deterministic=False)
        y = tap(y, "y_out_proj")
        return y, new_cache


class MLPBlock(nn.Module):
    """fc -> exact GELU -> proj -> dropout (blocks.py:419-438)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        d_hidden = int(cfg.rmlp * cfg.n_embd)
        assert d_hidden == cfg.rmlp * cfg.n_embd, "rmlp*n_embd must be int"
        h = _dense(cfg, d_hidden, _linear_init(), "c_fc")(x)
        h = gelu_exact(h)
        h = _dense(cfg, cfg.n_embd,
                   _linear_init(0.02 / math.sqrt(2 * cfg.n_layer)),
                   "c_proj")(h)
        if cfg.dropout > 0.0 and not deterministic:
            h = nn.Dropout(cfg.dropout)(h, deterministic=False)
        return h


class TransformerBlock(nn.Module):
    """pre-LN attention + MLP residual block (blocks.py:440-474)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 taps: Taps = None, capture: bool = False, suffix: str = "",
                 cache=None, input_pos=None):
        cfg = self.config

        def tap(val, name):
            name = name + suffix
            if capture:
                self.sow("hiddens", name, val,
                         init_fn=lambda: None, reduce_fn=lambda _, y: y)
            return _patch(val, name, taps)

        h = LayerNorm(cfg.bias, cfg.dtype, name="ln_1")(x) if cfg.ln else x
        attn_res, new_cache = SelfAttention(cfg, name="attn")(
            h, deterministic, taps, capture, suffix, cache, input_pos)
        attn_res = tap(attn_res, "attn_res")
        x = x + attn_res
        x = tap(x, "x_attn")
        if cfg.mlp:
            h = LayerNorm(cfg.bias, cfg.dtype, name="ln_2")(x) if cfg.ln else x
            if cfg.n_experts > 0:
                from tempo_tpu.nn.moe import MoEBlock

                mlp_res = MoEBlock(cfg, name="moe")(h, deterministic)
            else:
                mlp_res = MLPBlock(cfg, name="mlp")(h, deterministic)
            mlp_res = tap(mlp_res, "mlp_res")
            x = x + mlp_res
        return x, new_cache


class TiedLinear(nn.Module):
    """One kernel used forward ([.., in] -> [.., embd]) and transposed
    ([.., embd] -> [.., in]) for untokenized in/out (networks.py:405-416)."""

    in_size: int
    n_embd: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.kernel = self.param("kernel", _linear_init(),
                                 (self.in_size, self.n_embd))

    def __call__(self, x: jax.Array) -> jax.Array:
        return x.astype(self.dtype) @ self.kernel.astype(self.dtype)

    def transposed(self, y: jax.Array) -> jax.Array:
        return y.astype(self.dtype) @ self.kernel.T.astype(self.dtype)


class Transformer(nn.Module):
    """GPT with the reference's three IO modes (networks.py:418-527).

    `embedders`/`unembedders`: optional dicts of named flax modules; input
    is then a dict of arrays, every key's embedding is summed, and
    `unembedders['x']` maps the final hidden state out. An embedder named
    'pos' overrides the learned position table."""

    config: TransformerConfig
    embedders: Optional[Dict[str, nn.Module]] = None
    unembedders: Optional[Dict[str, nn.Module]] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, taps: Taps = None,
                 capture: bool = False, suffix: str = "",
                 cache: Optional[Tuple] = None,
                 input_pos: Optional[jax.Array] = None):
        cfg = self.config
        assert (self.embedders is None) == (self.unembedders is None)

        def tap(val, name):
            name = name + suffix
            if capture:
                self.sow("hiddens", name, val,
                         init_fn=lambda: None, reduce_fn=lambda _, y: y)
            return _patch(val, name, taps)

        wte = tied = None
        if self.embedders is not None:
            assert isinstance(x, dict)
            x_dict = {k: jnp.asarray(v) for k, v in x.items()}
            t = next(iter(x_dict.values())).shape[1]
            b = next(iter(x_dict.values())).shape[0]
            emb = jnp.zeros((b, t, cfg.n_embd), cfg.dtype)
            if cfg.pos_embed:
                pos = jnp.arange(t)
                if "pos" in self.embedders:
                    emb = emb + self.embedders["pos"](pos)
                else:
                    wpe = self.param("wpe", _linear_init(),
                                     (cfg.block_size, cfg.n_embd))
                    emb = emb + wpe[pos].astype(cfg.dtype)
            for key in x_dict:
                assert key != "pos"
                emb = emb + self.embedders[key](x_dict[key])
            h = emb
        else:
            x = jnp.asarray(x)
            t = x.shape[1]
            assert t <= cfg.block_size, (
                f"sequence length {t} > block size {cfg.block_size}")
            if cfg.tokenized:
                if cfg.quantize == "int8":
                    # int8 token table with per-row scale: gather first,
                    # dequantize the gathered rows (never materialize a
                    # float copy of the table); the tied head below applies
                    # the scale per logit AFTER its matmul, so the table is
                    # streamed from HBM as int8 in both directions
                    wte_q = self.param("wte_q", nn.initializers.zeros,
                                       (cfg.in_size, cfg.n_embd), jnp.int8)
                    wte_scale = self.param("wte_scale",
                                           nn.initializers.ones,
                                           (cfg.in_size,), jnp.float32)
                    tok_emb = (jnp.take(wte_q, x, axis=0).astype(cfg.dtype)
                               * jnp.take(wte_scale, x,
                                          axis=0)[..., None].astype(cfg.dtype))
                else:
                    wte = self.param("wte", _linear_init(),
                                     (cfg.in_size, cfg.n_embd))
                    tok_emb = jnp.take(wte, x, axis=0).astype(cfg.dtype)
            else:
                tied = TiedLinear(cfg.in_size, cfg.n_embd, cfg.dtype,
                                  name="wte")
                tok_emb = tied(x)
            tok_emb = tap(tok_emb, "tok_emb")
            if cfg.pos_embed:
                wpe = self.param("wpe", _linear_init(),
                                 (cfg.block_size, cfg.n_embd))
                if input_pos is not None and jnp.ndim(input_pos) == 1:
                    # per-row positions [b]: gather a [b, t, c] table slice
                    pos = input_pos[:, None] + jnp.arange(t)[None]
                    pos_emb = tap(jnp.take(wpe, pos,
                                           axis=0).astype(cfg.dtype),
                                  "pos_emb")
                    tok_emb = tok_emb + pos_emb
                elif input_pos is not None and jnp.ndim(input_pos) == 2:
                    # explicit per-token positions [b|1, t] (zigzag cp)
                    pos_emb = tap(jnp.take(wpe, input_pos,
                                           axis=0).astype(cfg.dtype),
                                  "pos_emb")
                    tok_emb = tok_emb + pos_emb
                else:
                    pos = (jnp.arange(t) if input_pos is None
                           else input_pos + jnp.arange(t))
                    pos_emb = tap(jnp.take(wpe, pos,
                                           axis=0).astype(cfg.dtype),
                                  "pos_emb")
                    tok_emb = tok_emb + pos_emb[None]
            h = tok_emb
        if cfg.dropout > 0.0 and not deterministic:
            h = nn.Dropout(cfg.dropout)(h, deterministic=False)

        h = tap(h, "x_0")
        block_cls = TransformerBlock
        if cfg.remat and cache is None and taps is None and not capture:
            # static_argnums count self as 0: deterministic(2), taps(3),
            # capture(4), suffix(5) are Python values the block branches on
            block_cls = nn.remat(TransformerBlock,
                                 static_argnums=(2, 3, 4, 5),
                                 prevent_cse=False)
        new_caches = []
        for i in range(cfg.n_layer):
            layer_cache = None if cache is None else cache[i]
            h, layer_new = block_cls(cfg, name=f"h_{i}")(
                h, deterministic, taps, capture,
                suffix + "^" + str(i + 1),
                layer_cache, input_pos)
            h = tap(h, f"x_{i + 1}")
            new_caches.append(layer_new)

        if cfg.ln:
            h = LayerNorm(cfg.bias, cfg.dtype, name="ln_f")(h)
        h = tap(h, "x_ln_f")

        if self.unembedders is not None:
            out = self.unembedders["x"](h)
        elif cfg.tokenized:
            if cfg.tie_emb:
                if cfg.quantize == "int8":
                    out = ((h @ wte_q.T.astype(cfg.dtype))
                           * wte_scale[None, None, :].astype(cfg.dtype))
                else:
                    out = h @ wte.T.astype(cfg.dtype)
            else:
                out = _dense(cfg, cfg.in_size, _linear_init(), "lm_head",
                             use_bias=False)(h)
        else:
            out = tied.transposed(h)
        if cache is not None:
            return out, tuple(new_caches)
        return out


def flatten_hiddens(tree: Dict) -> Dict[str, jax.Array]:
    """Collapse the module-scoped 'hiddens' collection into the reference's
    flat naming (networks.py:529-564: "tok_emb", "x_0", "attn_res^1",
    "k_rope^2", ...). The per-block "^i" suffixes already make every sown
    name unique, so the flax scope path carries no information."""
    flat: Dict[str, jax.Array] = {}

    def rec(t):
        for k, v in t.items():
            if isinstance(v, dict):
                rec(v)
            else:
                flat[k] = v

    rec(tree)
    return flat


def cached_forward(model: "Transformer", params, x, **kwargs):
    """Forward returning (out, flat hiddens dict) — the reference's
    activation-capture entry (networks.py:529-564 cached_forward)."""
    out, state = model.apply({"params": params}, x, capture=True,
                             mutable=["hiddens"], **kwargs)
    return out, flatten_hiddens(state["hiddens"])


def init_cache(config: TransformerConfig, batch_size: int,
               dtype=jnp.float32, cache_len: Optional[int] = None) -> Tuple:
    """Preallocated per-layer (k, v) buffers [B, cache_len, kv_heads, hd]
    (kv_heads < n_head under grouped-query attention — the cache shrinks
    by the group factor, and so does its per-token decode stream).

    `cache_len` defaults to block_size, but a shorter buffer is EXACT for
    requests that fit it: decode attends over the buffer with an absolute-
    position mask, so never-written slots never contribute. Every decode
    step streams the whole buffer from HBM (static shapes), which at
    serving batch sizes outweighs the weight stream — size the cache to
    the serving window, not the model's maximum."""
    s = config.block_size if cache_len is None else cache_len
    assert s <= config.block_size, (s, config.block_size)
    shape = (batch_size, s, config.kv_heads, config.head_dim)
    return tuple((jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
                 for _ in range(config.n_layer))


def init_paged_cache(config: TransformerConfig, batch_size: int,
                     n_pages: int, page_size: int,
                     dtype=jnp.float32,
                     window: Optional[int] = None) -> Tuple:
    """Paged decode cache: per layer (pool_k, pool_v, table) where the
    pools are [n_pages, page_size, kv_heads, hd] SHARED slabs and the
    table [batch, window // page_size] maps each row's logical pages to
    pool pages. The table starts all-zero: page 0 is the allocator's
    trash page (infer/paged.py PagePool never hands it out), so parked or
    unallocated logical pages scatter into — and gather from — slots the
    absolute-position mask already hides. The pool capacity is
    independent of batch * window: rows reserve only the pages they
    actually fill, which is the memory lever (dense reserves the full
    window per row up front)."""
    w = config.block_size if window is None else window
    assert w % page_size == 0, (w, page_size)
    shape = (n_pages, page_size, config.kv_heads, config.head_dim)
    table = jnp.zeros((batch_size, w // page_size), jnp.int32)
    return tuple((jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), table)
                 for _ in range(config.n_layer))


def nucleus_mask(logits: jax.Array, top_p: float) -> jax.Array:
    """Mask logits outside the top-p (nucleus) probability mass to -inf.

    Keeps the smallest set of tokens whose probabilities sum to >= top_p
    (the token that crosses the boundary is included, so the nucleus is
    never empty). Implemented as one sort + cumsum on [b, V] — a single
    fused XLA reduction chain, no gather/scatter of the vocabulary.
    """
    logits = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    cumulative = jnp.cumsum(sorted_probs, axis=-1)
    # exclusive cumsum < top_p: index 0 is always kept, and the first token
    # whose inclusion pushes the mass past top_p is kept too
    keep_sorted = (cumulative - sorted_probs) < top_p
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_probs, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(probs < threshold, -jnp.inf, logits)


def generate(model: Transformer, params, idx: jax.Array, max_new_tokens: int,
             rng: jax.Array, temperature: float = 1.0,
             top_k: Optional[int] = None, top_p: Optional[float] = None,
             cache_dtype=None, cache_len: Optional[int] = None) -> jax.Array:
    """Sample continuations with a KV cache: prefill once, then one
    compiled single-token step per new token under `lax.scan`.

    Functional upgrade of the reference's `generate`
    (networks.py:727-754): same sampling semantics (temperature scaling,
    optional top-k truncation, categorical sampling), but O(T) per token,
    plus nucleus (top-p) truncation the reference lacks; top_k and top_p
    compose (top_p is applied to the already-top-k-truncated logits).
    Requires len(idx) + max_new_tokens <= block_size (the reference
    instead crops context — at serving scale, plan the cache).

    `cache_dtype` (default float32) sizes the KV buffers — at serving
    batch sizes the cache streamed per token rivals the weight bytes, so
    bfloat16 here halves a first-order HBM term; attention scores stay
    float32 either way (the cache decode path upcasts). The buffers are
    sized to this request (rounded up to 64 slots), not to block_size:
    the absolute-position mask makes a short cache exact, and every
    decode step streams the whole buffer. `cache_len` overrides the
    request sizing (e.g. a full serving-window buffer to exercise the
    active-length decode kernel, cfg.decode_attn='pallas')."""
    cfg = model.config
    assert cfg.tokenized, "generate requires a tokenized model"
    b, t0 = idx.shape
    assert t0 + max_new_tokens <= cfg.block_size, (
        f"prompt {t0} + {max_new_tokens} new tokens exceeds block size "
        f"{cfg.block_size}")
    if cache_len is None:
        cache_len = min(cfg.block_size, -((t0 + max_new_tokens) // -64) * 64)
    assert t0 + max_new_tokens <= cache_len <= cfg.block_size, cache_len

    cache = init_cache(cfg, b, dtype=cache_dtype or jnp.float32,
                       cache_len=cache_len)
    logits, cache = model.apply(
        {"params": params}, idx, cache=cache, input_pos=jnp.int32(0))

    def sample(logits_last, key):
        logits_last = logits_last.astype(jnp.float32)
        if temperature == 0.0:  # greedy decode (static branch)
            return jnp.argmax(logits_last, axis=-1)
        logits_last = logits_last / temperature
        if top_k is not None:
            kth = jax.lax.top_k(logits_last,
                                min(top_k, cfg.in_size))[0][..., -1:]
            logits_last = jnp.where(logits_last < kth, -jnp.inf, logits_last)
        if top_p is not None and top_p < 1.0:
            logits_last = nucleus_mask(logits_last, top_p)
        return jax.random.categorical(key, logits_last, axis=-1)

    rng, key = jax.random.split(rng)
    next_tok = sample(logits[:, -1], key)

    def step(carry, key):
        tok, cache, pos = carry
        logits, cache = model.apply(
            {"params": params}, tok[:, None], cache=cache, input_pos=pos)
        new_tok = sample(logits[:, -1], key)
        return (new_tok, cache, pos + 1), tok

    keys = jax.random.split(rng, max_new_tokens - 1) if max_new_tokens > 1 \
        else jnp.zeros((0, 2), jnp.uint32)
    (last, _, _), toks = jax.lax.scan(
        step, (next_tok, cache, jnp.int32(t0)), keys)
    return jnp.concatenate([idx, toks.T, last[:, None]], axis=1)


def num_params(params, non_embedding: bool = True) -> int:
    """Parameter count; subtracts the learned position table by default
    (reference: src/mltools/models/gpt_model.py:14-20)."""
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if non_embedding and "wpe" in params:
        total -= params["wpe"].size
    return total


def estimate_mfu(config: TransformerConfig, n_params: int,
                 fwdbwd_per_iter: float, dt: float,
                 peak_flops: float = 197e12) -> float:
    """Model FLOPs utilization, PaLM appendix-B accounting
    (reference: networks.py:710-725; peak defaults to v5e bf16 197
    TFLOP/s instead of the reference's A100 312e12)."""
    L, H, Q, T = (config.n_layer, config.n_head, config.head_dim,
                  config.block_size)
    flops_per_token = 6 * n_params + 12 * L * H * Q * T
    flops_per_iter = flops_per_token * T * fwdbwd_per_iter
    return (flops_per_iter / dt) / peak_flops


# leaf names that receive weight decay: matmul kernels, stacked expert
# matmuls, and embeddings. For the dense GPT this is exactly the
# reference's ">= 2-D tensors" rule (networks.py:683-709) — biases and
# norm scales are 1-D — but unlike an ndim test it stays correct when
# leaves gain leading axes (pipeline stage-stacking makes biases 3-D) or
# when 2-D leaves are biases (MoE's [E, d] expert biases).
_DECAY_LEAF_NAMES = frozenset({"kernel", "w1", "w2", "wte", "wpe",
                               "embedding"})


def gpt_decay_mask(params):
    def leaf_name(path):
        for k in reversed(path):
            name = getattr(k, "key", getattr(k, "name", None))
            if name is not None:
                return name
        return ""

    return jax.tree_util.tree_map_with_path(
        lambda path, _: leaf_name(path) in _DECAY_LEAF_NAMES, params)


def make_gpt_optimizer(params, weight_decay: float, learning_rate,
                       betas: Tuple[float, float],
                       moments_dtype: Optional[str] = None):
    """AdamW with weight decay only on matmul kernels and embeddings, none
    on biases/norm scales — the reference's two optimizer groups
    (networks.py:683-709) as an optax decay mask (name-keyed; see
    gpt_decay_mask).

    `moments_dtype` ('bfloat16'): store the FIRST AdamW moment in bf16
    (optax mu_dtype) — a third of optimizer memory for free in accuracy
    terms (mu is a smoothed gradient; its quantization noise is far below
    gradient noise). nu stays f32: it sits under a sqrt, where bf16's
    8-bit mantissa would directly perturb the effective step size."""
    import optax

    return optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                       eps=1e-8, weight_decay=weight_decay,
                       mu_dtype=moments_dtype,
                       mask=gpt_decay_mask(params))

"""Beam-search decoding over the KV cache (TPU-first).

The reference toolkit has no beam search — its only decode loop is the
sampling `generate` (reference: src/mltools/networks/networks.py:727-754,
eager re-forward per token). This module adds deterministic beam decoding
as a serving-grade capability on top of the same cached decode step used
by `generate` (nn/transformer.py):

- One prefill over the [b, t0] prompts, then `lax.scan` over single-token
  steps on a [b*k] flattened beam batch — one compiled step regardless of
  beam width, O(T) per emitted position.
- Beam reordering is a batch-axis gather of the KV cache
  (`jnp.take(leaf, parent, axis=0)`): static shapes, rides HBM bandwidth,
  no host round-trips inside the loop. The emitted-token buffer is carried
  and re-gathered the same way, so the final sequences need no backtrace
  pass (no host-side pointer chasing).
- Finished beams (hit `eos_id`) are frozen: their only legal continuation
  is `eos` at zero additional log-probability, so a completed hypothesis
  keeps competing in the top-k at its final score — the standard "beam
  does not lose finished candidates" semantics.
- Scores are float32 log-probabilities regardless of the compute dtype
  (log_softmax over upcast logits, same policy as the loss path).

Tie-breaking follows `lax.top_k` (lowest flat index wins), which orders
equal-scoring candidates by (parent beam, token id) — deterministic across
runs and devices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tempo_tpu.nn.transformer import Transformer, init_cache


def _length_penalty(lengths: jax.Array, alpha: float) -> jax.Array:
    """GNMT length penalty ((5 + len) / 6)^alpha; alpha=0 disables."""
    if alpha == 0.0:
        return jnp.ones_like(lengths, jnp.float32)
    return ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** alpha


def beam_search(model: Transformer, params, idx: jax.Array,
                max_new_tokens: int, beam_width: int,
                eos_id: Optional[int] = None,
                length_penalty: float = 0.0,
                cache_dtype=None) -> Tuple[jax.Array, jax.Array]:
    """Deterministic beam decode of `max_new_tokens` continuations.

    Args:
      idx: [b, t0] int prompts (all rows decode the same length).
      beam_width: k hypotheses kept per row (k <= vocab).
      eos_id: optional end-of-sequence token. Beams that emit it are
        frozen (forced eos continuations at zero cost); positions after
        the first eos are eos-padded in the output.
      length_penalty: GNMT alpha; final ranking uses
        score / ((5 + emitted_len) / 6)^alpha where emitted_len counts
        tokens up to and including the first eos.

    Returns:
      sequences [b, k, t0 + max_new_tokens] int32, best hypothesis first,
      and the (length-penalized) scores [b, k] sorted to match. The raw
      log-probability of hypothesis j is scores[i, j] when alpha == 0.
    """
    cfg = model.config
    assert cfg.tokenized, "beam_search requires a tokenized model"
    b, t0 = idx.shape
    k, vocab = beam_width, cfg.in_size
    assert 1 <= k <= vocab, (k, vocab)
    assert max_new_tokens >= 1
    assert t0 + max_new_tokens <= cfg.block_size, (
        f"prompt {t0} + {max_new_tokens} new tokens exceeds block size "
        f"{cfg.block_size}")
    cache_len = min(cfg.block_size, -((t0 + max_new_tokens) // -64) * 64)

    cache = init_cache(cfg, b, dtype=cache_dtype or jnp.float32,
                       cache_len=cache_len)
    logits, cache = model.apply(
        {"params": params}, idx, cache=cache, input_pos=jnp.int32(0))
    logp0 = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
    scores, tok = jax.lax.top_k(logp0, k)            # [b, k] each
    # Beam j of row i reuses row i's prefill cache: repeat rows in place so
    # the flattened beam batch is [(i, j)] row-major — parent gathers below
    # index it as i * k + parent.
    cache = jax.tree_util.tree_map(lambda l: jnp.repeat(l, k, axis=0), cache)

    toks = jnp.zeros((b, k, max_new_tokens), jnp.int32).at[:, :, 0].set(tok)
    finished = (tok == eos_id) if eos_id is not None \
        else jnp.zeros((b, k), bool)
    lengths = jnp.ones((b, k), jnp.int32)
    if eos_id is not None:
        frozen_row = jnp.full((vocab,), -jnp.inf,
                              jnp.float32).at[eos_id].set(0.0)

    def step(carry, i):
        tok, cache, scores, finished, lengths, toks = carry
        logits, cache = model.apply(
            {"params": params}, tok.reshape(b * k, 1), cache=cache,
            input_pos=t0 + i - 1)
        logp = jax.nn.log_softmax(
            logits[:, -1].astype(jnp.float32), axis=-1).reshape(b, k, vocab)
        if eos_id is not None:
            logp = jnp.where(finished[:, :, None], frozen_row, logp)
        cand = (scores[:, :, None] + logp).reshape(b, k * vocab)
        scores, flat = jax.lax.top_k(cand, k)        # sorted best-first
        parent = flat // vocab                       # [b, k]
        tok = flat % vocab
        toks = jnp.take_along_axis(toks, parent[:, :, None], axis=1)
        finished = jnp.take_along_axis(finished, parent, axis=1)
        lengths = jnp.take_along_axis(lengths, parent, axis=1)
        flat_parent = (jnp.arange(b)[:, None] * k + parent).reshape(b * k)
        cache = jax.tree_util.tree_map(
            lambda l: jnp.take(l, flat_parent, axis=0), cache)
        toks = toks.at[:, :, i].set(tok)
        lengths = lengths + (~finished).astype(jnp.int32)
        if eos_id is not None:
            finished = finished | (tok == eos_id)
        return (tok, cache, scores, finished, lengths, toks), None

    if max_new_tokens > 1:
        (tok, cache, scores, finished, lengths, toks), _ = jax.lax.scan(
            step, (tok, cache, scores, finished, lengths, toks),
            jnp.arange(1, max_new_tokens))

    scores = scores / _length_penalty(lengths, length_penalty)
    if length_penalty != 0.0:
        # re-rank: the in-loop ordering is by raw score
        order = jnp.argsort(-scores, axis=-1)
        scores = jnp.take_along_axis(scores, order, axis=1)
        toks = jnp.take_along_axis(toks, order[:, :, None], axis=1)
        finished = jnp.take_along_axis(finished, order, axis=1)
    if eos_id is not None:
        # eos-pad everything after the first eos (those slots hold the
        # forced continuations already, but make padding explicit)
        past_eos = jnp.cumsum(
            (toks == eos_id).astype(jnp.int32), axis=-1) > 1
        toks = jnp.where(past_eos, eos_id, toks)
    prompts = jnp.broadcast_to(idx[:, None, :], (b, k, t0)).astype(jnp.int32)
    return jnp.concatenate([prompts, toks], axis=-1), scores

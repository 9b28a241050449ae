"""AOT export of a trained GPT for serving: prefill + single-token decode
step as portable StableHLO artifacts (params baked in), the
KV-cache-serving analogue of the VAE codec export (infer/export_codec.py).

A serving host needs NO model code: `jax.export.deserialize` rehydrates
two functions —

  prefill(tokens[b, t])          -> (logits[b, t, V], cache)
  decode_step(tok[b,1], cache, pos) -> (logits[b, 1, V], cache)

and the decode loop is host-side policy (greedy/top-k/temperature), one
compiled call per token. Batch and prompt length are symbolic dimensions
(prompt constrained to the block size), so one artifact serves any batch
at any prompt length. The reference has no serving story for its GPT
(networks.py:727-754 re-runs eager python per token).

Two further artifacts make the batch *continuous* (per-slot scheduling,
no convoy effect from one shared position counter):

  decode_rows(tok[b,1], cache, pos[b]) -> (logits[b, 1, V], cache)
  admit(cache, row_cache, slot)        -> cache

`decode_rows` advances every batch row at its OWN absolute position
(per-row cache scatter + per-row causal mask), and `admit` splices a
freshly prefilled single-request cache into one slot of the serving
batch — so a finished slot is refilled while the other rows keep
decoding. The host-side scheduler lives in infer/serving.py
(ContinuousLMServer).

A fifth artifact enables speculative decoding (target-model side):

  extend(tokens[b, k], cache, pos) -> (logits[b, k, V], cache)

One pass scores a whole k-token draft block into an EXISTING cache at
positions pos..pos+k-1 (prefill always rebuilds its cache from zero).
Rollback after a rejected draft is free: the absolute-position causal
mask hides the stale KV rows and the next extend overwrites them. The
host-side scheduler (draft/verify loop, rejection sampling) is
infer/serving.py SpeculativeLMServer.

A sixth composes speculation WITH continuous batching:

  extend_rows(tokens[b, k], cache, pos[b]) -> (logits[b, k, V], cache)

— the block extend at PER-ROW absolute positions: every serving slot
verifies (target) or ingests+proposes (draft) a k-token block at its own
position, so rows that accept different draft lengths stay in one device
batch (the de-sync that forced SpeculativeLMServer to batch 1). Same
rollback-by-mask argument per row. Scheduler: ContinuousLMServer with
k_draft > 0.

A seventh pair amortizes HOST DISPATCH, the dominant per-token cost of
serving decode on this transport (7-14 ms round-trip vs ~1 ms of kernel
time — and a real ~ms tax on any production host loop):

  decode_k(tok[b,1], cache, pos)         -> (tokens[b,K], logprobs[b,K], cache)
  decode_k_rows(tok[b,1], cache, pos[b]) -> (tokens[b,K], logprobs[b,K], cache)

K GREEDY decode steps run as ONE `lax.scan` inside one dispatch — the
argmax feedback happens on-device, so the host sees K tokens per
round-trip instead of one. K is static (scan length must be; stored in
meta as `decode_chunk`), and the emitted chain is bit-identical to K
per-token `decode_step` calls (same argmax over the same logits; pinned
in test_export.py). Schedulers: LMServer.generate_batch takes the
chunked path for greedy requests; ContinuousLMServer(k_decode=K)
advances every slot K tokens per dispatch (multi-step scheduling — a
finished slot over-decodes at most K-1 discarded tokens).

An eighth artifact moves the SAMPLING policy on-device so sampled
requests ride the fused chunks too:

  decode_k_sample(tok[b,1], cache, pos[b], keys[b,2],
                  temperature[b], top_k[b], top_p[b])
      -> (tokens[b,K], logprobs[b,K], cache)

Each fused artifact also emits the CHOSEN token's logprob under the raw
model distribution per step ([b,K] float32 — ~V-free extra fetch), so
`logprobs: true` requests ride the fused chunks instead of falling back
to per-token decode (meta key `decode_k_logprobs`; loaders normalize
older two-tuple artifacts to logprobs=None and schedulers then fall
back).

Per-row policy (temperature 0 rows decode greedily; top_k <= 0 / top_p
>= 1 disable truncation), per-row rng keys, and a CHUNK-INVARIANT key
schedule: the step key is fold_in(key_row, absolute position), so a
row's sampled stream depends only on (seed, prompt) — not on chunk
boundaries, admission order, or batch composition (pinned in
test_export.py). Support truncation mirrors serving.policy_probs
(top-k, then nucleus keeping the boundary-crossing token); the sampled
stream is the CANONICAL device threefry stream every scheduler draws
(serving.device_sample is the host-side twin for per-token steps), so
chunked and per-token decode emit identical sampled chains.

With `page_size` set, two more artifacts serve a PAGED KV cache
(nn/transformer.py paged branch; allocator + scheduler in
infer/paged.py):

  decode_paged(tok[b,1], paged_cache, pos[b]) -> (logits, paged_cache)
  admit_paged(paged_cache, row_cache, pages[max_seq/page]) -> paged_cache

where paged_cache is per-layer (pool_k [P, page, kv, hd], pool_v,
table [b, max_seq/page]). The POOL page count P is a symbolic dimension
— the serving host picks capacity at load time, and P below
n_slots * max_seq/page is the point: rows reserve only the pages they
fill, so the slot count oversubscribes the physical cache memory
(dense reserves batch x max_seq up front). admit_paged splices a dense
prefilled batch-1 row cache into an allocated page list.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax import export as jexport

from tempo_tpu.nn.transformer import Transformer, TransformerConfig, init_cache


def truncate_support_rows(logits: jax.Array, top_k: jax.Array,
                          top_p: jax.Array) -> jax.Array:
    """Device twin of serving._truncate_support with PER-ROW dynamic
    policy: top-k (keep the k largest logits; <= 0 disables) then nucleus
    (keep the smallest sorted-prob prefix reaching top_p INCLUDING the
    boundary-crossing token; >= 1 disables). logits [b, V] float32."""
    v = logits.shape[-1]
    sorted_x = jnp.sort(logits, axis=-1)[:, ::-1]
    kth = jnp.take_along_axis(
        sorted_x, (jnp.clip(top_k, 1, v) - 1)[:, None], axis=-1)
    logits = jnp.where((top_k > 0)[:, None] & (logits < kth),
                       -jnp.inf, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    sp = jnp.sort(probs, axis=-1)[:, ::-1]
    keep = (jnp.cumsum(sp, axis=-1) - sp) < top_p[:, None]
    thr = jnp.min(jnp.where(keep, sp, jnp.inf), axis=-1, keepdims=True)
    return jnp.where((top_p < 1.0)[:, None] & (probs < thr),
                     -jnp.inf, logits)


def sample_rows(logits: jax.Array, keys: jax.Array, temperature: jax.Array,
                top_k: jax.Array, top_p: jax.Array) -> jax.Array:
    """Per-row sampling policy on-device: temperature scaling + support
    truncation + one categorical draw per row (threefry). temperature 0
    rows take the argmax instead (their draw is computed and discarded —
    static shapes). logits [b, V], keys [b, 2] uint32 -> tokens [b]."""
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)
    x = truncate_support_rows(
        logits / jnp.maximum(temperature, 1e-6)[:, None], top_k, top_p)
    sampled = jax.vmap(jax.random.categorical)(keys, x)
    return jnp.where(temperature <= 0.0, greedy, sampled).astype(jnp.int32)


def export_lm(params, config: TransformerConfig,
              out_dir: Union[str, Path],
              max_seq: Optional[int] = None,
              decode_chunk: int = 8,
              page_size: int = 0) -> Path:
    """`max_seq` (default block_size) sizes the exported KV cache: every
    decode step streams the whole static buffer from HBM, and a shorter
    buffer is exact for requests that fit it (absolute-position mask), so
    size the artifact to the serving window, not the model maximum.
    `decode_chunk` sizes the fused greedy decode_k scan (0 disables the
    pair). `page_size` > 0 additionally exports the paged-cache pair
    (decode_paged/admit_paged; pool capacity stays symbolic)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    model = Transformer(config)
    max_seq = config.block_size if max_seq is None else int(max_seq)
    assert 0 < max_seq <= config.block_size, (max_seq, config.block_size)

    def prefill(tokens):
        cache = init_cache(config, tokens.shape[0], config.dtype,
                           cache_len=max_seq)
        return model.apply({"params": params}, tokens, cache=cache,
                           input_pos=jnp.int32(0))

    def decode_step(tok, cache, pos):
        return model.apply({"params": params}, tok, cache=cache,
                           input_pos=pos)

    def decode_rows(tok, cache, pos_rows):
        # identical compute, but pos_rows is [b]: every slot advances at
        # its own absolute position (continuous batching)
        return model.apply({"params": params}, tok, cache=cache,
                           input_pos=pos_rows)

    def extend(tokens, cache, pos):
        # score k tokens at positions pos..pos+k-1 into an EXISTING cache
        # (prefill rebuilds its cache from zero; this continues one) —
        # the target-model verify call of speculative decoding: one pass
        # scores a whole draft block
        return model.apply({"params": params}, tokens, cache=cache,
                           input_pos=pos)

    def _chosen_logprob(x, nxt):
        # log p(chosen) under the RAW model distribution (no temperature
        # / truncation — the OpenAI logprobs convention; host twin:
        # serving.token_logprob). ~V-free extra bytes per step: fetching
        # [b, K] floats keeps `logprobs: true` requests on the fused
        # chunks instead of forcing [b, V] per-token logits round-trips.
        return jnp.take_along_axis(jax.nn.log_softmax(x, axis=-1),
                                   nxt, axis=-1)

    def decode_k(tok, cache, pos):
        # K greedy steps fused into one dispatch: the argmax->next-token
        # feedback runs on-device inside a lax.scan, so a serving host
        # pays ONE round-trip per K tokens. Feeding `tok` at `pos` (the
        # decode_step contract), step i writes KV at pos+i and emits
        # token i+1; the final emitted token is NOT yet in the cache —
        # exactly the per-token loop's state, so the host continues with
        # decode_k(out[:, -1:], cache, pos + K). Also emits each chosen
        # token's raw-model logprob [b, K].
        def body(carry, _):
            t, c, p = carry
            logits, c = model.apply({"params": params}, t, cache=c,
                                    input_pos=p)
            x = logits[:, -1].astype(jnp.float32)
            nxt = jnp.argmax(x, axis=-1).astype(jnp.int32)[:, None]
            return (nxt, c, p + 1), (nxt, _chosen_logprob(x, nxt))
        (_, cache, _), (steps, lps) = jax.lax.scan(
            body, (tok, cache, pos), None, length=decode_chunk)
        return (jnp.swapaxes(steps[..., 0], 0, 1),        # [b, K]
                jnp.swapaxes(lps[..., 0], 0, 1), cache)   # [b, K]

    def decode_k_sample(tok, cache, pos, keys, temperature, top_k, top_p):
        # the sampled sibling of decode_k: per-row policy + per-row rng,
        # step keys folded with the ABSOLUTE position so the stream is
        # invariant to chunk boundaries and batch composition
        def body(carry, _):
            t, c, p = carry
            logits, c = model.apply({"params": params}, t, cache=c,
                                    input_pos=p)
            step_keys = jax.vmap(jax.random.fold_in)(keys, p)
            nxt = sample_rows(logits[:, -1], step_keys, temperature,
                              top_k, top_p)[:, None]
            lp = _chosen_logprob(logits[:, -1].astype(jnp.float32), nxt)
            return (nxt, c, p + 1), (nxt, lp)
        (_, cache, _), (steps, lps) = jax.lax.scan(
            body, (tok, cache, pos), None, length=decode_chunk)
        return (jnp.swapaxes(steps[..., 0], 0, 1),
                jnp.swapaxes(lps[..., 0], 0, 1), cache)

    def admit(cache, row_cache, slot):
        # splice a prefilled batch-1 cache into row `slot` of the serving
        # cache; the whole row is replaced, so whatever a parked slot
        # accumulated is dead on arrival
        return jax.tree_util.tree_map(
            lambda c, r: jax.lax.dynamic_update_slice_in_dim(
                c, r.astype(c.dtype), slot, axis=0), cache, row_cache)

    # separate symbolic scopes: prefill's (b, t) constraint on t must not
    # leak into decode_step, whose args never mention t
    b, t = jexport.symbolic_shape(
        "b, t", constraints=[f"t <= {max_seq}"])
    (b2,) = jexport.symbolic_shape("b")
    # extend's own scope: draft-block length k is symbolic too, so one
    # artifact serves any speculation depth
    b3, k3 = jexport.symbolic_shape(
        "b, k", constraints=[f"k <= {max_seq}"])
    tok_t = jax.ShapeDtypeStruct((b, t), jnp.int32)
    tok_1 = jax.ShapeDtypeStruct((b2, 1), jnp.int32)
    tok_k = jax.ShapeDtypeStruct((b3, k3), jnp.int32)
    cache_spec_k = jax.eval_shape(
        lambda: init_cache(config, b3, config.dtype, cache_len=max_seq))
    cache_spec = jax.eval_shape(
        lambda: init_cache(config, b2, config.dtype, cache_len=max_seq))
    pos_spec = jax.ShapeDtypeStruct((), jnp.int32)
    pos_rows_spec = jax.ShapeDtypeStruct((b2,), jnp.int32)
    row_cache_spec = jax.eval_shape(
        lambda: init_cache(config, 1, config.dtype, cache_len=max_seq))
    slot_spec = jax.ShapeDtypeStruct((), jnp.int32)

    pos_rows_k_spec = jax.ShapeDtypeStruct((b3,), jnp.int32)

    platforms = ("cpu", "tpu")
    pre = jexport.export(jax.jit(prefill), platforms=platforms)(tok_t)
    dec = jexport.export(jax.jit(decode_step), platforms=platforms)(
        tok_1, cache_spec, pos_spec)
    rows = jexport.export(jax.jit(decode_rows), platforms=platforms)(
        tok_1, cache_spec, pos_rows_spec)
    adm = jexport.export(jax.jit(admit), platforms=platforms)(
        cache_spec, row_cache_spec, slot_spec)
    ext = jexport.export(jax.jit(extend), platforms=platforms)(
        tok_k, cache_spec_k, pos_spec)
    # extend at per-row positions: same compute as `extend`, pos is [b] —
    # the speculative x continuous composition (model code already routes
    # [b] input_pos through per-row scatter + per-row absolute mask)
    ext_rows = jexport.export(jax.jit(extend), platforms=platforms)(
        tok_k, cache_spec_k, pos_rows_k_spec)
    if decode_chunk > 0:
        # same traced function at scalar and [b] positions: the model
        # already routes [b] input_pos through per-row scatter + per-row
        # absolute mask, and `p + 1` advances elementwise
        dk = jexport.export(jax.jit(decode_k), platforms=platforms)(
            tok_1, cache_spec, pos_spec)
        dkr = jexport.export(jax.jit(decode_k), platforms=platforms)(
            tok_1, cache_spec, pos_rows_spec)
        (out_dir / "decode_k.stablehlo").write_bytes(dk.serialize())
        (out_dir / "decode_k_rows.stablehlo").write_bytes(dkr.serialize())
        keys_spec = jax.ShapeDtypeStruct((b2, 2), jnp.uint32)
        pol_f_spec = jax.ShapeDtypeStruct((b2,), jnp.float32)
        pol_i_spec = jax.ShapeDtypeStruct((b2,), jnp.int32)
        dks = jexport.export(jax.jit(decode_k_sample),
                             platforms=platforms)(
            tok_1, cache_spec, pos_rows_spec, keys_spec, pol_f_spec,
            pol_i_spec, pol_f_spec)
        (out_dir / "decode_k_sample.stablehlo").write_bytes(
            dks.serialize())
    if page_size > 0:
        assert max_seq % page_size == 0, (max_seq, page_size)
        mp = max_seq // page_size

        def decode_paged(tok, cache, pos):
            # cache per layer = (pool_k, pool_v, table): the model's
            # paged branch scatters this token through the block table
            # and attends over the gathered logical window
            return model.apply({"params": params}, tok, cache=cache,
                               input_pos=pos)

        def admit_paged(cache, row_cache, pages):
            # splice a dense prefilled batch-1 row cache into the pool
            # pages a host allocator assigned (trash-page repeats for the
            # beyond-prompt tail are harmless: masked, then overwritten
            # page-by-page as decode advances)
            out = []
            for (pk, pv, tab), (rk, rv) in zip(cache, row_cache):
                kvh, hd = pk.shape[2], pk.shape[3]
                rk = rk[0].reshape(mp, page_size, kvh, hd)
                rv = rv[0].reshape(mp, page_size, kvh, hd)
                out.append((pk.at[pages].set(rk.astype(pk.dtype)),
                            pv.at[pages].set(rv.astype(pv.dtype)), tab))
            return tuple(out)

        # every symbol in a scope must be solvable from each artifact's
        # own args, so extend_paged (which adds the block length k) gets
        # its own scope below
        p_sym, b5 = jexport.symbolic_shape("p, b")
        kvh, hd = config.kv_heads, config.head_dim
        pool_spec = jax.ShapeDtypeStruct((p_sym, page_size, kvh, hd),
                                         config.dtype)
        tab_spec = jax.ShapeDtypeStruct((b5, mp), jnp.int32)
        paged_spec = tuple((pool_spec, pool_spec, tab_spec)
                           for _ in range(config.n_layer))
        tok_p = jax.ShapeDtypeStruct((b5, 1), jnp.int32)
        pos_p = jax.ShapeDtypeStruct((b5,), jnp.int32)
        pages_spec = jax.ShapeDtypeStruct((mp,), jnp.int32)
        row_spec = jax.eval_shape(
            lambda: init_cache(config, 1, config.dtype, cache_len=max_seq))
        dp = jexport.export(jax.jit(decode_paged), platforms=platforms)(
            tok_p, paged_spec, pos_p)
        ap = jexport.export(jax.jit(admit_paged), platforms=platforms)(
            paged_spec, row_spec, pages_spec)
        (out_dir / "decode_paged.stablehlo").write_bytes(dp.serialize())
        (out_dir / "admit_paged.stablehlo").write_bytes(ap.serialize())
        # block extend over the paged cache (tokens [b, k] at positions
        # pos..pos+k-1 through the table) — the ingest call of paged
        # PREFIX SHARING: page-aligned prefix pages are shared read-only
        # across rows (the gather sees them; decode never writes below
        # its own position), and extend_paged computes the per-request
        # tail + prompt KV conditioned on them. Same traced function as
        # decode_paged; k is symbolic (own scope, see above).
        p6, b6, k6 = jexport.symbolic_shape(
            "p, b, k", constraints=[f"k <= {max_seq}"])
        pool6 = jax.ShapeDtypeStruct((p6, page_size, kvh, hd),
                                     config.dtype)
        paged_spec6 = tuple(
            (pool6, pool6, jax.ShapeDtypeStruct((b6, mp), jnp.int32))
            for _ in range(config.n_layer))
        tok_pk = jax.ShapeDtypeStruct((b6, k6), jnp.int32)
        ep = jexport.export(jax.jit(decode_paged), platforms=platforms)(
            tok_pk, paged_spec6,
            jax.ShapeDtypeStruct((b6,), jnp.int32))
        (out_dir / "extend_paged.stablehlo").write_bytes(ep.serialize())
        if decode_chunk > 0:
            # the fused K-token pair over the PAGED cache: decode_k /
            # decode_k_sample are cache-agnostic (the model's paged
            # branch routes on the pytree arity), so the same traced
            # functions export against the paged spec. The host must
            # pre-allocate every page the K writes will touch.
            pkd = jexport.export(jax.jit(decode_k),
                                 platforms=platforms)(
                tok_p, paged_spec, pos_p)
            pks = jexport.export(jax.jit(decode_k_sample),
                                 platforms=platforms)(
                tok_p, paged_spec, pos_p,
                jax.ShapeDtypeStruct((b5, 2), jnp.uint32),
                jax.ShapeDtypeStruct((b5,), jnp.float32),
                jax.ShapeDtypeStruct((b5,), jnp.int32),
                jax.ShapeDtypeStruct((b5,), jnp.float32))
            (out_dir / "decode_paged_k.stablehlo").write_bytes(
                pkd.serialize())
            (out_dir / "decode_paged_k_sample.stablehlo").write_bytes(
                pks.serialize())
    (out_dir / "prefill.stablehlo").write_bytes(pre.serialize())
    (out_dir / "decode_step.stablehlo").write_bytes(dec.serialize())
    (out_dir / "decode_rows.stablehlo").write_bytes(rows.serialize())
    (out_dir / "admit.stablehlo").write_bytes(adm.serialize())
    (out_dir / "extend.stablehlo").write_bytes(ext.serialize())
    (out_dir / "extend_rows.stablehlo").write_bytes(ext_rows.serialize())
    (out_dir / "meta.json").write_text(json.dumps({
        "vocab_size": config.in_size,
        "block_size": config.block_size,
        "max_seq": max_seq,
        "n_layer": config.n_layer,
        "n_head": config.n_head,
        "n_kv_head": config.kv_heads,
        "n_embd": config.n_embd,
        "n_experts": config.n_experts,
        "quantize": config.quantize,
        "compute_dtype": config.compute_dtype,
        "format": "jax.export StableHLO",
        "platforms": list(platforms),
        "continuous": True,
        "speculative": True,
        "decode_chunk": int(decode_chunk),
        # the fused decode_k family returns (tokens, logprobs, cache);
        # loaders normalize older two-tuple artifacts to logprobs=None
        "decode_k_logprobs": decode_chunk > 0,
        "page_size": int(page_size),
    }, indent=2))
    return out_dir


def live_paged_surface(params, config: TransformerConfig,
                       max_seq: Optional[int] = None,
                       decode_chunk: int = 8,
                       page_size: int = 128) -> dict:
    """PagedLMServer's serving surface bound to LIVE jitted functions
    with the weights passed as a jit ARGUMENT on every call, instead of
    deserialized baked-weight artifacts. Two uses: serving straight from
    a checkpoint without an export step, and benchmarking real-model
    serving on the axon relay — baked-weight artifacts embed the entire
    parameter set in each remote compile request (hundreds of MB at
    GPT-2 scale -> 25-min compiles / HTTP 413; CLAUDE.md), while a
    params ARGUMENT stays device-resident. Same traced computations as
    export_lm's paged artifacts (shape-compiled lazily per call shape);
    consume with PagedLMServer(surface=...)."""
    model = Transformer(config)
    max_seq = config.block_size if max_seq is None else int(max_seq)
    assert 0 < max_seq <= config.block_size, (max_seq, config.block_size)
    assert max_seq % page_size == 0, (max_seq, page_size)
    assert decode_chunk > 0, decode_chunk
    mp = max_seq // page_size

    def prefill(p, tokens):
        cache = init_cache(config, tokens.shape[0], config.dtype,
                           cache_len=max_seq)
        return model.apply({"params": p}, tokens, cache=cache,
                           input_pos=jnp.int32(0))

    def decode_paged(p, tok, cache, pos):
        # also serves as extend_paged: the model routes on tok width
        return model.apply({"params": p}, tok, cache=cache,
                           input_pos=pos)

    def admit_paged(cache, row_cache, pages):
        out = []
        for (pk, pv, tab), (rk, rv) in zip(cache, row_cache):
            kvh, hd = pk.shape[2], pk.shape[3]
            rk = rk[0].reshape(mp, page_size, kvh, hd)
            rv = rv[0].reshape(mp, page_size, kvh, hd)
            out.append((pk.at[pages].set(rk.astype(pk.dtype)),
                        pv.at[pages].set(rv.astype(pv.dtype)), tab))
        return tuple(out)

    def _chosen_logprob(x, nxt):
        return jnp.take_along_axis(jax.nn.log_softmax(x, axis=-1),
                                   nxt, axis=-1)

    def decode_k(p, tok, cache, pos):
        def body(carry, _):
            t, c, q = carry
            logits, c = model.apply({"params": p}, t, cache=c,
                                    input_pos=q)
            x = logits[:, -1].astype(jnp.float32)
            nxt = jnp.argmax(x, axis=-1).astype(jnp.int32)[:, None]
            return (nxt, c, q + 1), (nxt, _chosen_logprob(x, nxt))
        (_, cache, _), (steps, lps) = jax.lax.scan(
            body, (tok, cache, pos), None, length=decode_chunk)
        return (jnp.swapaxes(steps[..., 0], 0, 1),
                jnp.swapaxes(lps[..., 0], 0, 1), cache)

    def decode_k_sample(p, tok, cache, pos, keys, temperature, top_k,
                        top_p):
        def body(carry, _):
            t, c, q = carry
            logits, c = model.apply({"params": p}, t, cache=c,
                                    input_pos=q)
            step_keys = jax.vmap(jax.random.fold_in)(keys, q)
            nxt = sample_rows(logits[:, -1], step_keys, temperature,
                              top_k, top_p)[:, None]
            lp = _chosen_logprob(logits[:, -1].astype(jnp.float32), nxt)
            return (nxt, c, q + 1), (nxt, lp)
        (_, cache, _), (steps, lps) = jax.lax.scan(
            body, (tok, cache, pos), None, length=decode_chunk)
        return (jnp.swapaxes(steps[..., 0], 0, 1),
                jnp.swapaxes(lps[..., 0], 0, 1), cache)

    pre_j = jax.jit(prefill)
    dp_j = jax.jit(decode_paged)
    ap_j = jax.jit(admit_paged)
    dk_j = jax.jit(decode_k)
    dks_j = jax.jit(decode_k_sample)
    meta = {
        "vocab_size": config.in_size,
        "block_size": config.block_size,
        "max_seq": max_seq,
        "n_layer": config.n_layer,
        "n_head": config.n_head,
        "n_kv_head": config.kv_heads,
        "n_embd": config.n_embd,
        "n_experts": config.n_experts,
        "quantize": config.quantize,
        "compute_dtype": config.compute_dtype,
        "format": "live jit (params as argument)",
        "continuous": True,
        "speculative": True,
        "decode_chunk": int(decode_chunk),
        "decode_k_logprobs": True,
        "page_size": int(page_size),
    }
    return {
        "prefill": lambda toks: pre_j(params, toks),
        "decode_paged": lambda tok, c, pos: dp_j(params, tok, c, pos),
        "admit_paged": ap_j,
        "extend_paged": lambda tok, c, pos: dp_j(params, tok, c, pos),
        "decode_paged_k": lambda tok, c, pos: dk_j(params, tok, c, pos),
        "decode_paged_k_sample": lambda tok, c, pos, keys, t, k, q:
            dks_j(params, tok, c, pos, keys, t, k, q),
        "meta": meta,
    }


def zero_cache(meta: dict, batch: int):
    """Host-side empty serving cache matching an exported artifact set —
    the starting point for chunked prefill via `extend` (extending a zero
    cache from position 0 IS prefill: the absolute-position mask hides the
    never-written slots, so the equality is exact, not approximate)."""
    # n_kv_head < n_head under GQA (older artifacts omit the key = MHA)
    shape = (batch, int(meta["max_seq"]),
             int(meta.get("n_kv_head") or meta["n_head"]),
             int(meta["n_embd"]) // int(meta["n_head"]))
    z = jnp.zeros(shape, jnp.dtype(meta["compute_dtype"]))
    return tuple((z, z) for _ in range(int(meta["n_layer"])))


def load_exported_lm(out_dir: Union[str, Path]):
    """(prefill_fn, decode_step_fn, meta) — callable at any batch/prompt
    size, no model code needed."""
    out_dir = Path(out_dir)
    pre = jexport.deserialize(
        (out_dir / "prefill.stablehlo").read_bytes())
    dec = jexport.deserialize(
        (out_dir / "decode_step.stablehlo").read_bytes())
    meta = json.loads((out_dir / "meta.json").read_text())
    return jax.jit(pre.call), jax.jit(dec.call), meta


def load_exported_continuous(out_dir: Union[str, Path]):
    """(prefill, decode_rows, admit, meta) — the continuous-batching
    surface. Raises FileNotFoundError on artifacts exported before the
    continuous pair existed."""
    out_dir = Path(out_dir)
    pre = jexport.deserialize(
        (out_dir / "prefill.stablehlo").read_bytes())
    rows = jexport.deserialize(
        (out_dir / "decode_rows.stablehlo").read_bytes())
    adm = jexport.deserialize(
        (out_dir / "admit.stablehlo").read_bytes())
    meta = json.loads((out_dir / "meta.json").read_text())
    return jax.jit(pre.call), jax.jit(rows.call), jax.jit(adm.call), meta


def load_exported_extend_rows(out_dir: Union[str, Path]):
    """extend_rows(tokens[b,k], cache, pos[b]) — the per-row block extend
    for speculative x continuous serving. Raises FileNotFoundError on
    artifacts exported before it existed."""
    out_dir = Path(out_dir)
    ext = jexport.deserialize(
        (out_dir / "extend_rows.stablehlo").read_bytes())
    return jax.jit(ext.call)


def _norm_fused(fn, has_lps: bool):
    """Normalize a fused decode_k-family artifact to the
    (tokens, logprobs|None, cache) contract (older artifacts returned
    (tokens, cache) — their logprobs slot is None and schedulers fall
    back to per-token decode for logprob requests)."""
    if has_lps:
        return fn

    def call(*args):
        toks, cache = fn(*args)
        return toks, None, cache
    return call


def load_exported_decode_k(out_dir: Union[str, Path]):
    """(decode_k, decode_k_rows, K) — the fused K-token greedy decode
    pair (one dispatch emits K tokens + their raw-model logprobs).
    Raises FileNotFoundError on artifacts exported before it existed or
    with decode_chunk=0."""
    out_dir = Path(out_dir)
    meta = json.loads((out_dir / "meta.json").read_text())
    k = int(meta.get("decode_chunk", 0))
    if k <= 0:
        raise FileNotFoundError(
            f"{out_dir} was exported without the decode_k pair")
    has_lps = bool(meta.get("decode_k_logprobs"))
    dk = jexport.deserialize(
        (out_dir / "decode_k.stablehlo").read_bytes())
    dkr = jexport.deserialize(
        (out_dir / "decode_k_rows.stablehlo").read_bytes())
    return (_norm_fused(jax.jit(dk.call), has_lps),
            _norm_fused(jax.jit(dkr.call), has_lps), k)


def load_exported_decode_k_sample(out_dir: Union[str, Path]):
    """(decode_k_sample, K) — the fused K-token SAMPLED decode (per-row
    temperature/top-k/top-p policy + per-row threefry keys on-device;
    chunk-invariant key schedule; chosen-token logprobs). Raises
    FileNotFoundError on artifacts exported before it existed."""
    out_dir = Path(out_dir)
    meta = json.loads((out_dir / "meta.json").read_text())
    k = int(meta.get("decode_chunk", 0))
    path = out_dir / "decode_k_sample.stablehlo"
    if k <= 0 or not path.exists():
        raise FileNotFoundError(
            f"{out_dir} was exported without decode_k_sample")
    has_lps = bool(meta.get("decode_k_logprobs"))
    return _norm_fused(jax.jit(jexport.deserialize(
        path.read_bytes()).call), has_lps), k


def load_exported_paged(out_dir: Union[str, Path]):
    """(prefill, decode_paged, admit_paged, meta) — the paged-cache
    serving surface (pool capacity symbolic; scheduler/allocator in
    infer/paged.py). Raises FileNotFoundError on artifacts exported
    without page_size."""
    out_dir = Path(out_dir)
    meta = json.loads((out_dir / "meta.json").read_text())
    if int(meta.get("page_size", 0)) <= 0:
        raise FileNotFoundError(
            f"{out_dir} was exported without the paged pair "
            "(export_lm(..., page_size=N))")
    pre = jexport.deserialize(
        (out_dir / "prefill.stablehlo").read_bytes())
    dp = jexport.deserialize(
        (out_dir / "decode_paged.stablehlo").read_bytes())
    ap = jexport.deserialize(
        (out_dir / "admit_paged.stablehlo").read_bytes())
    return jax.jit(pre.call), jax.jit(dp.call), jax.jit(ap.call), meta


def load_exported_extend_paged(out_dir: Union[str, Path]):
    """extend_paged(tokens[b,k], paged_cache, pos[b]) — block extend
    through the block table (prefix-sharing ingest). Raises
    FileNotFoundError on artifacts exported before it existed."""
    out_dir = Path(out_dir)
    path = out_dir / "extend_paged.stablehlo"
    if not path.exists():
        raise FileNotFoundError(
            f"{out_dir} was exported without extend_paged")
    return jax.jit(jexport.deserialize(path.read_bytes()).call)


def load_exported_paged_k(out_dir: Union[str, Path]):
    """(decode_paged_k, decode_paged_k_sample, K) — the fused K-token
    pair over the paged cache ((tokens, logprobs|None, cache) like the
    dense pair). Raises FileNotFoundError on artifacts exported without
    both page_size and decode_chunk."""
    out_dir = Path(out_dir)
    meta = json.loads((out_dir / "meta.json").read_text())
    k = int(meta.get("decode_chunk", 0))
    path = out_dir / "decode_paged_k.stablehlo"
    if k <= 0 or not path.exists():
        raise FileNotFoundError(
            f"{out_dir} was exported without the paged decode_k pair")
    has_lps = bool(meta.get("decode_k_logprobs"))
    dk = jexport.deserialize(path.read_bytes())
    dks = jexport.deserialize(
        (out_dir / "decode_paged_k_sample.stablehlo").read_bytes())
    return (_norm_fused(jax.jit(dk.call), has_lps),
            _norm_fused(jax.jit(dks.call), has_lps), k)


def load_exported_speculative(out_dir: Union[str, Path]):
    """(prefill, extend, meta) — the target-model side of speculative
    decoding (block verify into an existing cache). Raises
    FileNotFoundError on artifacts exported before `extend` existed."""
    out_dir = Path(out_dir)
    pre = jexport.deserialize(
        (out_dir / "prefill.stablehlo").read_bytes())
    ext = jexport.deserialize(
        (out_dir / "extend.stablehlo").read_bytes())
    meta = json.loads((out_dir / "meta.json").read_text())
    return jax.jit(pre.call), jax.jit(ext.call), meta


def greedy_decode_exported(out_dir: Union[str, Path], prompt,
                           max_new_tokens: int):
    """Reference serving loop over the artifacts: prefill once, then one
    decode_step per token, greedy."""
    import numpy as np

    prefill, decode_step, meta = load_exported_lm(out_dir)
    prompt = jnp.asarray(prompt, jnp.int32)
    if max_new_tokens <= 0:
        return np.asarray(prompt)
    limit = meta.get("max_seq", meta["block_size"])
    if prompt.shape[1] + max_new_tokens > limit:
        # past the exported cache the write clamps to the last slot and
        # the outputs silently go stale — fail loudly instead
        raise ValueError(
            f"prompt {prompt.shape[1]} + {max_new_tokens} new tokens "
            f"exceeds the exported serving window {limit}")
    logits, cache = prefill(prompt)
    pos = jnp.int32(prompt.shape[1])
    toks = [prompt]
    tok = jnp.argmax(logits[:, -1:].astype(jnp.float32), axis=-1)
    for _ in range(max_new_tokens - 1):
        toks.append(tok)
        logits, cache = decode_step(tok.astype(jnp.int32), cache, pos)
        tok = jnp.argmax(logits[:, -1:].astype(jnp.float32), axis=-1)
        pos = pos + 1
    toks.append(tok)
    return np.concatenate([np.asarray(x) for x in toks], axis=1)

"""Serving runtime over exported LM artifacts (infer/export_lm.py).

The exported pair — `prefill(tokens[b,t])` and
`decode_step(tok[b,1], cache, pos)` — fixes the device-side compute; this
module is the host-side serving policy around it: sampling (greedy /
temperature / top-k / top-p), request batching, and the serving window
guard.
Everything here runs from the StableHLO artifacts alone (no model code,
no checkpoint importer), which is the point of the AOT export.

Batching contract: the artifacts share one scalar `pos` across the batch,
so a batch must be same-prompt-length. `generate_batch` enforces that;
`serve_requests` buckets a request list by (prompt length, sampling
params) and runs one prefill+decode chain per bucket. (The reference has
no serving story at all — networks.py:727-754 re-runs eager python per
token from the training source tree.)
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tempo_tpu.infer.export_lm import (load_exported_continuous,
                                        load_exported_decode_k,
                                        load_exported_decode_k_sample,
                                        load_exported_extend_rows,
                                        load_exported_lm,
                                        load_exported_speculative,
                                        zero_cache)


def chunked_prefill(extend_fn, meta: Dict[str, Any], prompts,
                    chunk: int):
    """Exact prefill in fixed-size chunks through the `extend` artifact.

    One-shot prefill materializes [b, n_head, t, max_seq] float32
    attention scores per layer; at serving windows that peak is the
    host-visible OOM for long prompts. Extending a ZERO cache from
    position 0 computes the identical cache and final-position logits —
    the absolute-position mask hides never-written slots — while bounding
    the score tensor to [b, n_head, chunk, max_seq] per call. Returns
    (logits_of_last_chunk, cache); callers only consume logits[:, -1].
    At most two distinct chunk widths are dispatched (the ragged tail),
    and the `extend` artifact's k dimension is symbolic, so no re-export
    is needed for any chunk size."""
    prompts = jnp.asarray(prompts, jnp.int32)
    b, t = prompts.shape
    assert chunk >= 1, chunk
    cache = zero_cache(meta, b)
    logits = None
    for i in range(0, t, chunk):
        blk = prompts[:, i:i + chunk]
        logits, cache = extend_fn(blk, cache, jnp.int32(i))
    assert logits is not None, "empty prompt"
    return logits, cache


def _truncate_support(logits: np.ndarray, top_k: Optional[int],
                      top_p: Optional[float]) -> np.ndarray:
    """Support truncation shared by every sampling path: top-k (keep the
    k largest logits) then top-p / nucleus (keep the smallest prefix of
    the sorted distribution whose mass reaches p, INCLUDING the token
    that crosses the boundary — same semantics as nn.transformer's
    nucleus_mask). Works on [..., V]."""
    if top_k is not None and 0 < top_k < logits.shape[-1]:
        kth = np.partition(logits, -top_k, axis=-1)[..., -top_k:][..., :1]
        logits = np.where(logits < kth, -np.inf, logits)
    if top_p is not None and top_p < 1.0:
        x = logits - logits.max(axis=-1, keepdims=True)
        probs = np.exp(x)
        probs /= probs.sum(axis=-1, keepdims=True)
        sp = np.sort(probs, axis=-1)[..., ::-1]
        cum = np.cumsum(sp, axis=-1)
        keep = (cum - sp) < top_p  # exclusive cumsum: index 0 always kept
        thr = np.where(keep, sp, np.inf).min(axis=-1, keepdims=True)
        logits = np.where(probs < thr, -np.inf, logits)
    return logits


def parse_stops(req: Dict[str, Any], vocab: int) -> List[tuple]:
    """Normalize a request's 'stop' field into a list of token tuples.
    Accepts one sequence ([ids...]) or several ([[ids...], ...]);
    validates ids against the vocab. Empty/absent -> []."""
    raw = req.get("stop")
    if not raw:
        return []
    if isinstance(raw[0], int):
        raw = [raw]
    stops = []
    for s in raw:
        s = [int(x) for x in s]
        if not s:
            raise ValueError("empty stop sequence")
        if min(s) < 0 or max(s) >= vocab:
            raise ValueError(f"stop token ids outside [0, {vocab})")
        stops.append(tuple(s))
    return stops


def check_stops(st: Dict[str, Any]) -> bool:
    """Multi-token stop rule, applied after a token lands in st['out']:
    if the output now ENDS WITH any stop sequence, trim the matched
    tokens (the OpenAI convention — stop text excluded, unlike the
    single-token 'eos', which is kept) and mark the slot finished."""
    for stop in st.get("stops", ()):
        n = len(stop)
        if len(st["out"]) >= n and tuple(st["out"][-n:]) == stop:
            del st["out"][len(st["out"]) - n:]
            st["eos_hit"] = True
            st["remaining"] = 0
            return True
    return False


def device_sample(logits: np.ndarray, keys: np.ndarray, pos,
                  temperature, top_k, top_p) -> np.ndarray:
    """The ONE canonical sampled stream every scheduler draws: the
    on-device sampler (export_lm.sample_rows) with per-row threefry keys
    folded with the ABSOLUTE position of the fed token. Greedy rows
    (temperature 0) take the argmax. Bucketed, continuous per-token,
    fused decode_k chunks, paged, and online paths all call this (or the
    in-artifact scan with the same schedule), so a request's sampled
    output depends only on (seed, prompt, positions) — never on the
    scheduler, chunk size, batch composition, or preemption. logits
    [b, V]; keys [b, 2] uint32; pos/temperature/top_k/top_p length-b
    vectors (top_k 0 and top_p >= 1 disable truncation). Returns
    [b, 1] int64."""
    from tempo_tpu.infer.export_lm import sample_rows

    step_keys = jax.vmap(jax.random.fold_in)(
        jnp.asarray(np.asarray(keys, np.uint32)),
        jnp.asarray(np.asarray(pos, np.int32)))
    if isinstance(logits, jax.Array):
        # device-resident logits stay on device: the draw computes
        # there and only [b,1] tokens cross the transport, instead of a
        # [b,V] logits fetch per dispatch (same sample_rows math — the
        # cast to f32 happens on-device instead of on the host)
        x = logits.astype(jnp.float32)
    else:
        x = jnp.asarray(np.asarray(logits, np.float32))
    out = sample_rows(x,
                      step_keys,
                      jnp.asarray(np.asarray(temperature, np.float32)),
                      jnp.asarray(np.asarray(top_k, np.int32)),
                      jnp.asarray(np.asarray(top_p, np.float32)))
    return np.asarray(out)[:, None].astype(np.int64)


def spec_draw_block(slots: Sequence[Optional[Dict[str, Any]]],
                    logits_bmv: np.ndarray,
                    offset: int = 0) -> np.ndarray:
    """Canonical-stream draws for every active slot over m consecutive
    emitted positions: logits [b, m, V], where slot s's column i sits at
    absolute fed-position n_committed[s] - 1 + offset + i. Greedy slots
    take the host argmax (same first-max tie-break as the device
    argmax); sampled slots ride ONE batched device_sample over all
    (slot, position) pairs. Shared by the speculative schedulers (dense
    SpecLMEngine and the paged composition): the draft proposes and the
    target verifies through this same schedule, so accepted chains are
    exactly the canonical stream's."""
    b, m = logits_bmv.shape[0], logits_bmv.shape[1]
    drawn = np.zeros((b, m), np.int64)
    sampled = []
    for s in range(b):
        st = slots[s]
        if st is None:
            continue
        if st["temperature"] <= 0.0:
            drawn[s] = np.argmax(logits_bmv[s].astype(np.float32),
                                 axis=-1)
        else:
            sampled.append(s)
    if sampled:
        n = len(sampled)
        flat = np.asarray(logits_bmv[sampled],
                          np.float32).reshape(n * m, -1)
        keys = np.repeat(np.stack(
            [slots[s]["key"] for s in sampled]), m, axis=0)
        pos = np.concatenate(
            [slots[s]["n_committed"] - 1 + offset + np.arange(m)
             for s in sampled])
        temp = np.repeat(np.asarray(
            [slots[s]["temperature"] for s in sampled], np.float32), m)
        topk = np.repeat(np.asarray(
            [int(slots[s]["top_k"] or 0) for s in sampled], np.int32), m)
        topp = np.repeat(np.asarray(
            [1.0 if slots[s]["top_p"] is None
             else float(slots[s]["top_p"]) for s in sampled],
            np.float32), m)
        out = device_sample(flat, keys, pos, temp, topk, topp)
        drawn[sampled] = out[:, 0].reshape(n, m)
    return drawn


def token_logprob(logits_row: np.ndarray, tok: int) -> float:
    """log p(tok) under the RAW model distribution (no temperature /
    truncation — the OpenAI logprobs convention) for one [V] row."""
    x = np.asarray(logits_row, np.float64).reshape(-1)
    x = x - x.max()
    return float(x[tok] - np.log(np.exp(x).sum()))


def policy_probs(logits_row: np.ndarray, temperature: float,
                 top_k: Optional[int],
                 top_p: Optional[float] = None) -> np.ndarray:
    """The serving sampling policy as an explicit probability vector [V]
    (temperature scaling + top-k/top-p support truncation — the same
    support `export_lm.truncate_support_rows` keeps on-device; pinned by
    test_decode_k_sample_policy_support). This is the distribution every
    canonical-stream draw follows, and the one the classical rejection-
    sampling reference (`speculative_accept`) preserves."""
    logits = np.asarray(logits_row, np.float64).reshape(-1)
    assert temperature > 0.0, "policy_probs is the sampled path"
    logits = _truncate_support(logits / float(temperature), top_k, top_p)
    logits -= logits.max()
    probs = np.exp(logits)
    return probs / probs.sum()


def speculative_accept(p: np.ndarray, q: np.ndarray, draft_tok: int,
                       u: float) -> tuple:
    """One rejection-sampling step of CLASSICAL (Leviathan) speculative
    decoding: the draft token was sampled from q; accept it with
    probability min(1, p/q) and otherwise resample from the residual
    max(p - q, 0) (normalized). Marginalized over draft_tok ~ q, the
    emitted token is EXACTLY ~ p — pinned analytically by
    test_export.py::test_speculative_accept_math.

    The live schedulers no longer draw this path: they verify against
    the canonical device stream instead (accept iff draft == the
    fold_in(key, position) draw), which strengthens the marginal
    guarantee into exact per-token STREAM equality across schedulers.
    Kept as the distribution-correctness reference.

    Returns (accepted: bool, residual: Optional[np.ndarray]) — residual
    is the normalized distribution to resample from on rejection (falls
    back to p itself in the measure-zero case residual == 0)."""
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    pd, qd = float(p[draft_tok]), float(q[draft_tok])
    if qd <= 0.0:
        # the draft could never propose this token under q; treat as a
        # hard reject (acceptance ratio p/q -> inf is only sound if the
        # proposal truly came from q)
        accept = False
    else:
        accept = u < min(1.0, pd / qd)
    if accept:
        return True, None
    residual = np.maximum(p - q, 0.0)
    s = residual.sum()
    return False, (residual / s if s > 0.0 else p)


class LMServer:
    """Loads the exported artifacts once; serves batched generate calls."""

    def __init__(self, artifacts_dir: Union[str, Path],
                 prefill_chunk: Optional[int] = None):
        self.prefill, self.decode_step, self.meta = load_exported_lm(
            artifacts_dir)
        self.window = int(self.meta.get("max_seq", self.meta["block_size"]))
        self.vocab = int(self.meta["vocab_size"])
        self.prefill_chunk = prefill_chunk
        self.extend = None
        if prefill_chunk is not None:
            # chunked prefill rides the `extend` artifact (symbolic k)
            _, self.extend, _ = load_exported_speculative(artifacts_dir)
        self._artifacts_dir = artifacts_dir
        try:
            # fused K-token greedy decode (one dispatch per K tokens);
            # absent on artifacts exported before it existed
            self.decode_k, _, self.k_decode = load_exported_decode_k(
                artifacts_dir)
        except FileNotFoundError:
            self.decode_k, self.k_decode = None, 0
        try:
            # fused K-token SAMPLED decode: a bucketed batch shares one
            # sampling policy, so the whole bucket rides the on-device
            # sampler. Key schedule (the canonical stream): every row
            # gets the IDENTICAL PRNGKey(seed); the per-step key folds
            # in only the fed token's ABSOLUTE position. Identical
            # prompts at one seed therefore return byte-identical
            # completions — N diverse samples of one prompt need N
            # distinct per-request seeds.
            self.decode_k_sample, _ = load_exported_decode_k_sample(
                artifacts_dir)
        except FileNotFoundError:
            self.decode_k_sample = None
        # prefix cache: tuple(prefix tokens) -> batch-1 KV cache pytree
        self._prefix_caches: Dict[tuple, Any] = {}
        # beam decode: jitted cache expand (per beam width) / reorder —
        # one device dispatch per step instead of 2*n_layer tree gathers
        self._beam_expand_jits: Dict[int, Any] = {}
        self._beam_reorder_jit = None

    def _prefill(self, prompts: jnp.ndarray):
        c = self.prefill_chunk
        if c is not None and prompts.shape[1] > c:
            return chunked_prefill(self.extend, self.meta, prompts, c)
        return self.prefill(prompts)

    def _need_extend(self):
        if self.extend is None:
            _, self.extend, _ = load_exported_speculative(
                self._artifacts_dir)
        return self.extend

    def _prefix_cache(self, prefix: tuple):
        """Batch-1 KV cache for a shared prompt prefix, computed ONCE per
        distinct prefix and memoized. Built by extending a zero cache so
        the cache layout is exactly the prefill path's, and the
        absolute-position mask makes reuse exact (positions beyond the
        prefix are never-written and invisible)."""
        cached = self._prefix_caches.get(prefix)
        if cached is None:
            extend = self._need_extend()
            arr = jnp.asarray(np.asarray(prefix, np.int32).reshape(1, -1))
            _, cached = extend(arr, zero_cache(self.meta, 1), jnp.int32(0))
            self._prefix_caches[prefix] = cached
        return cached

    def generate_batch(self, prompts: np.ndarray, max_new_tokens: int,
                       temperature: float = 0.0,
                       top_k: Optional[int] = None,
                       seed: int = 0,
                       top_p: Optional[float] = None,
                       prefix: Optional[Sequence[int]] = None) -> np.ndarray:
        """prompts: int array [b, t] (same length per row — the artifact
        shares one position counter). Returns [b, max_new_tokens].

        `prefix`: a shared prompt prefix (system prompt) whose KV cache is
        computed once per distinct prefix and reused across calls and
        batch rows — each call then prefills only the [b, t] suffixes
        through the `extend` artifact at position len(prefix). Pinned
        bit-equal (greedy) to prefilling the concatenated prompts.

        Sampling: the canonical stream ties the draw to (seed, prompt,
        positions) only — identical rows at one `seed` emit identical
        tokens. For N diverse samples of one prompt, make N calls with
        distinct seeds (or distinct per-request 'seed's in the batch
        schedulers)."""
        prompts = np.asarray(prompts, np.int32)
        assert prompts.ndim == 2, prompts.shape
        b, t = prompts.shape
        n_prefix = len(prefix) if prefix else 0
        if max_new_tokens <= 0:
            return np.zeros((b, 0), np.int32)
        if n_prefix + t + max_new_tokens > self.window:
            raise ValueError(
                f"prefix {n_prefix} + prompt {t} + {max_new_tokens} new "
                f"tokens exceeds the exported serving window {self.window}")
        if prompts.size and (prompts.min() < 0 or prompts.max() >= self.vocab):
            raise ValueError(f"token ids outside [0, {self.vocab})")
        if n_prefix:
            assert t >= 1, "prefix mode needs at least one suffix token"
            pfx_cache = self._prefix_cache(tuple(int(x) for x in prefix))
            cache = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (b,) + x.shape[1:]),
                pfx_cache)
            logits, cache = self._need_extend()(
                jnp.asarray(prompts), cache, jnp.int32(n_prefix))
            t = n_prefix + t  # decode continues from the absolute position
        else:
            logits, cache = self._prefill(jnp.asarray(prompts))
        pos = int(t)
        remaining = max_new_tokens - 1
        if temperature > 0.0:
            # the canonical device stream (see device_sample): one key
            # per request SEED — identical (seed, prompt) requests yield
            # identical outputs on every scheduler, and chunked vs
            # per-token decode agree because step keys fold the ABSOLUTE
            # position. Fused decode_k_sample chunks when the artifact
            # exists and the window allows a full chunk of writes (a
            # surplus final chunk is trimmed — its extra writes are
            # never attended, the loop exits right after); the per-token
            # tail draws the same stream via the host-side jax twin.
            keys = np.tile(np.asarray(jax.random.PRNGKey(seed),
                                      np.uint32)[None], (b, 1))
            temp_v = np.full(b, float(temperature), np.float32)
            topk_v = np.full(b, int(top_k or 0), np.int32)
            topp_v = np.full(b, 1.0 if top_p is None else float(top_p),
                             np.float32)
            tok = device_sample(logits[:, -1], keys,
                                np.full(b, pos - 1), temp_v, topk_v,
                                topp_v).astype(np.int32)
            out = [tok]
            while (self.decode_k_sample is not None and remaining > 0
                   and pos + self.k_decode <= self.window):
                chunk, _lps, cache = self.decode_k_sample(
                    jnp.asarray(tok, jnp.int32), cache,
                    jnp.full((b,), pos, jnp.int32), jnp.asarray(keys),
                    jnp.asarray(temp_v), jnp.asarray(topk_v),
                    jnp.asarray(topp_v))
                take = min(self.k_decode, remaining)
                chunk = np.asarray(chunk)[:, :take]
                out.append(chunk)
                tok = chunk[:, -1:]
                pos += take
                remaining -= take
            for _ in range(remaining):
                logits, cache = self.decode_step(
                    jnp.asarray(tok, jnp.int32), cache, jnp.int32(pos))
                tok = device_sample(logits[:, -1], keys,
                                    np.full(b, pos), temp_v, topk_v,
                                    topp_v).astype(np.int32)
                out.append(tok)
                pos += 1
            return np.concatenate(out, axis=1).astype(np.int32)
        # greedy (temperature <= 0): host argmax — identical first-max
        # tie-break to the device argmax in the fused chunks
        tok = np.argmax(np.asarray(logits[:, -1], np.float32), axis=-1,
                        keepdims=True)
        out = [tok]
        if self.decode_k is not None:
            # greedy rides the fused decode_k artifact: the argmax
            # feedback runs on-device, one dispatch per K tokens
            # (bit-equal to the per-token loop; pinned in test_export.py)
            while remaining >= self.k_decode:
                chunk, _lps, cache = self.decode_k(
                    jnp.asarray(tok, jnp.int32), cache, jnp.int32(pos))
                chunk = np.asarray(chunk)
                out.append(chunk)
                tok = chunk[:, -1:]
                pos += self.k_decode
                remaining -= self.k_decode
        for _ in range(remaining):
            logits, cache = self.decode_step(
                jnp.asarray(tok, jnp.int32), cache, jnp.int32(pos))
            tok = np.argmax(np.asarray(logits[:, -1], np.float32),
                            axis=-1, keepdims=True)
            out.append(tok)
            pos = pos + 1
        return np.concatenate(out, axis=1).astype(np.int32)

    # ----------------------------------------------- beam decode (serving)

    def _beam_expand(self, cache, k: int):
        fn = self._beam_expand_jits.get(k)
        if fn is None:
            fn = jax.jit(lambda c: jax.tree_util.tree_map(
                lambda l: jnp.repeat(l, k, axis=0), c))
            self._beam_expand_jits[k] = fn
        return fn(cache)

    def _beam_reorder(self, cache, flat_parent):
        if self._beam_reorder_jit is None:
            self._beam_reorder_jit = jax.jit(
                lambda c, i: jax.tree_util.tree_map(
                    lambda l: jnp.take(l, i, axis=0), c))
        return self._beam_reorder_jit(cache, flat_parent)

    def beam_batch(self, prompts: np.ndarray, max_new_tokens: int,
                   beam_width: int, eos_id: Optional[int] = None,
                   length_penalty: float = 0.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Deterministic beam decode over the exported artifacts.

        Serving twin of nn.beam.beam_search (same scoring, frozen-eos and
        GNMT length-penalty semantics; pinned equal in test_export.py):
        the device runs the unmodified prefill/decode_step StableHLO on a
        [b*k] flattened beam batch, the host scores candidates, and the
        per-step beam reorder is ONE jitted cache gather. Returns
        (continuations [b, k, max_new_tokens] best-first, scores [b, k]);
        unlike the live-model API the prompt is not repeated in the
        output, matching generate_batch.
        """
        prompts = np.asarray(prompts, np.int32)
        assert prompts.ndim == 2, prompts.shape
        b, t = prompts.shape
        k = int(beam_width)
        assert 1 <= k <= self.vocab, (k, self.vocab)
        assert max_new_tokens >= 1
        if t + max_new_tokens > self.window:
            raise ValueError(
                f"prompt {t} + {max_new_tokens} new tokens exceeds the "
                f"exported serving window {self.window}")
        if prompts.min() < 0 or prompts.max() >= self.vocab:
            raise ValueError(f"token ids outside [0, {self.vocab})")

        def log_softmax(x):
            x = np.asarray(x, np.float32)
            x = x - x.max(axis=-1, keepdims=True)
            return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))

        def top_k_rows(cand):
            # lax.top_k tie order (lowest index wins) via stable argsort
            idx = np.argsort(-cand, axis=-1, kind="stable")[:, :k]
            return np.take_along_axis(cand, idx, axis=-1), idx

        logits, cache = self._prefill(jnp.asarray(prompts))
        scores, tok = top_k_rows(log_softmax(np.asarray(logits[:, -1])))
        cache = self._beam_expand(cache, k)

        toks = np.zeros((b, k, max_new_tokens), np.int32)
        toks[:, :, 0] = tok
        finished = (tok == eos_id) if eos_id is not None \
            else np.zeros((b, k), bool)
        lengths = np.ones((b, k), np.int64)
        if eos_id is not None:
            frozen_row = np.full((self.vocab,), -np.inf, np.float32)
            frozen_row[eos_id] = 0.0
        rows = np.arange(b)[:, None] * k

        for i in range(1, max_new_tokens):
            logits, cache = self.decode_step(
                jnp.asarray(tok.reshape(b * k, 1), jnp.int32), cache,
                jnp.int32(t + i - 1))
            logp = log_softmax(
                np.asarray(logits[:, -1])).reshape(b, k, self.vocab)
            if eos_id is not None:
                logp = np.where(finished[:, :, None], frozen_row, logp)
            cand = (scores[:, :, None] + logp).reshape(b, k * self.vocab)
            scores, flat = top_k_rows(cand)
            parent = flat // self.vocab
            tok = (flat % self.vocab).astype(np.int32)
            toks = np.take_along_axis(toks, parent[:, :, None], axis=1)
            finished = np.take_along_axis(finished, parent, axis=1)
            lengths = np.take_along_axis(lengths, parent, axis=1)
            cache = self._beam_reorder(
                cache, jnp.asarray((rows + parent).reshape(b * k)))
            toks[:, :, i] = tok
            lengths = lengths + (~finished)
            if eos_id is not None:
                finished = finished | (tok == eos_id)

        if length_penalty != 0.0:
            scores = scores / ((5.0 + lengths.astype(np.float32)) / 6.0
                               ) ** length_penalty
            order = np.argsort(-scores, axis=-1, kind="stable")
            scores = np.take_along_axis(scores, order, axis=1)
            toks = np.take_along_axis(toks, order[:, :, None], axis=1)
        if eos_id is not None:
            past_eos = np.cumsum(toks == eos_id, axis=-1) > 1
            toks = np.where(past_eos, eos_id, toks)
        return toks, scores.astype(np.float32)

    def serve_requests(self, requests: Sequence[Dict[str, Any]],
                       default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        """requests: dicts with 'tokens' (list[int]) and optional
        'n_tokens', 'temperature', 'top_k', 'top_p', 'seed', 'prefix'
        (shared system-prompt tokens — KV-cached once per distinct
        prefix), and 'beam_width' (+ 'eos', 'length_penalty'): beam
        requests decode via beam_batch and their responses carry all k
        hypotheses under 'beams'/'scores' with the best one as 'tokens'.
        Buckets by (prompt length, sampling params, prefix, beam) so each
        bucket is one batched prefill+decode chain; responses keep
        request order."""
        buckets: Dict[tuple, List[int]] = {}
        for i, req in enumerate(requests):
            if "tokens" not in req:
                raise ValueError(f"request {i}: missing 'tokens'")
            if req.get("beam_width") and req.get("prefix"):
                raise ValueError(
                    f"request {i}: beam_width does not compose with "
                    f"prefix caching yet")
            # refuse rather than silently mis-serve: per-request early
            # stops and logprobs need per-slot bookkeeping — that is
            # the slot schedulers' job (continuous/online/paged/
            # speculative); the bucketed chains share one position
            # counter ('eos' is honored inside beam requests only)
            for key in (("stop", "logprobs") if req.get("beam_width")
                        else ("stop", "logprobs", "eos")):
                # presence, not truthiness, for eos: token id 0 is a
                # real vocab id and must be refused like any other
                if req.get(key) or (key == "eos"
                                    and req.get(key) is not None):
                    raise ValueError(
                        f"request {i}: {key!r} is not supported by the "
                        "bucketed scheduler — use scheduler: continuous "
                        "(or online/paged/speculative)")
            beam = None
            if req.get("beam_width"):
                beam = (int(req["beam_width"]), req.get("eos"),
                        float(req.get("length_penalty", 0.0)))
            key = (len(req["tokens"]),
                   int(req.get("n_tokens", default_new_tokens)),
                   float(req.get("temperature", 0.0)),
                   req.get("top_k"), req.get("top_p"),
                   int(req.get("seed", 0)),
                   tuple(req["prefix"]) if req.get("prefix") else None,
                   beam)
            buckets.setdefault(key, []).append(i)

        responses: List[Optional[Dict[str, Any]]] = [None] * len(requests)
        for (t, n_tokens, temperature, top_k, top_p, seed,
             prefix, beam), idxs in buckets.items():
            prompts = np.asarray([requests[i]["tokens"] for i in idxs],
                                 np.int32).reshape(len(idxs), t)
            t0 = time.perf_counter()
            beams = scores = None
            if beam is not None:
                k, eos, alpha = beam
                beams, scores = self.beam_batch(prompts, n_tokens, k,
                                                eos_id=eos,
                                                length_penalty=alpha)
                toks = beams[:, 0]  # best hypothesis as the response tokens
            else:
                toks = self.generate_batch(prompts, n_tokens,
                                           temperature=temperature,
                                           top_k=top_k, top_p=top_p,
                                           seed=seed, prefix=prefix)
            dt = time.perf_counter() - t0
            per_req = dt / len(idxs)
            for row, i in enumerate(idxs):
                responses[i] = {
                    "tokens": toks[row].tolist(),
                    "n_prompt": t,
                    "n_generated": int(toks.shape[1]),
                    "batch": len(idxs),
                    "seconds": round(per_req, 4),
                }
                if beams is not None:
                    responses[i]["beams"] = beams[row].tolist()
                    responses[i]["scores"] = scores[row].tolist()
        assert all(r is not None for r in responses)
        return responses  # type: ignore[return-value]

    def serve(self, requests: Sequence[Dict[str, Any]],
              default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        """Scheduler-agnostic alias: hosts call serve() on either server."""
        return self.serve_requests(requests, default_new_tokens)


class _TicketEngine:
    """Shared ticket plumbing for the decode engines (LMEngine and
    SpecLMEngine): validated submission with zero-budget short-circuit,
    work detection, and cancellation (pending requests never run;
    active ones finalize with their partial tokens, response flagged
    `cancelled: true`). Subclasses provide `s` (the server), `pending`,
    `finished`, `slots`, `_ticket`, `default_new_tokens`, and
    `_finalize`."""

    def submit(self, req: Dict[str, Any]) -> int:
        """Validate + enqueue; returns a ticket to look up in
        `finished`. Zero-budget requests finish immediately."""
        self.s._validate([req], self.default_new_tokens)
        t = self._ticket
        self._ticket += 1
        n_tokens = int(req.get("n_tokens", self.default_new_tokens))
        if n_tokens <= 0:
            self.finished[t] = {"tokens": [], "n_prompt":
                                len(req["tokens"]), "n_generated": 0,
                                "slot": -1, "stopped_early": False}
        else:
            self.pending.append((t, req, n_tokens))
        return t

    def has_work(self) -> bool:
        return bool(self.pending) or any(
            st is not None for st in self.slots)

    def cancel(self, ticket: int) -> bool:
        """Cancel a submitted request: a pending one never runs; an
        active one finalizes immediately with the tokens generated so
        far. Either way the ticket's response exists afterwards and
        carries `cancelled: true`. Finished tickets are left untouched
        (returns False)."""
        for i, (t, req, n) in enumerate(self.pending):
            if t == ticket:
                self.pending.pop(i)
                self.finished[ticket] = {
                    "tokens": [], "n_prompt": len(req["tokens"]),
                    "n_generated": 0, "slot": -1,
                    "stopped_early": False, "cancelled": True}
                return True
        for s, st in enumerate(self.slots):
            if st is not None and st["ticket"] == ticket:
                st["cancelled"] = True
                self._finalize(s)
                return True
        return False

    # ---- shared fused-burst machinery (LMEngine + PagedLMEngine) ----
    def _chain_gate(self, active, k: int, window: int,
                    cap: int = 4) -> int:
        """DRAIN CHAINING depth: how many fused chunks to dispatch
        back-to-back. Only when nothing is pending (chaining would
        delay admission), every active slot's budget survives the
        extra chunks, and the window allows the writes."""
        chains = 1
        while (chains < cap and not self.pending
               and all(self.slots[s]["remaining"] > chains * k
                       for s in active if self.slots[s] is not None)
               and all(self.pos[s] + (chains + 1) * k <= window
                       for s in active if self.slots[s] is not None)):
            chains += 1
        return chains

    def _policy_arrays(self, active):
        """Per-row sampling policy marshaled for the fused sampled
        artifacts: (keys [b,2], temperature, top_k, top_p)."""
        b = len(self.slots)
        keys = np.zeros((b, 2), np.uint32)
        temp = np.zeros(b, np.float32)
        topk = np.zeros(b, np.int32)
        topp = np.ones(b, np.float32)
        for s in active:
            st = self.slots[s]
            keys[s] = st["key"]
            temp[s] = st["temperature"]
            topk[s] = int(st["top_k"] or 0)
            topp[s] = float(1.0 if st["top_p"] is None else st["top_p"])
        return keys, temp, topk, topp

    def _run_burst(self, active, k: int, chains: int, dispatch) -> None:
        """Dispatch `chains` fused chunks feeding each chunk's DEVICE
        token slice into the next (one host sync per burst; jax async
        dispatch queues the rest), then commit: mid-burst finishers
        skip the remaining chunks (their tail is discarded like any
        over-decode). Token streams are unchanged — the canonical
        stream is chunk-boundary invariant.
        `dispatch(tok_dev, pos_dev) -> (tokens, lps)`."""
        burst = []
        tok_dev = jnp.asarray(self.toks)
        pos_base = self.pos.copy()
        for c in range(chains):
            chunk, lps = dispatch(tok_dev, jnp.asarray(pos_base + c * k))
            burst.append((chunk, lps))
            tok_dev = chunk[:, -1:]  # device slice — no host sync
        self.decode_steps += chains
        self.decode_bursts += 1
        for chunk, lps in burst:
            chunk_np = np.asarray(chunk)
            lps_np = None if lps is None else np.asarray(lps)
            for s in active:
                st = self.slots[s]
                if st is None:
                    continue  # finished earlier in the burst
                for j in range(k):
                    self.pos[s] += 1
                    if st["lps"] is not None:
                        st["lps"].append(float(lps_np[s, j]))
                    self._push(s, st, chunk_np[s:s + 1, j:j + 1])
                    if self.slots[s] is None:
                        break




class LMEngine(_TicketEngine):
    """Incremental form of ContinuousLMServer's scheduling loop — the
    piece that makes the continuous batch ONLINE: requests may be
    submitted while the pool is mid-decode and join the running batch at
    the next admission sweep (a freed slot), exactly how production
    continuous-batching hosts work. One `step()` = one admission sweep +
    one decode dispatch (fused K-token when eligible, per-token
    otherwise). ContinuousLMServer.serve is submit-all + drain over this
    engine, so every closed-batch equality pin in test_export.py pins
    the engine's scheduling too; mid-flight admission adds no new
    numerics (per-row cache scatter + per-row absolute mask keep rows
    independent — the same argument as admit-on-free). NOT thread-safe:
    OnlineLMServer serializes access."""

    def __init__(self, server: "ContinuousLMServer",
                 default_new_tokens: int = 64):
        self.s = server
        self.default_new_tokens = int(default_new_tokens)
        b = server.n_slots
        self.slots: List[Optional[Dict[str, Any]]] = [None] * b
        self.pos = np.zeros(b, np.int32)
        self.toks = np.zeros((b, 1), np.int32)
        _, self.cache = server.prefill(jnp.zeros((b, 1), jnp.int32))
        self.pending: List[tuple] = []  # FIFO of (ticket, req, n_tokens)
        self.finished: Dict[int, Dict[str, Any]] = {}
        self._ticket = 0
        self.decode_steps = 0
        self.decode_bursts = 0  # host syncs on the fused path
        self.prefills = 0


    def _finalize(self, s: int) -> None:
        st = self.slots[s]
        assert st is not None
        resp = {
            "tokens": st["out"],
            "n_prompt": st["n_prompt"],
            "n_generated": len(st["out"]),
            "slot": s,
            "stopped_early": st["eos_hit"],
        }
        if st["lps"] is not None:
            # stop-sequence trimming shortened `out`; keep lps in step
            resp["logprobs"] = st["lps"][:len(st["out"])]
        if st.get("cancelled"):
            resp["cancelled"] = True
        self.finished[st["ticket"]] = resp
        self.slots[s] = None
        self.pos[s] = 0
        self.toks[s, 0] = 0

    def _push(self, s: int, st: Dict[str, Any],
              tok_row: np.ndarray) -> None:
        tok = int(tok_row[0, 0])
        st["out"].append(tok)
        st["remaining"] -= 1
        if st["eos"] is not None and tok == st["eos"]:
            st["eos_hit"] = True
            st["remaining"] = 0
        check_stops(st)
        if st["remaining"] <= 0:
            self._finalize(s)
        else:
            self.toks[s, 0] = tok

    def _admit(self) -> None:
        for s in range(self.s.n_slots):
            if self.slots[s] is not None or not self.pending:
                continue
            ticket, req, n_tokens = self.pending.pop(0)
            prompt = np.asarray(req["tokens"], np.int32).reshape(1, -1)
            logits, row_cache = self.s._prefill(jnp.asarray(prompt))
            self.cache = self.s.admit(self.cache, row_cache,
                                      jnp.int32(s))
            self.prefills += 1
            st = {
                "ticket": ticket,
                "n_prompt": prompt.shape[1],
                "out": [],
                "remaining": n_tokens,
                "temperature": float(req.get("temperature", 0.0)),
                "top_k": req.get("top_k"),
                "top_p": req.get("top_p"),
                "eos": req.get("eos"),
                "eos_hit": False,
                "stops": parse_stops(req, self.s.vocab),
                # per-token logprobs of the RAW model distribution
                # (rides the fused chunks when the artifacts emit
                # chosen-token logprobs; per-token fallback otherwise)
                "lps": [] if req.get("logprobs") else None,
                # the canonical per-request rng root (device_sample)
                "key": np.asarray(jax.random.PRNGKey(
                    int(req.get("seed", 0))), np.uint32),
            }
            self.slots[s] = st
            self.pos[s] = prompt.shape[1]
            tok = device_sample(
                logits[:, -1], st["key"][None],
                [prompt.shape[1] - 1], [st["temperature"]],
                [int(st["top_k"] or 0)],
                [1.0 if st["top_p"] is None else float(st["top_p"])])
            if st["lps"] is not None:
                st["lps"].append(token_logprob(np.asarray(logits[0, -1]),
                                               int(tok[0, 0])))
            self._push(s, st, tok)

    def step(self) -> None:
        """One admission sweep + (if anything is active) one decode
        dispatch. Mid-chunk finishers discard their over-decoded tail;
        the freed slot is refilled at the NEXT step's admission."""
        self._admit()
        b = self.s.n_slots
        slots, pos, toks = self.slots, self.pos, self.toks
        active = [s for s in range(b) if slots[s] is not None]
        if not active:
            return
        k = self.s.k_decode
        all_greedy = all(slots[s]["temperature"] == 0.0 for s in active)
        if (self.s.decode_k_rows is not None
                and (all_greedy or self.s.decode_k_sample is not None)
                and (self.s.fused_lps
                     or not any(slots[s]["lps"] is not None
                                for s in active))
                and all(pos[s] + k <= self.s.window for s in active)):
            # multi-step quantum: every slot advances K tokens in one
            # dispatch (argmax/sampling feedback on-device; chosen-token
            # logprobs ride along as [b,K] floats, so `logprobs: true`
            # requests keep the fused path). Falls back to per-token
            # when a slot sits too close to the window edge for a full
            # chunk of writes. Sampled slots draw the same canonical
            # stream either way (see device_sample), so the fallback
            # emits identical tokens.
            #
            # DRAIN CHAINING: when nothing is waiting to admit, every
            # active slot's budget survives the extra chunks, and the
            # window allows the writes, dispatch several chunks
            # back-to-back feeding each chunk's DEVICE token slice into
            # the next — the host pays one sync per BURST instead of
            # per chunk (jax async dispatch queues the rest). Token
            # streams are unchanged (the canonical stream is
            # chunk-boundary invariant); an unpredictable eos/stop
            # mid-burst just discards the tail like any over-decode.
            chains = self._chain_gate(active, k, self.s.window)
            keys = temp = topk = topp = None
            if not all_greedy:
                keys, temp, topk, topp = self._policy_arrays(active)

            def dispatch(tok_dev, pos_dev):
                if all_greedy:
                    chunk, lps, self.cache = self.s.decode_k_rows(
                        tok_dev, self.cache, pos_dev)
                else:
                    chunk, lps, self.cache = self.s.decode_k_sample(
                        tok_dev, self.cache, pos_dev,
                        jnp.asarray(keys), jnp.asarray(temp),
                        jnp.asarray(topk), jnp.asarray(topp))
                return chunk, lps

            self._run_burst(active, k, chains, dispatch)
            return
        logits, self.cache = self.s.decode_rows(
            jnp.asarray(toks), self.cache, jnp.asarray(pos))
        logits_dev = logits[:, -1]  # stays on device for the draw
        self.decode_steps += 1
        # one batched draw of the canonical stream: keys fold with the
        # FED position (pos before advancing), matching the in-artifact
        # scan's schedule exactly, so per-token and fused chunks emit
        # identical sampled chains
        keys = np.zeros((b, 2), np.uint32)
        temp = np.zeros(b, np.float32)
        topk = np.zeros(b, np.int32)
        topp = np.ones(b, np.float32)
        for s in active:
            st = slots[s]
            keys[s] = st["key"]
            temp[s] = st["temperature"]
            topk[s] = int(st["top_k"] or 0)
            topp[s] = float(1.0 if st["top_p"] is None else st["top_p"])
        drawn = device_sample(logits_dev, keys, pos.copy(), temp, topk,
                              topp)
        # logprob rows fetch lazily and TOGETHER — only requests that
        # asked pay the [V] transfer, and N of them pay one gather, not
        # N round-trips
        lp_rows = [s for s in active if slots[s]["lps"] is not None]
        lp_np = (np.asarray(logits_dev[jnp.asarray(lp_rows)])
                 if lp_rows else None)
        for s in active:
            st = slots[s]
            if st["lps"] is not None:
                st["lps"].append(token_logprob(
                    lp_np[lp_rows.index(s)], int(drawn[s, 0])))
            pos[s] += 1
            self._push(s, st, drawn[s:s + 1])


class SpecLMEngine(_TicketEngine):
    """Stepper form of the speculative x continuous composition — the
    same submit/has_work/step/finished surface as LMEngine, so
    OnlineLMServer drives draft/verify pools exactly like plain
    continuous pools (concurrent callers join one running speculative
    batch mid-flight). One step() = one admission sweep + one
    draft/verify round:

    - draft `extend_rows` (width 2: each row ingests the committed
      tokens its draft cache hasn't seen — at most [d_k, correction]
      after a fully-accepted round — and the logits at the row's last
      real token propose draft 1) + (k_draft-1) draft `decode_rows`
      proposing the rest;
    - ONE target `extend_rows` verifying every row's
      [last_committed, d_1..d_k] block at the row's own position;
    - accept/commit per row against the CANONICAL stream: a draft token
      is accepted iff it equals device_sample's draw on the target
      logits at that absolute position (greedy = the temperature-0
      argmax case), and the correction/bonus token IS that draw — so
      every request's output equals target-only decode under the same
      (seed, prompt), like every other scheduler.

    'stop' sequences and 'logprobs' compose (the verify pass already
    holds every committed token's target logits, so logprobs are free).
    Parked rows ride along on token 0 / position 0; `admit` replaces
    their whole cache row (target AND draft) on reuse, so the garbage
    never survives into a request. NOT thread-safe: OnlineLMServer
    serializes access."""

    def __init__(self, server: "ContinuousLMServer",
                 default_new_tokens: int = 64):
        assert server.draft is not None and server.k_draft > 0
        self.s = server
        self.default_new_tokens = int(default_new_tokens)
        b = server.n_slots
        self.slots: List[Optional[Dict[str, Any]]] = [None] * b
        _, self.cache = server.prefill(jnp.zeros((b, 1), jnp.int32))
        _, self.d_cache = server.d_prefill(jnp.zeros((b, 1), jnp.int32))
        self.pending: List[tuple] = []  # FIFO of (ticket, req, n_tokens)
        self.finished: Dict[int, Dict[str, Any]] = {}
        self._ticket = 0
        self.rounds = 0
        self.prefills = 0
        self.drafted = 0
        self.accepted = 0

    # LMEngine-compatible alias: hosts report decode dispatch counts
    @property
    def decode_steps(self) -> int:
        return self.rounds


    def _finalize(self, s: int) -> None:
        st = self.slots[s]
        assert st is not None
        resp = {
            "tokens": st["out"],
            "n_prompt": st["n_prompt"],
            "n_generated": len(st["out"]),
            "slot": s,
            "stopped_early": st["eos_hit"],
        }
        if st["lps"] is not None:
            resp["logprobs"] = st["lps"][:len(st["out"])]
        if st.get("cancelled"):
            resp["cancelled"] = True
        self.finished[st["ticket"]] = resp
        self.slots[s] = None

    def _admit(self) -> None:
        for s in range(self.s.n_slots):
            while self.slots[s] is None and self.pending:
                ticket, req, n_tokens = self.pending.pop(0)
                prompt = np.asarray(req["tokens"], np.int32).reshape(1, -1)
                logits, row_cache = self.s._prefill(jnp.asarray(prompt))
                self.cache = self.s.admit(self.cache, row_cache,
                                          jnp.int32(s))
                _, d_row = self.s.d_prefill(jnp.asarray(prompt))
                self.d_cache = self.s.d_admit(self.d_cache, d_row,
                                              jnp.int32(s))
                self.prefills += 1
                st = {
                    "ticket": ticket,
                    "n_prompt": prompt.shape[1],
                    "out": [],
                    "remaining": n_tokens,
                    "temperature": float(req.get("temperature", 0.0)),
                    "top_k": req.get("top_k"),
                    "top_p": req.get("top_p"),
                    "eos": req.get("eos"),
                    "eos_hit": False,
                    "stops": parse_stops(req, self.s.vocab),
                    "lps": [] if req.get("logprobs") else None,
                    # the canonical per-request rng root (device_sample)
                    "key": np.asarray(jax.random.PRNGKey(
                        int(req.get("seed", 0))), np.uint32),
                    # committed-token bookkeeping for the round loop
                    "n_committed": prompt.shape[1],  # absolute count
                    "last": None,                    # last committed tok
                    "lag": [],   # committed toks the draft hasn't seen
                }
                self.slots[s] = st
                tok = int(device_sample(
                    logits[:, -1], st["key"][None],
                    [prompt.shape[1] - 1], [st["temperature"]],
                    [int(st["top_k"] or 0)],
                    [1.0 if st["top_p"] is None
                     else float(st["top_p"])])[0, 0])
                if st["lps"] is not None:
                    st["lps"].append(token_logprob(
                        np.asarray(logits[0, -1]), tok))
                st["out"].append(tok)
                st["remaining"] -= 1
                st["last"] = tok
                st["n_committed"] += 1
                st["lag"] = [tok]
                if st["eos"] is not None and tok == st["eos"]:
                    st["eos_hit"] = True
                    st["remaining"] = 0
                check_stops(st)
                if st["remaining"] <= 0:
                    self._finalize(s)

    def step(self) -> None:
        """One admission sweep + (if anything is active) one
        draft/verify round."""
        self._admit()
        b, k = self.s.n_slots, self.s.k_draft
        slots = self.slots
        if not any(st is not None for st in slots):
            return

        # ---- draft phase: ingest lag + propose k tokens, batched ----
        W = 2  # max lag: [d_k, correction] after a full accept
        block_d = np.zeros((b, W), np.int32)
        pos_d = np.zeros(b, np.int32)
        for s in range(b):
            st = slots[s]
            if st is None:
                continue
            lag = st["lag"]
            assert 1 <= len(lag) <= W, lag
            padded = lag + [lag[-1]] * (W - len(lag))
            block_d[s] = padded
            pos_d[s] = st["n_committed"] - len(lag)
        d_logits, self.d_cache = self.s.d_extend_rows(
            jnp.asarray(block_d), self.d_cache, jnp.asarray(pos_d))
        d_logits_np = np.asarray(d_logits)  # [b, W, V]

        drafts = np.zeros((b, k), np.int32)

        def draw_block(logits_bmv, offset=0):
            return spec_draw_block(slots, logits_bmv, offset)

        # proposals draw the canonical key schedule on the DRAFT logits
        # (common-random-numbers coupling with the verify draws — close
        # distributions, shared threefry noise, high acceptance); one
        # batched draw per draft step
        step_tok = np.zeros((b, 1), np.int32)
        step_pos = np.zeros(b, np.int32)
        prop = np.zeros((b, 1, self.s.vocab), np.float32)
        for s in range(b):
            st = slots[s]
            if st is None:
                continue
            prop[s, 0] = d_logits_np[s, len(st["lag"]) - 1]
        di = draw_block(prop, offset=0)
        for s in range(b):
            st = slots[s]
            if st is None:
                continue
            drafts[s, 0] = di[s, 0]
            step_tok[s, 0] = di[s, 0]
            step_pos[s] = st["n_committed"]
        for i in range(1, k):
            d_logits, self.d_cache = self.s.d_decode_rows(
                jnp.asarray(step_tok), self.d_cache,
                jnp.asarray(step_pos))
            di = draw_block(np.asarray(d_logits[:, -1:]), offset=i)
            for s in range(b):
                st = slots[s]
                if st is None:
                    continue
                drafts[s, i] = di[s, 0]
                step_tok[s, 0] = di[s, 0]
                step_pos[s] = st["n_committed"] + i
        active = [s for s in range(b) if slots[s] is not None]
        self.drafted += k * len(active)

        # ---- verify phase: ONE target pass over every row's block ----
        block_t = np.zeros((b, k + 1), np.int32)
        pos_t = np.zeros(b, np.int32)
        for s in active:
            st = slots[s]
            block_t[s, 0] = st["last"]
            block_t[s, 1:] = drafts[s]
            pos_t[s] = st["n_committed"] - 1
        t_logits, self.cache = self.s.t_extend_rows(
            jnp.asarray(block_t), self.cache, jnp.asarray(pos_t))
        t_logits_np = np.asarray(t_logits)  # [b, k+1, V]
        draws = draw_block(t_logits_np)  # canonical chain, [b, k+1]
        self.rounds += 1

        # ---- accept/commit, per row, against the canonical chain:
        # accept the longest draft prefix equal to the draws; the
        # correction (or full-accept bonus) token IS the next draw — so
        # the committed chain is exactly target-only decode's ----
        for s in active:
            st = slots[s]
            j = 0
            while j < k and int(drafts[s, j]) == int(draws[s, j]):
                j += 1
            next_tok = int(draws[s, j])
            self.accepted += j
            commit = [int(d) for d in drafts[s, :j]] + [next_tok]
            # tokens d_1..d_{min(j, k-1)} are already in the draft
            # cache (proposal feeds); the rest are the next round's lag
            in_draft = min(j, k - 1)
            st["lag"] = commit[in_draft:]
            for i, tok in enumerate(commit):
                if st["lps"] is not None:
                    st["lps"].append(token_logprob(t_logits_np[s, i],
                                                   tok))
                st["out"].append(tok)
                st["remaining"] -= 1
                st["last"] = tok
                st["n_committed"] += 1
                if st["eos"] is not None and tok == st["eos"]:
                    st["eos_hit"] = True
                    st["remaining"] = 0
                check_stops(st)
                if st["remaining"] <= 0:
                    break
            if st["remaining"] <= 0:
                self._finalize(s)


class ContinuousLMServer:
    """Continuous batching over the exported per-row-position artifacts.

    A fixed pool of `n_slots` batch rows decodes in lockstep, but every
    row sits at its OWN absolute position (`decode_rows` takes pos[b]);
    when a row finishes its request — token budget spent or `eos` hit —
    the next pending request is prefilled at batch 1 and `admit` splices
    its cache into the freed row while the other rows keep decoding. No
    same-length bucketing, no convoy effect: mixed prompt lengths and
    mixed generation lengths share one device batch.

    Numerics: identical to per-request `generate_batch` — greedy AND
    sampled (per-row cache scatter + per-row absolute-position mask
    keep rows independent; sampled rows draw the canonical device
    stream, a pure function of (seed, prompt, positions); pinned by
    test_export.py).

    Speculation composes (`draft_dir` + `k_draft` > 0): every slot runs
    the draft/verify loop batched through a SpecLMEngine — the
    `extend_rows` artifact verifies each row's k-token draft block at the
    row's OWN absolute position, so rows that accept different lengths
    stay in one device batch (the de-sync that forced SpeculativeLMServer
    to batch 1). Acceptance is against the canonical stream, so greedy
    AND sampled outputs stay exactly the target-only sequences.
    """

    def __init__(self, artifacts_dir: Union[str, Path], n_slots: int = 8,
                 prefill_chunk: Optional[int] = None,
                 draft_dir: Optional[Union[str, Path]] = None,
                 k_draft: int = 0, k_decode: int = 0):
        (self.prefill, self.decode_rows, self.admit,
         self.meta) = load_exported_continuous(artifacts_dir)
        assert n_slots >= 1, n_slots
        self.n_slots = int(n_slots)
        self.k_decode = int(k_decode)
        self.decode_k_rows = None
        if self.k_decode > 0:
            # multi-step scheduling: advance every slot K tokens per
            # dispatch via the fused greedy decode_k_rows artifact
            assert k_draft == 0, \
                "k_decode (fused greedy chunks) and k_draft (speculative " \
                "draft/verify) are alternative decode loops — pick one"
            _, self.decode_k_rows, k_art = load_exported_decode_k(
                artifacts_dir)
            assert self.k_decode == k_art, (
                f"artifacts were exported with decode_chunk={k_art}, "
                f"scheduler asked for k_decode={self.k_decode}")
            try:
                # sampled rows ride the fused chunks too (policy + rng
                # on-device); absent on artifacts exported before it
                self.decode_k_sample, _ = load_exported_decode_k_sample(
                    artifacts_dir)
            except FileNotFoundError:
                self.decode_k_sample = None
        # fused chunks carry chosen-token logprobs ([b,K] extra fetch):
        # logprob requests ride them; older artifacts force the
        # per-token fallback for those rows
        self.fused_lps = bool(self.meta.get("decode_k_logprobs"))
        self.window = int(self.meta.get("max_seq", self.meta["block_size"]))
        self.vocab = int(self.meta["vocab_size"])
        self.last_stats: Dict[str, Any] = {}
        self.prefill_chunk = prefill_chunk
        if prefill_chunk is not None:
            _, self.extend, _ = load_exported_speculative(artifacts_dir)
        self.k_draft = int(k_draft)
        self.draft = None
        if draft_dir is not None and self.k_draft > 0:
            self.t_extend_rows = load_exported_extend_rows(artifacts_dir)
            (self.d_prefill, self.d_decode_rows, self.d_admit,
             self.d_meta) = load_exported_continuous(draft_dir)
            self.d_extend_rows = load_exported_extend_rows(draft_dir)
            if int(self.d_meta["vocab_size"]) != self.vocab:
                raise ValueError(
                    f"draft vocab {self.d_meta['vocab_size']} != target "
                    f"vocab {self.vocab} — speculative decoding needs a "
                    "shared token space")
            self.window = min(self.window, int(
                self.d_meta.get("max_seq", self.d_meta["block_size"])))
            self.draft = draft_dir

    def _prefill(self, prompts: jnp.ndarray):
        c = self.prefill_chunk
        if c is not None and prompts.shape[1] > c:
            return chunked_prefill(self.extend, self.meta, prompts, c)
        return self.prefill(prompts)

    def _validate(self, requests: Sequence[Dict[str, Any]],
                  default_new_tokens: int) -> None:
        for i, req in enumerate(requests):
            if "tokens" not in req:
                raise ValueError(f"request {i}: missing 'tokens'")
            t = len(req["tokens"])
            n = int(req.get("n_tokens", default_new_tokens))
            # speculative verify writes up to k_draft positions past the
            # last committed token (rejected-draft KV): beyond-window
            # writes would CLAMP in the cache scatter and overwrite
            # committed positions' KV, silently corrupting output —
            # budget the slack up front like the paged scheduler does
            slack = self.k_draft if self.draft is not None else 0
            if t + n + slack > self.window:
                raise ValueError(
                    f"request {i}: prompt {t} + {n} new tokens "
                    + (f"+ {slack} draft slack " if slack else "")
                    + f"exceeds the exported serving window {self.window}")
            toks = np.asarray(req["tokens"], np.int64)
            if toks.size and (toks.min() < 0 or toks.max() >= self.vocab):
                raise ValueError(
                    f"request {i}: token ids outside [0, {self.vocab})")
            try:
                parse_stops(req, self.vocab)
            except ValueError as exc:
                raise ValueError(f"request {i}: {exc}") from None

    def serve(self, requests: Sequence[Dict[str, Any]],
              default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        """requests: dicts with 'tokens' and optional 'n_tokens',
        'temperature', 'top_k', 'top_p', 'seed', 'eos' (early stop on this
        token id, which is KEPT in the output) and 'stop' (one or more
        multi-token stop sequences, EXCLUDED from the output — the
        OpenAI convention). Responses keep request order."""
        if self.draft is not None:
            return self._serve_speculative(requests, default_new_tokens)
        # submit() validates each request BEFORE any device work runs
        # (all submits precede the first step), so a bad request still
        # fails the whole call up front — no separate batch validation
        t_start = time.perf_counter()
        eng = LMEngine(self, default_new_tokens)
        tickets = [eng.submit(req) for req in requests]
        while eng.has_work():
            eng.step()
        dt = time.perf_counter() - t_start
        responses = [eng.finished[t] for t in tickets]
        n_generated = sum(r["n_generated"] for r in responses)
        self.last_stats = {
            "decode_steps": eng.decode_steps,
            "decode_bursts": eng.decode_bursts,
            "prefills": eng.prefills,
            "n_requests": len(requests),
            "n_slots": self.n_slots,
            "n_generated": n_generated,
            "seconds": round(dt, 4),
            "tokens_per_sec": round(n_generated / dt, 2) if dt > 0 else 0.0,
        }
        return responses

    def _serve_speculative(self, requests: Sequence[Dict[str, Any]],
                           default_new_tokens: int) -> List[Dict[str, Any]]:
        """Closed-batch speculation: submit-all + drain over a
        SpecLMEngine (the stepper that OnlineLMServer also drives for
        open-world speculative pools) — per-slot draft/verify rounds in
        one shared device batch, outputs equal to target-only decode
        per request (the canonical stream; see SpecLMEngine)."""
        t_start = time.perf_counter()
        eng = SpecLMEngine(self, default_new_tokens)
        tickets = [eng.submit(req) for req in requests]
        while eng.has_work():
            eng.step()
        dt = time.perf_counter() - t_start
        responses = [eng.finished[t] for t in tickets]
        n_generated = sum(r["n_generated"] for r in responses)
        self.last_stats = {
            "rounds": eng.rounds,
            "prefills": eng.prefills,
            "drafted": eng.drafted,
            "accepted": eng.accepted,
            "target_passes": eng.rounds + eng.prefills,
            "n_requests": len(requests),
            "n_slots": self.n_slots,
            "k_draft": self.k_draft,
            "n_generated": n_generated,
            "accept_rate": (round(eng.accepted / eng.drafted, 4)
                            if eng.drafted else None),
            "seconds": round(dt, 4),
            "tokens_per_sec": round(n_generated / dt, 2) if dt > 0 else 0.0,
        }
        return responses

    def serve_requests(self, requests: Sequence[Dict[str, Any]],
                       default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        """Scheduler-agnostic alias: hosts call either name."""
        return self.serve(requests, default_new_tokens)


class SpeculativeLMServer:
    """Speculative decoding over two exported artifact sets: a small
    DRAFT model proposes `k_draft` tokens autoregressively (its prefill +
    decode_step artifacts), then the TARGET model verifies the whole
    block in ONE `extend` call (k+1 positions scored into its live
    cache). Per committed token the target runs ~1/(j+1) passes, where j
    is the per-round accepted count — the latency lever the big model's
    sequential decode cannot reach alone.

    Numerics: acceptance is "draft token == the CANONICAL-STREAM draw on
    the target logits" (device_sample's fold_in(key, absolute position)
    schedule; greedy is the temperature-0 case, where the draw is the
    argmax) and rejection emits that canonical draw itself — so the
    output is EXACTLY the chain target-only decode emits under the same
    (seed, prompt) on EVERY scheduler (pinned by test_export.py).
    Speculation is a transparent accelerator: marginal correctness is
    inherited from the canonical stream (one exact policy draw per
    position), and the draft proposes through the SAME key schedule, so
    shared threefry noise couples the draws (common random numbers) and
    close draft/target distributions accept at high rates. (Classical
    Leviathan rejection sampling — `speculative_accept`, analytically
    pinned by test_speculative_accept_math — is kept as the reference
    for the distribution-only guarantee this design strengthens into
    stream equality.)

    Cache discipline: each round the target writes KV for
    [last, d_1..d_k] at absolute positions n..n+k. After accepting j < k
    drafts, positions n+j+1.. hold stale draft KV — harmless: the
    absolute-position causal mask (kv_idx <= query pos) hides them from
    every later query until the next round's extend (which starts at
    exactly the first stale position) overwrites them. The same argument
    covers the draft cache, so rollback costs zero device work.

    Decoding is per-request (batch 1): speculation is a LATENCY lever —
    rows accept different lengths and would de-sync a shared batch after
    one round. Throughput batching belongs to ContinuousLMServer.
    """

    def __init__(self, target_dir: Union[str, Path],
                 draft_dir: Union[str, Path], k_draft: int = 4,
                 prefill_chunk: Optional[int] = None):
        (self.t_prefill, self.t_extend,
         self.meta) = load_exported_speculative(target_dir)
        self.d_prefill, self.d_decode, self.d_meta = load_exported_lm(
            draft_dir)
        # chunked prefill for the TARGET prompt (its window score memory
        # dominates); the draft, being the small model, prefills in one
        # shot
        self.prefill_chunk = prefill_chunk
        if int(self.d_meta["vocab_size"]) != int(self.meta["vocab_size"]):
            raise ValueError(
                f"draft vocab {self.d_meta['vocab_size']} != target vocab "
                f"{self.meta['vocab_size']} — speculative decoding needs a "
                "shared token space")
        assert k_draft >= 1, k_draft
        self.k_draft = int(k_draft)
        self.window = min(
            int(self.meta.get("max_seq", self.meta["block_size"])),
            int(self.d_meta.get("max_seq", self.d_meta["block_size"])))
        self.vocab = int(self.meta["vocab_size"])
        self.last_stats: Dict[str, Any] = {}

    def _draw(self, logits: np.ndarray, key: np.ndarray, pos0: int,
              temperature: float, top_k: Optional[int],
              top_p: Optional[float]) -> np.ndarray:
        """Canonical-stream draws for a contiguous block: logits [m, V]
        at absolute fed-positions pos0..pos0+m-1 -> [m] tokens. Greedy
        (temperature 0) short-circuits to the host argmax (identical
        tie-break to the device argmax: first max index)."""
        logits = np.asarray(logits, np.float32).reshape(-1, self.vocab)
        m = logits.shape[0]
        if temperature <= 0.0:
            return np.argmax(logits, axis=-1)
        drawn = device_sample(
            logits, np.tile(np.asarray(key, np.uint32)[None], (m, 1)),
            pos0 + np.arange(m), np.full(m, temperature, np.float32),
            np.full(m, int(top_k or 0), np.int32),
            np.full(m, 1.0 if top_p is None else float(top_p),
                    np.float32))
        return drawn[:, 0]

    def _generate(self, prompt: Sequence[int], n_tokens: int,
                  temperature: float, top_k: Optional[int],
                  key: np.ndarray,
                  top_p: Optional[float] = None,
                  eos: Optional[int] = None,
                  stops: Sequence[tuple] = (),
                  want_lps: bool = False) -> tuple:
        t = len(prompt)
        prompt_arr = jnp.asarray(np.asarray(prompt, np.int32).reshape(1, -1))
        c = self.prefill_chunk
        if c is not None and t > c:
            tg_logits, tg_cache = chunked_prefill(
                self.t_extend, self.meta, prompt_arr, c)
        else:
            tg_logits, tg_cache = self.t_prefill(prompt_arr)
        dr_logits, dr_cache = self.d_prefill(prompt_arr)
        first = self._draw(np.asarray(tg_logits[:, -1]), key, t - 1,
                           temperature, top_k, top_p)
        all_toks = list(map(int, prompt)) + [int(first[0])]
        # eos/stop/logprobs bookkeeping shares the slot-scheduler
        # helpers: `st` mirrors the engines' slot dict shape
        st = {"out": [int(first[0])], "remaining": n_tokens - 1,
              "eos_hit": False, "stops": list(stops)}
        lps = ([token_logprob(np.asarray(tg_logits[0, -1]),
                              int(first[0]))] if want_lps else None)
        if eos is not None and int(first[0]) == eos:
            st["eos_hit"] = True
            st["remaining"] = 0
        check_stops(st)
        out = st["out"]
        dr_done = t  # draft cache is correct through position dr_done-1
        rounds = drafted = accepted = 0

        while st["remaining"] > 0:
            n_committed = len(all_toks)  # target cache correct to n-2
            k = min(self.k_draft, st["remaining"])

            # draft phase: sync the draft cache (committed tokens it has
            # not seen — the round's correction token, plus d_k after a
            # fully accepted round), then propose k tokens. Proposals
            # draw the SAME canonical key schedule on the DRAFT's
            # logits: when draft and target distributions are close, the
            # shared threefry noise makes the draws coincide (common-
            # random-numbers coupling), which is what gets accepted.
            for pos in range(dr_done, n_committed):
                dr_logits, dr_cache = self.d_decode(
                    jnp.asarray([[all_toks[pos]]], jnp.int32), dr_cache,
                    jnp.int32(pos))
            dr_done = n_committed
            drafts: List[int] = []
            for i in range(k):
                row = np.asarray(dr_logits[:, -1]).reshape(1, -1)
                d = int(self._draw(row, key, n_committed - 1 + i,
                                   temperature, top_k, top_p)[0])
                drafts.append(d)
                if i < k - 1:
                    dr_logits, dr_cache = self.d_decode(
                        jnp.asarray([[d]], jnp.int32), dr_cache,
                        jnp.int32(dr_done + i))
            drafted += k

            # verify phase: ONE target pass over [last, d_1..d_k], then
            # the canonical draws for all k+1 positions in one batch.
            # Acceptance = "draft token EQUALS the canonical draw", so
            # the committed chain is EXACTLY the chain target-only
            # decode would emit under the same (seed, prompt) — the
            # cross-scheduler stream invariant extends to speculation
            # (greedy is the temperature-0 special case: draw = argmax).
            block = np.asarray([[all_toks[n_committed - 1]] + drafts],
                               np.int32)
            tg_logits, tg_cache = self.t_extend(
                jnp.asarray(block), tg_cache, jnp.int32(n_committed - 1))
            logits_np = np.asarray(tg_logits[0])  # [k+1, V]
            draws = self._draw(logits_np, key, n_committed - 1,
                               temperature, top_k, top_p)

            j = 0
            while j < k and drafts[j] == int(draws[j]):
                j += 1
            # j == k: full acceptance — draws[k] is the free bonus token
            next_tok = int(draws[j])
            accepted += j
            commit = drafts[:j] + [next_tok]
            for i, tok in enumerate(commit):
                if lps is not None:
                    lps.append(token_logprob(logits_np[i], tok))
                st["out"].append(tok)
                st["remaining"] -= 1
                all_toks.append(tok)
                if eos is not None and tok == eos:
                    st["eos_hit"] = True
                    st["remaining"] = 0
                check_stops(st)
                if st["remaining"] <= 0:
                    break
            # drafts beyond d_{k-1} were never fed to the draft cache
            dr_done = n_committed + min(j, k - 1)
            rounds += 1

        stats = {"rounds": rounds, "drafted": drafted, "accepted": accepted,
                 "target_passes": rounds + 1}
        return (out[:n_tokens], stats, st["eos_hit"],
                None if lps is None else lps[:len(out)])

    def serve_requests(self, requests: Sequence[Dict[str, Any]],
                       default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        """requests: dicts with 'tokens' and optional 'n_tokens',
        'temperature', 'top_k', 'top_p', 'seed', 'eos' (kept), 'stop'
        (multi-token sequences, excluded) and 'logprobs' (the verify
        pass already holds every committed token's target logits, so
        they are free). Served one request at a time (speculation
        de-syncs a shared batch — the batched form is
        ContinuousLMServer(draft_dir=...)); responses in order."""
        responses: List[Dict[str, Any]] = []
        totals = {"rounds": 0, "drafted": 0, "accepted": 0,
                  "target_passes": 0, "n_generated": 0}
        t_start = time.perf_counter()
        for i, req in enumerate(requests):
            if "tokens" not in req:
                raise ValueError(f"request {i}: missing 'tokens'")
            toks = np.asarray(req["tokens"], np.int64)
            n = int(req.get("n_tokens", default_new_tokens))
            # no k_draft slack needed HERE: the batch-1 round loop
            # shrinks its draft depth to min(k_draft, remaining), so the
            # verify block never writes past t+n-1 (the batched engines
            # share one fixed-width block and must budget the slack)
            if len(req["tokens"]) + n > self.window:
                raise ValueError(
                    f"request {i}: prompt {len(req['tokens'])} + {n} new "
                    f"tokens exceeds the serving window {self.window} "
                    "(min of target and draft windows)")
            if toks.size and (toks.min() < 0 or toks.max() >= self.vocab):
                raise ValueError(
                    f"request {i}: token ids outside [0, {self.vocab})")
            try:
                stops = parse_stops(req, self.vocab)
            except ValueError as exc:
                raise ValueError(f"request {i}: {exc}") from None
            if n <= 0:
                responses.append({"tokens": [], "n_prompt": len(req["tokens"]),
                                  "n_generated": 0, "rounds": 0,
                                  "stopped_early": False,
                                  "accept_rate": None})
                continue
            key = np.asarray(jax.random.PRNGKey(int(req.get("seed", 0))),
                             np.uint32)
            out, stats, eos_hit, lps = self._generate(
                req["tokens"], n, float(req.get("temperature", 0.0)),
                req.get("top_k"), key, top_p=req.get("top_p"),
                eos=req.get("eos"), stops=stops,
                want_lps=bool(req.get("logprobs")))
            resp = {
                "tokens": out,
                "n_prompt": len(req["tokens"]),
                "n_generated": len(out),
                "rounds": stats["rounds"],
                "stopped_early": eos_hit,
                "accept_rate": (round(stats["accepted"] / stats["drafted"], 4)
                                if stats["drafted"] else None),
            }
            if lps is not None:
                resp["logprobs"] = lps
            responses.append(resp)
            for key in totals:
                if key != "n_generated":
                    totals[key] += stats[key]
            totals["n_generated"] += len(out)
        dt = time.perf_counter() - t_start
        self.last_stats = {
            **totals,
            "n_requests": len(requests),
            "k_draft": self.k_draft,
            "tokens_per_target_pass": (
                round(totals["n_generated"] / totals["target_passes"], 3)
                if totals["target_passes"] else None),
            "seconds": round(dt, 4),
        }
        return responses

    def serve(self, requests: Sequence[Dict[str, Any]],
              default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        """Scheduler-agnostic alias: hosts call either name."""
        return self.serve_requests(requests, default_new_tokens)


class OnlineLMServer:
    """ONLINE continuous batching: a thread-safe front over one shared
    LMEngine. Callers submit requests from any thread at any time; a
    single scheduler thread drives the engine, so requests from
    different callers JOIN ONE RUNNING DEVICE BATCH mid-flight (a freed
    slot admits the next queued request between decode dispatches) —
    the open-world form of ContinuousLMServer, whose serve() is the
    closed-batch special case of the same engine. Numerics are
    identical per request (rows are independent; pinned in
    test_export.py against solo decodes).

    `generate(req)` blocks until that request finishes; `submit` +
    `result` split the two for callers managing their own concurrency.
    The engine is NOT internally concurrent — the condition lock
    serializes engine access, and each decode dispatch runs under it
    (device dispatches are ms-scale; the lock is not the bottleneck,
    the device is). `default_new_tokens` is fixed at construction: it
    participates in validation, which must be stable across callers.
    """

    def __init__(self, artifacts_dir: Union[str, Path], n_slots: int = 8,
                 prefill_chunk: Optional[int] = None, k_decode: int = 0,
                 draft_dir: Optional[Union[str, Path]] = None,
                 k_draft: int = 0, default_new_tokens: int = 64,
                 scheduler: str = "continuous", n_pages: int = 0):
        if scheduler == "paged":
            # the PAGED pool goes online too: PagedLMEngine exposes the
            # same stepper surface, so concurrent callers share one
            # running paged batch (preemption, prefix sharing,
            # speculation and fused chunks included)
            from tempo_tpu.infer.paged import PagedLMEngine, PagedLMServer

            self._server = PagedLMServer(
                artifacts_dir, n_slots=n_slots, n_pages=n_pages,
                k_decode=k_decode, draft_dir=draft_dir, k_draft=k_draft,
                prefill_chunk=prefill_chunk)
            engine_cls = PagedLMEngine
        else:
            assert scheduler == "continuous", scheduler
            self._server = ContinuousLMServer(artifacts_dir,
                                              n_slots=n_slots,
                                              prefill_chunk=prefill_chunk,
                                              k_decode=k_decode,
                                              draft_dir=draft_dir,
                                              k_draft=k_draft)
            # speculation composes with the online front: the
            # draft/verify stepper exposes the same engine surface
            engine_cls = (SpecLMEngine if self._server.draft is not None
                          else LMEngine)
        self.meta = self._server.meta
        self.vocab = self._server.vocab
        self.window = self._server.window
        self._engine = engine_cls(self._server, default_new_tokens)
        self._cond = threading.Condition()
        self._closing = False
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="lm-engine")
        self._thread.start()

    def _run(self) -> None:
        while True:
            with self._cond:
                while not self._engine.has_work() and not self._closing:
                    self._cond.wait()
                if self._closing and not self._engine.has_work():
                    return
                try:
                    self._engine.step()
                except BaseException as exc:  # noqa: BLE001 — a dead
                    # scheduler thread would otherwise hang every
                    # result() caller forever and keep accepting
                    # submits that can never run
                    self._error = exc
                    self._closing = True
                    self._cond.notify_all()
                    return
                self._cond.notify_all()

    def submit(self, req: Dict[str, Any]) -> int:
        """Enqueue (validating) and wake the scheduler; returns a
        ticket for `result`. Raises if the server is closing."""
        with self._cond:
            if self._error is not None:
                raise RuntimeError(
                    "server scheduler died") from self._error
            if self._closing:
                raise RuntimeError("server is closed")
            ticket = self._engine.submit(req)
            self._cond.notify_all()
            return ticket

    def cancel(self, ticket: int) -> bool:
        """Cancel a submitted request (thread-safe): pending requests
        never run, active ones finalize with the tokens generated so
        far; the ticket's response then carries `cancelled: true` and
        any blocked result() caller returns it immediately. Returns
        False if the ticket already finished (response untouched)."""
        with self._cond:
            ok = self._engine.cancel(ticket)
            self._cond.notify_all()
            return ok

    def result(self, ticket: int,
               timeout: Optional[float] = None) -> Dict[str, Any]:
        """Block until the ticket finishes; pops and returns its
        response. Raises (instead of hanging) if the scheduler thread
        died before finishing the ticket."""
        with self._cond:
            ok = self._cond.wait_for(
                lambda: ticket in self._engine.finished
                or self._error is not None, timeout=timeout)
            if not ok:
                raise TimeoutError(f"ticket {ticket} not finished "
                                   f"within {timeout}s")
            if ticket not in self._engine.finished:
                raise RuntimeError(
                    f"server scheduler died before ticket {ticket} "
                    "finished") from self._error
            return self._engine.finished.pop(ticket)

    def generate(self, req: Dict[str, Any],
                 timeout: Optional[float] = None) -> Dict[str, Any]:
        return self.result(self.submit(req), timeout=timeout)

    def serve_requests(self, requests: Sequence[Dict[str, Any]],
                       default_new_tokens: int = 64
                       ) -> List[Dict[str, Any]]:
        """Batch-mode compatibility (submit all, collect in order).
        NOTE: the construction-time default_new_tokens governs
        validation and budgets, not this argument."""
        tickets = [self.submit(r) for r in requests]
        return [self.result(t) for t in tickets]

    serve = serve_requests

    def stats(self) -> Dict[str, Any]:
        with self._cond:
            e = self._engine
            return {
                "decode_steps": e.decode_steps,
                "prefills": e.prefills,
                "pending": len(e.pending),
                "active": sum(st is not None for st in e.slots),
                "n_slots": self._server.n_slots,
            }

    # hosts read .last_stats generically; the online server's stats are
    # cumulative, not per-call
    @property
    def last_stats(self) -> Dict[str, Any]:
        return self.stats()

    def close(self) -> None:
        """Drain remaining work, then stop the scheduler thread."""
        with self._cond:
            self._closing = True
            self._cond.notify_all()
        self._thread.join()

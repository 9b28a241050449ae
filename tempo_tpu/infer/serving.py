"""Serving runtime over exported LM artifacts (infer/export_lm.py).

The exported pair — `prefill(tokens[b,t])` and
`decode_step(tok[b,1], cache, pos)` — fixes the device-side compute; this
module is the host-side serving policy around it: sampling (greedy /
temperature / top-k), request batching, and the serving window guard.
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

import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from tempo_tpu.infer.export_lm import (load_exported_continuous,
                                        load_exported_lm)


def sample_next(logits_last: np.ndarray, temperature: float,
                top_k: Optional[int], rng: np.random.Generator) -> np.ndarray:
    """Host-side sampling policy on the last-position logits [b, V] ->
    next token [b, 1]. temperature 0 = greedy; top_k limits the support."""
    logits = np.asarray(logits_last, np.float32)
    if temperature <= 0.0:
        return np.argmax(logits, axis=-1, keepdims=True)
    logits = logits / float(temperature)
    if top_k is not None and 0 < top_k < logits.shape[-1]:
        kth = np.partition(logits, -top_k, axis=-1)[:, -top_k][:, None]
        logits = np.where(logits < kth, -np.inf, logits)
    logits -= logits.max(axis=-1, keepdims=True)
    probs = np.exp(logits)
    probs /= probs.sum(axis=-1, keepdims=True)
    out = np.empty((logits.shape[0], 1), np.int64)
    for i in range(logits.shape[0]):
        out[i, 0] = rng.choice(logits.shape[-1], p=probs[i])
    return out


class LMServer:
    """Loads the exported artifacts once; serves batched generate calls."""

    def __init__(self, artifacts_dir: Union[str, Path]):
        self.prefill, self.decode_step, self.meta = load_exported_lm(
            artifacts_dir)
        self.window = int(self.meta.get("max_seq", self.meta["block_size"]))
        self.vocab = int(self.meta["vocab_size"])

    def generate_batch(self, prompts: np.ndarray, max_new_tokens: int,
                       temperature: float = 0.0,
                       top_k: Optional[int] = None,
                       seed: int = 0) -> np.ndarray:
        """prompts: int array [b, t] (same length per row — the artifact
        shares one position counter). Returns [b, max_new_tokens]."""
        prompts = np.asarray(prompts, np.int32)
        assert prompts.ndim == 2, prompts.shape
        b, t = prompts.shape
        if max_new_tokens <= 0:
            return np.zeros((b, 0), np.int32)
        if t + max_new_tokens > self.window:
            raise ValueError(
                f"prompt {t} + {max_new_tokens} new tokens exceeds the "
                f"exported serving window {self.window}")
        if prompts.size and (prompts.min() < 0 or prompts.max() >= self.vocab):
            raise ValueError(f"token ids outside [0, {self.vocab})")
        rng = np.random.default_rng(seed)
        logits, cache = self.prefill(jnp.asarray(prompts))
        tok = sample_next(np.asarray(logits[:, -1]), temperature, top_k, rng)
        out = [tok]
        pos = jnp.int32(t)
        for _ in range(max_new_tokens - 1):
            logits, cache = self.decode_step(
                jnp.asarray(tok, jnp.int32), cache, pos)
            tok = sample_next(np.asarray(logits[:, -1]), temperature,
                              top_k, rng)
            out.append(tok)
            pos = pos + 1
        return np.concatenate(out, axis=1).astype(np.int32)

    def serve_requests(self, requests: Sequence[Dict[str, Any]],
                       default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        """requests: dicts with 'tokens' (list[int]) and optional
        'n_tokens', 'temperature', 'top_k', 'seed'. Buckets by (prompt
        length, sampling params) so each bucket is one batched
        prefill+decode chain; responses keep request order."""
        buckets: Dict[tuple, List[int]] = {}
        for i, req in enumerate(requests):
            if "tokens" not in req:
                raise ValueError(f"request {i}: missing 'tokens'")
            key = (len(req["tokens"]),
                   int(req.get("n_tokens", default_new_tokens)),
                   float(req.get("temperature", 0.0)),
                   req.get("top_k"), int(req.get("seed", 0)))
            buckets.setdefault(key, []).append(i)

        responses: List[Optional[Dict[str, Any]]] = [None] * len(requests)
        for (t, n_tokens, temperature, top_k, seed), idxs in buckets.items():
            prompts = np.asarray([requests[i]["tokens"] for i in idxs],
                                 np.int32).reshape(len(idxs), t)
            t0 = time.perf_counter()
            toks = self.generate_batch(prompts, n_tokens,
                                       temperature=temperature,
                                       top_k=top_k, seed=seed)
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
        assert all(r is not None for r in responses)
        return responses  # type: ignore[return-value]

    def serve(self, requests: Sequence[Dict[str, Any]],
              default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        """Scheduler-agnostic alias: hosts call serve() on either server."""
        return self.serve_requests(requests, default_new_tokens)


class ContinuousLMServer:
    """Continuous batching over the exported per-row-position artifacts.

    A fixed pool of `n_slots` batch rows decodes in lockstep, but every
    row sits at its OWN absolute position (`decode_rows` takes pos[b]);
    when a row finishes its request — token budget spent or `eos` hit —
    the next pending request is prefilled at batch 1 and `admit` splices
    its cache into the freed row while the other rows keep decoding. No
    same-length bucketing, no convoy effect: mixed prompt lengths and
    mixed generation lengths share one device batch.

    Numerics: identical to per-request `generate_batch` for greedy
    decoding (per-row cache scatter + per-row absolute-position mask keep
    rows independent; pinned by test_export.py). Sampled requests get a
    per-request numpy Generator seeded by their own `seed`.
    """

    def __init__(self, artifacts_dir: Union[str, Path], n_slots: int = 8):
        (self.prefill, self.decode_rows, self.admit,
         self.meta) = load_exported_continuous(artifacts_dir)
        assert n_slots >= 1, n_slots
        self.n_slots = int(n_slots)
        self.window = int(self.meta.get("max_seq", self.meta["block_size"]))
        self.vocab = int(self.meta["vocab_size"])
        self.last_stats: Dict[str, Any] = {}

    def _validate(self, requests: Sequence[Dict[str, Any]],
                  default_new_tokens: int) -> None:
        for i, req in enumerate(requests):
            if "tokens" not in req:
                raise ValueError(f"request {i}: missing 'tokens'")
            t = len(req["tokens"])
            n = int(req.get("n_tokens", default_new_tokens))
            if t + n > self.window:
                raise ValueError(
                    f"request {i}: prompt {t} + {n} new tokens exceeds the "
                    f"exported serving window {self.window}")
            toks = np.asarray(req["tokens"], np.int64)
            if toks.size and (toks.min() < 0 or toks.max() >= self.vocab):
                raise ValueError(
                    f"request {i}: token ids outside [0, {self.vocab})")

    def serve(self, requests: Sequence[Dict[str, Any]],
              default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        """requests: dicts with 'tokens' and optional 'n_tokens',
        'temperature', 'top_k', 'seed', 'eos' (early stop on this token
        id, which is kept in the output). Responses keep request order."""
        self._validate(requests, default_new_tokens)
        n_req = len(requests)
        responses: List[Optional[Dict[str, Any]]] = [None] * n_req
        pending = list(range(n_req))[::-1]  # pop() preserves arrival order
        b = self.n_slots

        # a parked row is dead weight: it decodes token 0 at position 0
        # every step and `admit` replaces its whole cache row on reuse
        slots: List[Optional[Dict[str, Any]]] = [None] * b
        pos = np.zeros(b, np.int32)
        toks = np.zeros((b, 1), np.int32)
        _, cache = self.prefill(jnp.zeros((b, 1), jnp.int32))

        t_start = time.perf_counter()
        decode_steps = 0
        prefills = 0

        def finalize(s: int) -> None:
            st = slots[s]
            assert st is not None
            responses[st["req"]] = {
                "tokens": st["out"],
                "n_prompt": st["n_prompt"],
                "n_generated": len(st["out"]),
                "slot": s,
                "stopped_early": st["eos_hit"],
            }
            slots[s] = None
            pos[s] = 0
            toks[s, 0] = 0

        def push(s: int, st: Dict[str, Any], tok_row: np.ndarray) -> None:
            tok = int(tok_row[0, 0])
            st["out"].append(tok)
            st["remaining"] -= 1
            if st["eos"] is not None and tok == st["eos"]:
                st["eos_hit"] = True
                st["remaining"] = 0
            if st["remaining"] <= 0:
                finalize(s)
            else:
                toks[s, 0] = tok

        while pending or any(st is not None for st in slots):
            for s in range(b):
                while slots[s] is None and pending:
                    i = pending.pop()
                    req = requests[i]
                    n_tokens = int(req.get("n_tokens", default_new_tokens))
                    if n_tokens <= 0:
                        responses[i] = {"tokens": [], "n_prompt":
                                        len(req["tokens"]), "n_generated": 0,
                                        "slot": s, "stopped_early": False}
                        continue
                    prompt = np.asarray(req["tokens"],
                                        np.int32).reshape(1, -1)
                    logits, row_cache = self.prefill(jnp.asarray(prompt))
                    cache = self.admit(cache, row_cache, jnp.int32(s))
                    prefills += 1
                    st = {
                        "req": i,
                        "n_prompt": prompt.shape[1],
                        "out": [],
                        "remaining": n_tokens,
                        "temperature": float(req.get("temperature", 0.0)),
                        "top_k": req.get("top_k"),
                        "eos": req.get("eos"),
                        "eos_hit": False,
                        "rng": np.random.default_rng(
                            int(req.get("seed", 0))),
                    }
                    slots[s] = st
                    pos[s] = prompt.shape[1]
                    tok = sample_next(np.asarray(logits[:, -1]),
                                      st["temperature"], st["top_k"],
                                      st["rng"])
                    push(s, st, tok)

            if not any(st is not None for st in slots):
                break
            logits, cache = self.decode_rows(
                jnp.asarray(toks), cache, jnp.asarray(pos))
            logits_np = np.asarray(logits[:, -1])
            decode_steps += 1
            for s in range(b):
                st = slots[s]
                if st is None:
                    continue
                tok = sample_next(logits_np[s:s + 1], st["temperature"],
                                  st["top_k"], st["rng"])
                pos[s] += 1
                push(s, st, tok)

        dt = time.perf_counter() - t_start
        n_generated = sum(r["n_generated"] for r in responses
                          if r is not None)
        self.last_stats = {
            "decode_steps": decode_steps,
            "prefills": prefills,
            "n_requests": n_req,
            "n_slots": b,
            "n_generated": n_generated,
            "seconds": round(dt, 4),
            "tokens_per_sec": round(n_generated / dt, 2) if dt > 0 else 0.0,
        }
        assert all(r is not None for r in responses)
        return responses  # type: ignore[return-value]

    def serve_requests(self, requests: Sequence[Dict[str, Any]],
                       default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        """Scheduler-agnostic alias: hosts call either name."""
        return self.serve(requests, default_new_tokens)

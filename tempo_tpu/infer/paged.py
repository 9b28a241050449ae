"""Paged-KV-cache serving: page allocator + slot scheduler (vLLM-style).

The dense continuous server (serving.py) reserves n_slots x window cache
slots up front, so HBM capacity caps the slot count at
n_slots = cache_bytes / (window * per_token_bytes) even when typical
requests fill a fraction of the window. The paged stack breaks that
coupling:

- the device holds per-layer POOLS [n_pages, page, kv, hd] plus a block
  table [n_slots, window/page] (exported with a SYMBOLIC pool size:
  capacity is a load-time choice, infer/export_lm.py `page_size`);
- `PagePool` (host) hands pages to rows on demand — a row holds
  ceil(len/page) pages, not window/page — so the slot count
  oversubscribes physical cache memory;
- `PagedLMServer` schedules like ContinuousLMServer (per-row positions,
  admit-on-free) and PREEMPTS when the pool runs dry: the most recently
  admitted slot is evicted, its pages freed, and its request requeued at
  the front. Re-admission replays the request from its prompt — greedy
  trivially, and sampled requests too, because every scheduler draws the
  canonical device stream (serving.device_sample: per-request threefry
  key folded with the absolute position — a pure function of
  (seed, prompt, positions)). Per-request outputs are therefore EXACTLY
  the dense continuous server's on any workload, preemption or not
  (pinned in test_paged.py).

Decode compute: the model's paged branch (nn/transformer.py) — one flat
scatter through the table + gathered-window attention on the XLA path,
or the paged active-length Pallas kernel (ops/pallas_decode.py
paged_decode_attention) that DMAs only a row's live pages straight from
the pool.

No reference counterpart (the reference re-runs eager torch per token,
networks.py:727-754); this is the memory rung of the serving ladder
after cache dtype, request-sized buffers, int8 weights, active-length
reads, and fused multi-token dispatch (docs/DESIGN.md).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from tempo_tpu.infer.export_lm import (load_exported_continuous,
                                        load_exported_extend_paged,
                                        load_exported_extend_rows,
                                        load_exported_paged,
                                        load_exported_paged_k)
from tempo_tpu.infer.serving import (check_stops, device_sample,
                                      parse_stops, spec_draw_block,
                                      token_logprob)

TRASH_PAGE = 0


def _pages_for(n_tokens: int, page: int) -> int:
    """ceil(n_tokens / page). NOTE: `-a // -b` is floor, not ceil —
    that exact slip once sent admission prompts to the trash page
    (caught by the sampled-equality pins in test_paged.py)."""
    return -(-n_tokens // page)


class PagePool:
    """Refcounting free-list page allocator. Page 0 is the TRASH page:
    never handed out, it absorbs the scatter/gather traffic of parked
    batch rows and of table slots past a row's allocation (the
    absolute-position mask hides whatever lives there). Refcounts exist
    for PREFIX SHARING: page-aligned shared-prefix pages sit in many
    rows' tables at once (read-only — decode never writes below its own
    position), and return to the free list only when the last holder
    lets go."""

    def __init__(self, n_pages: int):
        assert n_pages >= 2, f"need >= 2 pages (1 is trash), got {n_pages}"
        self.n_pages = int(n_pages)
        # LIFO keeps recently-freed pages hot; ids 1..n_pages-1
        self._free = list(range(1, self.n_pages))
        self._rc: Dict[int, int] = {}

    @property
    def n_usable(self) -> int:
        return self.n_pages - 1

    @property
    def n_free(self) -> int:
        return len(self._free)

    def alloc(self) -> Optional[int]:
        if not self._free:
            return None
        p = self._free.pop()
        self._rc[p] = 1
        return p

    def share(self, pages: Sequence[int]) -> None:
        for p in pages:
            assert p in self._rc, f"sharing unheld page {p}"
            self._rc[p] += 1

    def free(self, pages: Sequence[int]) -> None:
        for p in pages:
            assert p != TRASH_PAGE, "freeing the trash page"
            assert p in self._rc, f"double free of page {p}"
            self._rc[p] -= 1
            if self._rc[p] == 0:
                del self._rc[p]
                self._free.append(p)


class PagedLMServer:
    """Continuous batching over a paged KV cache with preemption.

    `n_pages` sizes the physical pool (usable pages = n_pages - 1); a
    request of total length L holds ceil(L/page_size) pages, so slots
    oversubscribe whenever n_slots * window/page_size > n_pages - 1.
    Scheduling follows ContinuousLMServer (admit into free slots, per-row
    decode positions, host sampling policy); when a slot's next write
    needs a page and the pool is dry, the most recently admitted OTHER
    slot is preempted (pages freed, request requeued front). Outputs are
    per-request identical to the dense continuous server.

    The other serving rungs COMPOSE here (every pairing pinned in
    test_paged.py):
    - `k_decode` — fused K-token dispatch over pages (pre-reserved
      writes);
    - `prefill_chunk` — long prompts ingest straight into the row's
      pages through extend_paged in fixed chunks (bounded score
      memory, no dense row cache);
    - `draft_dir` + `k_draft` — speculation: a dense-cache draft model
      proposes per-slot k-token blocks, the paged target verifies them
      in one extend_paged at per-row positions; acceptance is against
      the canonical stream (serving.spec_draw_block), so outputs stay
      identical to every other scheduler, preemption included."""

    def __init__(self, artifacts_dir: Optional[Union[str, Path]] = None,
                 n_slots: int = 8,
                 n_pages: int = 0, k_decode: int = 0,
                 draft_dir: Optional[Union[str, Path]] = None,
                 k_draft: int = 0, prefill_chunk: Optional[int] = None,
                 surface: Optional[Dict[str, Any]] = None):
        if surface is not None:
            # a LIVE function surface (export_lm.live_paged_surface):
            # same contract as the deserialized artifacts, weights
            # passed as a jit argument — checkpoint-direct serving and
            # relay-safe benching
            self.prefill = surface["prefill"]
            self.decode_paged = surface["decode_paged"]
            self.admit_paged = surface["admit_paged"]
            self.meta = surface["meta"]
        else:
            assert artifacts_dir is not None, \
                "need artifacts_dir or surface"
            (self.prefill, self.decode_paged, self.admit_paged,
             self.meta) = load_exported_paged(artifacts_dir)
        assert n_slots >= 1, n_slots
        self.n_slots = int(n_slots)
        self.k_decode = int(k_decode)
        self.decode_paged_k = self.decode_paged_k_sample = None
        if self.k_decode > 0:
            # fused K-token dispatch over the paged cache (greedy +
            # on-device sampled policy) — the two levers compose
            if surface is not None:
                self.decode_paged_k = surface["decode_paged_k"]
                self.decode_paged_k_sample = surface[
                    "decode_paged_k_sample"]
                k_art = int(self.meta["decode_chunk"])
            else:
                (self.decode_paged_k, self.decode_paged_k_sample,
                 k_art) = load_exported_paged_k(artifacts_dir)
            assert self.k_decode == k_art, (
                f"artifacts were exported with decode_chunk={k_art}, "
                f"scheduler asked for k_decode={self.k_decode}")
        if surface is not None:
            self.extend_paged = surface.get("extend_paged")
        else:
            try:
                # block extend through the table: prefix-sharing ingest
                # (absent on artifacts exported before it existed)
                self.extend_paged = load_exported_extend_paged(
                    artifacts_dir)
            except FileNotFoundError:
                self.extend_paged = None
        # page-aligned shared-prefix registry: tuple(full-page tokens) ->
        # pool pages holding their KV (refcounted; base count 1 keeps
        # them resident across requests, idle entries evictable under
        # pool pressure)
        self._prefix_pages: Dict[tuple, List[int]] = {}
        self._prefix_hits = 0
        self.window = int(self.meta.get("max_seq", self.meta["block_size"]))
        self.vocab = int(self.meta["vocab_size"])
        self.page = int(self.meta["page_size"])
        self.fused_lps = bool(self.meta.get("decode_k_logprobs"))
        self.mp = self.window // self.page
        # default pool = the dense reservation (no oversubscription);
        # smaller n_pages is the point
        self.pool = PagePool(n_pages or self.n_slots * self.mp + 1)
        self.last_stats: Dict[str, Any] = {}
        kv = int(self.meta.get("n_kv_head") or self.meta["n_head"])
        hd = int(self.meta["n_embd"]) // int(self.meta["n_head"])
        dt = jnp.dtype(self.meta["compute_dtype"])
        z = jnp.zeros((self.pool.n_pages, self.page, kv, hd), dt)
        self._pools = [(z, z) for _ in range(int(self.meta["n_layer"]))]
        # chunked prefill: long prompts ingest straight into the row's
        # pages through extend_paged in fixed chunks — exact (absolute-
        # position mask), peak prefill score memory bounded by the chunk
        self.prefill_chunk = (int(prefill_chunk)
                              if prefill_chunk else None)
        if self.prefill_chunk is not None and self.extend_paged is None:
            raise ValueError(
                "prefill_chunk needs the extend_paged artifact "
                "(re-export with a current export_lm)")
        # speculation over the paged cache: a dense-cache DRAFT model
        # proposes k-token blocks per slot, the paged target verifies
        # them through extend_paged at per-row positions (stale KV from
        # rejected drafts is masked, then overwritten)
        self.k_draft = int(k_draft)
        self.draft = None
        if draft_dir is not None and self.k_draft > 0:
            assert self.k_decode == 0, \
                "k_decode (fused chunks) and k_draft (speculative " \
                "draft/verify) are alternative decode loops — pick one"
            if self.extend_paged is None:
                raise ValueError(
                    "speculation needs the extend_paged artifact "
                    "(re-export with a current export_lm)")
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

    def _validate(self, requests: Sequence[Dict[str, Any]],
                  default_new_tokens: int) -> None:
        for i, req in enumerate(requests):
            if "tokens" not in req:
                raise ValueError(f"request {i}: missing 'tokens'")
            pfx = list(req.get("prefix") or ())
            if pfx and self.extend_paged is None:
                raise ValueError(
                    f"request {i}: 'prefix' needs the extend_paged "
                    "artifact (re-export with a current export_lm)")
            t = len(req["tokens"]) + len(pfx)
            n = int(req.get("n_tokens", default_new_tokens))
            # speculative verify writes up to k_draft positions past the
            # last committed token (rejected-draft KV — masked but
            # WRITTEN, so the window and page budget must cover it;
            # beyond-window writes would alias through the block table)
            slack = self.k_draft if self.draft is not None else 0
            if t + n + slack > self.window:
                raise ValueError(
                    f"request {i}: prompt {t} + {n} new tokens "
                    + (f"+ {slack} draft slack " if slack else "")
                    + f"exceeds the exported serving window {self.window}")
            if _pages_for(t + n + slack, self.page) > self.pool.n_usable:
                raise ValueError(
                    f"request {i}: needs "
                    f"{_pages_for(t + n + slack, self.page)} pages "
                    f"but the pool holds {self.pool.n_usable}")
            toks = np.asarray(pfx + list(req["tokens"]), np.int64)
            if toks.size and (toks.min() < 0 or toks.max() >= self.vocab):
                raise ValueError(
                    f"request {i}: token ids outside [0, {self.vocab})")
            try:
                parse_stops(req, self.vocab)
            except ValueError as exc:
                raise ValueError(f"request {i}: {exc}") from None

    def _cache(self, table: np.ndarray):
        t = jnp.asarray(table)
        return tuple((pk, pv, t) for pk, pv in self._pools)

    def _row_cache(self, table: np.ndarray, s: int):
        t = jnp.asarray(table[s:s + 1])
        return tuple((pk, pv, t) for pk, pv in self._pools)

    def _set_pools(self, cache) -> None:
        self._pools = [(pk, pv) for pk, pv, _ in cache]

    def _ingest_row(self, table: np.ndarray, s: int, toks: np.ndarray,
                    pos0: int):
        """Feed `toks` into row s's (pre-allocated) pages through
        extend_paged at absolute positions pos0..pos0+len-1, in chunks
        of prefill_chunk when set — exact (absolute-position mask), and
        peak prefill score memory is bounded by the chunk. Returns the
        logits of the last chunk [1, c, V]."""
        toks = np.asarray(toks, np.int32).reshape(-1)
        c = self.prefill_chunk or len(toks)
        logits = None
        for off in range(0, len(toks), c):
            part = toks[off:off + c]
            logits, cache = self.extend_paged(
                jnp.asarray(part.reshape(1, -1)),
                self._row_cache(table, s),
                jnp.asarray([pos0 + off], np.int32))
            self._set_pools(cache)
        return logits

    def _auto_prefixes(self, requests: Sequence[Dict[str, Any]]
                       ) -> Dict[int, tuple]:
        """AUTOMATIC prefix sharing: request index -> the page-aligned
        token prefix to share, detected without any 'prefix' field.
        A request is a candidate when its prompt's aligned head is
        (a) already in the registry (a system prompt seen by an earlier
        serve() call), or (b) shared with another request in THIS batch
        (sorting the prompts makes the longest common prefix of any
        pair appear between sorted neighbors). Sharers of one batch are
        given the SAME aligned length (capped so every sharer keeps at
        least one private token to prefill), so they resolve to one
        registry entry built once. Explicit 'prefix' fields win."""
        out: Dict[int, tuple] = {}
        if self.extend_paged is None:
            return out
        toks_of = []
        for i, r in enumerate(requests):
            if r.get("prefix") or not r.get("tokens"):
                continue
            toks_of.append((i, tuple(int(x) for x in r["tokens"])))
        toks_of.sort(key=lambda kv: kv[1])

        # aligned LCP between sorted neighbors (capped so each side
        # keeps >= 1 private token)
        pair_lcp = []
        for j in range(len(toks_of) - 1):
            t, u = toks_of[j][1], toks_of[j + 1][1]
            m = min(len(t) - 1, len(u) - 1)
            c = 0
            while c < m and t[c] == u[c]:
                c += 1
            pair_lcp.append((c // self.page) * self.page)

        # runs of neighbors sharing >= 1 aligned page take ONE key: the
        # run's MINIMUM adjacent LCP. Per-request maxima would hand
        # members of one group nested different-length keys, building
        # duplicate registry entries that hold identical KV.
        j = 0
        while j < len(pair_lcp):
            if pair_lcp[j] < self.page:
                j += 1
                continue
            e = j
            while e < len(pair_lcp) and pair_lcp[e] >= self.page:
                e += 1
            length = min(pair_lcp[j:e])
            for i, t in toks_of[j:e + 1]:
                out[i] = t[:length]
            j = e + 1

        # a LONGER already-built registry key wins per request (reusing
        # it builds nothing new)
        for i, t in toks_of:
            max_l = ((len(t) - 1) // self.page) * self.page
            have = len(out.get(i, ()))
            for length in range(max_l, have, -self.page):
                if t[:length] in self._prefix_pages:
                    out[i] = t[:length]
                    break
        return out

    def _prefix_registry(self, key: tuple) -> List[int]:
        """Pool pages holding the KV of `key` (a page-ALIGNED token
        tuple), building them once: allocate, then extend_paged the
        tokens straight into the pool through a 1-row table. Requests
        whose 'prefix' shares the page-aligned head share these pages
        read-only."""
        pages = self._prefix_pages.get(key)
        if pages is not None:
            self._prefix_hits += 1
            return pages
        n_full = len(key) // self.page
        pages = []
        for _ in range(n_full):
            p = self.pool.alloc()
            assert p is not None, "registry build must be gated on n_free"
            pages.append(p)
        tab = np.zeros((1, self.mp), np.int32)
        tab[0, :n_full] = pages
        # build in prefill_chunk pieces like any other ingest: a long
        # shared system prompt must not re-create the one-shot prefill
        # score-memory peak the chunk bound exists for
        c = self.prefill_chunk or len(key)
        toks = np.asarray(key, np.int32)
        for off in range(0, len(key), c):
            _, cache = self.extend_paged(
                jnp.asarray(toks[off:off + c].reshape(1, -1)),
                tuple((pk, pv, jnp.asarray(tab))
                      for pk, pv in self._pools),
                jnp.asarray([off], np.int32))
            self._set_pools(cache)
        self._prefix_pages[key] = pages
        return pages

    def serve(self, requests: Sequence[Dict[str, Any]],
              default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        """Same request/response contract as ContinuousLMServer.serve
        ('tokens' + optional 'n_tokens'/'temperature'/'top_k'/'top_p'/
        'seed'/'eos'); responses keep request order."""
        self._validate(requests, default_new_tokens)
        n_req = len(requests)
        responses: List[Optional[Dict[str, Any]]] = [None] * n_req
        pending = list(range(n_req))[::-1]  # pop() preserves arrival order
        b = self.n_slots
        # automatic page-aligned prefix sharing: requests with a common
        # system-prompt head (in this batch or in the cross-call
        # registry) share its pages without declaring a 'prefix' field
        auto_pfx = self._auto_prefixes(requests)

        slots: List[Optional[Dict[str, Any]]] = [None] * b
        pos = np.zeros(b, np.int32)
        toks = np.zeros((b, 1), np.int32)
        table = np.zeros((b, self.mp), np.int32)
        d_cache = None
        if self.draft is not None:
            _, d_cache = self.d_prefill(jnp.zeros((b, 1), jnp.int32))
        # requests that have been preempted once re-admit only when
        # their FULL remaining page need fits the free pool: preemption
        # loses all progress (the replay is deterministic), so cheap
        # re-admission can ping-pong two growing rows forever — each
        # preempting the other before it finishes. The conservative
        # re-gate guarantees the replayed row runs to completion.
        preempted_reqs: set = set()
        pages_of: List[List[int]] = [[] for _ in range(b)]
        shared_of: List[List[int]] = [[] for _ in range(b)]
        admit_serial = 0

        t_start = time.perf_counter()
        decode_steps = prefills = preemptions = 0
        decode_bursts = 0  # host syncs on the fused path
        rounds = drafted = accepted = 0
        peak_pages = 0
        hits0 = self._prefix_hits  # report per-call registry hits

        def release(s: int) -> None:
            self.pool.free(pages_of[s])
            # shared-prefix pages: drop this row's refcount; the
            # registry's base count keeps them resident for the next hit
            self.pool.free(shared_of[s])
            pages_of[s] = []
            shared_of[s] = []
            table[s] = TRASH_PAGE
            slots[s] = None
            pos[s] = 0
            toks[s, 0] = 0

        def evict_idle_prefix(keep: Optional[tuple] = None) -> bool:
            """Free a registry entry no live row is using (all refcounts
            at the registry's base 1). Last-resort pool pressure valve.
            `keep` protects the entry an admission is about to reuse."""
            for key, pages in list(self._prefix_pages.items()):
                if key == keep:
                    continue
                if all(self.pool._rc.get(p) == 1 for p in pages):
                    self.pool.free(pages)
                    del self._prefix_pages[key]
                    return True
            return False

        def finalize(s: int) -> None:
            st = slots[s]
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
            responses[st["req"]] = resp
            release(s)

        def preempt_one(exclude: int) -> bool:
            """Evict the most recently admitted slot (except `exclude`):
            pages freed, request requeued at the FRONT so it re-admits
            next. Returns False if there is nobody to evict."""
            nonlocal preemptions
            victim = None
            for s in range(b):
                if s == exclude or slots[s] is None:
                    continue
                if victim is None or \
                        slots[s]["serial"] > slots[victim]["serial"]:
                    victim = s
            if victim is None:
                return False
            pending.append(slots[victim]["req"])  # pop() takes it next
            preempted_reqs.add(slots[victim]["req"])
            release(victim)
            preemptions += 1
            return True

        def ensure_page(s: int, logical: int) -> None:
            """Allocate row s's logical page, preempting (then evicting
            idle shared prefixes) until one frees up."""
            if table[s, logical] != TRASH_PAGE:
                return
            while True:
                p = self.pool.alloc()
                if p is not None:
                    table[s, logical] = p
                    pages_of[s].append(p)
                    return
                if preempt_one(exclude=s) or evict_idle_prefix():
                    continue
                raise RuntimeError(
                    "page pool exhausted with nothing left to preempt "
                    f"or evict — raise n_pages (usable "
                    f"{self.pool.n_usable})")

        def push(s: int, st: Dict[str, Any], tok_row: np.ndarray) -> None:
            tok = int(tok_row[0, 0])
            st["out"].append(tok)
            st["remaining"] -= 1
            if st["eos"] is not None and tok == st["eos"]:
                st["eos_hit"] = True
                st["remaining"] = 0
            check_stops(st)
            if st["remaining"] <= 0:
                finalize(s)
            else:
                toks[s, 0] = tok

        while pending or any(st is not None for st in slots):
            for s in range(b):
                while slots[s] is None and pending:
                    ridx = pending[-1]
                    nxt = requests[ridx]
                    pfx = tuple(nxt.get("prefix") or ())
                    body = list(nxt.get("tokens") or ())
                    if not pfx and ridx in auto_pfx:
                        # detected shared head: split it off the prompt
                        pfx = auto_pfx[ridx]
                        body = body[len(pfx):]
                    n_full = len(pfx) // self.page
                    key = pfx[:n_full * self.page]
                    build = n_full if (n_full and
                                       key not in self._prefix_pages) else 0
                    total = len(pfx) + len(body)
                    if pending[-1] in preempted_reqs:
                        # full-lifetime need (see preempted_reqs above):
                        # prompt + budget + the speculative write slack
                        slack = (self.k_draft if self.draft is not None
                                 else 0)
                        life = total + int(nxt.get(
                            "n_tokens", default_new_tokens)) + slack
                        private = max(
                            _pages_for(life, self.page) - n_full, 1)
                    else:
                        private = max(
                            _pages_for(total, self.page) - n_full, 1)
                    # idle registry prefixes (base refcount 1) hold pool
                    # capacity across serve() calls: evict them before
                    # concluding the pool is too tight to admit — without
                    # this, a _validate-accepted request can starve with
                    # every slot free (the round-4 advisor repro)
                    while (build + private > self.pool.n_free
                           and evict_idle_prefix(
                               keep=key if n_full else None)):
                        pass
                    if build + private > self.pool.n_free:
                        break  # wait for pages instead of thrashing
                    i = pending.pop()
                    req = requests[i]
                    n_tokens = int(req.get("n_tokens", default_new_tokens))
                    if n_tokens <= 0:
                        responses[i] = {"tokens": [], "n_prompt":
                                        len(req["tokens"]), "n_generated": 0,
                                        "slot": s, "stopped_early": False}
                        continue
                    if n_full:
                        # page-aligned prefix head: shared read-only pages
                        shared = self._prefix_registry(key)
                        self.pool.share(shared)
                        shared_of[s] = list(shared)
                        table[s, :n_full] = shared
                    for j in range(n_full,
                                   max(_pages_for(total, self.page), 1)):
                        ensure_page(s, j)
                    if self.extend_paged is not None:
                        # ONE dispatch: the prefix tail + prompt body
                        # ingest straight into the row's pages through
                        # the table (chunked when prefill_chunk is
                        # set), conditioned on any shared pages — no
                        # dense row cache, no separate admit dispatch
                        ingest = np.asarray(
                            list(pfx[n_full * self.page:]) + body,
                            np.int32)
                        logits = self._ingest_row(
                            table, s, ingest, n_full * self.page)
                    else:
                        # artifacts exported before extend_paged:
                        # dense prefill + page splice (two dispatches)
                        prompt = np.asarray(body,
                                            np.int32).reshape(1, -1)
                        logits, row_cache = self.prefill(
                            jnp.asarray(prompt))
                        page_list = np.full(self.mp, TRASH_PAGE, np.int32)
                        page_list[:len(pages_of[s])] = pages_of[s]
                        cache = self.admit_paged(self._cache(table),
                                                 row_cache,
                                                 jnp.asarray(page_list))
                        self._set_pools(cache)
                    if self.draft is not None:
                        # the draft sees the FULL context (prefix +
                        # prompt) in its own dense continuous cache
                        full = np.asarray(list(pfx) + body,
                                          np.int32).reshape(1, -1)
                        _, d_row = self.d_prefill(jnp.asarray(full))
                        d_cache = self.d_admit(d_cache, d_row,
                                               jnp.int32(s))
                    prefills += 1
                    st = {
                        "req": i,
                        "serial": admit_serial,
                        "n_prompt": len(req["tokens"]),
                        "out": [],
                        "remaining": n_tokens,
                        "temperature": float(req.get("temperature", 0.0)),
                        "top_k": req.get("top_k"),
                        "top_p": req.get("top_p"),
                        "eos": req.get("eos"),
                        "eos_hit": False,
                        "stops": parse_stops(req, self.vocab),
                        # logprobs ride the fused chunks when the
                        # artifacts emit them; per-token fallback else
                        "lps": [] if req.get("logprobs") else None,
                        # the canonical per-request rng root
                        # (serving.device_sample)
                        "key": np.asarray(jax.random.PRNGKey(
                            int(req.get("seed", 0))), np.uint32),
                    }
                    admit_serial += 1
                    slots[s] = st
                    pos[s] = total  # prefix + prompt (absolute decode pos)
                    tok = device_sample(
                        logits[:, -1], st["key"][None],
                        [total - 1], [st["temperature"]],
                        [int(st["top_k"] or 0)],
                        [1.0 if st["top_p"] is None
                         else float(st["top_p"])])
                    if st["lps"] is not None:
                        st["lps"].append(token_logprob(
                            np.asarray(logits[0, -1]), int(tok[0, 0])))
                    # draft/verify bookkeeping (spec mode): sequence
                    # length incl. generated = pos + 1, last committed
                    # token, and the lag the draft cache hasn't seen
                    st["last"] = int(tok[0, 0])
                    st["lag"] = [int(tok[0, 0])]
                    st["n_committed"] = total + 1
                    push(s, st, tok)

            if not any(st is not None for st in slots):
                if pending:
                    # every slot idle yet nothing admitted: only idle
                    # registry prefixes can be holding pages — evict one
                    # and retry; anything else is a genuine bug
                    if evict_idle_prefix():
                        continue
                    raise RuntimeError("scheduler stalled with free slots")
                break

            if self.draft is not None:
                # ---- speculative round over the paged cache: the same
                # draft/verify quantum as SpecLMEngine.step, with the
                # target verify riding extend_paged at per-row positions
                # (rejected-draft KV is masked by the absolute-position
                # mask, then overwritten; its pages are reserved up
                # front — _validate budgets the k_draft write slack) ----
                k = self.k_draft
                for s in range(b):
                    if slots[s] is None:
                        continue
                    for j in range(int(pos[s]) // self.page,
                                   (int(pos[s]) + k) // self.page + 1):
                        if slots[s] is None:
                            break  # preempted by an earlier ensure_page
                        ensure_page(s, j)
                active = [s for s in range(b) if slots[s] is not None]
                if not active:
                    continue  # everyone preempted: re-admit first
                peak_pages = max(peak_pages,
                                 self.pool.n_usable - self.pool.n_free)

                # draft phase: ingest lag + propose k tokens, batched
                W = 2  # max lag: [d_k, correction] after a full accept
                block_d = np.zeros((b, W), np.int32)
                pos_d = np.zeros(b, np.int32)
                for s in active:
                    st = slots[s]
                    lag = st["lag"]
                    assert 1 <= len(lag) <= W, lag
                    block_d[s] = lag + [lag[-1]] * (W - len(lag))
                    pos_d[s] = st["n_committed"] - len(lag)
                d_logits, d_cache = self.d_extend_rows(
                    jnp.asarray(block_d), d_cache, jnp.asarray(pos_d))
                d_logits_np = np.asarray(d_logits)  # [b, W, V]

                drafts = np.zeros((b, k), np.int32)
                step_tok = np.zeros((b, 1), np.int32)
                step_pos = np.zeros(b, np.int32)
                prop = np.zeros((b, 1, self.vocab), np.float32)
                for s in active:
                    prop[s, 0] = d_logits_np[s, len(slots[s]["lag"]) - 1]
                di = spec_draw_block(slots, prop, offset=0)
                for s in active:
                    drafts[s, 0] = di[s, 0]
                    step_tok[s, 0] = di[s, 0]
                    step_pos[s] = slots[s]["n_committed"]
                for i in range(1, k):
                    d_logits, d_cache = self.d_decode_rows(
                        jnp.asarray(step_tok), d_cache,
                        jnp.asarray(step_pos))
                    di = spec_draw_block(slots,
                                         np.asarray(d_logits[:, -1:]),
                                         offset=i)
                    for s in active:
                        drafts[s, i] = di[s, 0]
                        step_tok[s, 0] = di[s, 0]
                        step_pos[s] = slots[s]["n_committed"] + i
                drafted += k * len(active)

                # verify phase: ONE paged target pass per round
                block_t = np.zeros((b, k + 1), np.int32)
                pos_t = np.zeros(b, np.int32)
                for s in active:
                    st = slots[s]
                    block_t[s, 0] = st["last"]
                    block_t[s, 1:] = drafts[s]
                    pos_t[s] = st["n_committed"] - 1
                t_logits, cache = self.extend_paged(
                    jnp.asarray(block_t), self._cache(table),
                    jnp.asarray(pos_t))
                self._set_pools(cache)
                t_logits_np = np.asarray(t_logits)  # [b, k+1, V]
                draws = spec_draw_block(slots, t_logits_np)
                decode_steps += 1
                rounds += 1

                # accept/commit per row against the canonical chain
                for s in active:
                    st = slots[s]
                    j = 0
                    while j < k and int(drafts[s, j]) == int(draws[s, j]):
                        j += 1
                    next_tok = int(draws[s, j])
                    accepted += j
                    commit = [int(d) for d in drafts[s, :j]] + [next_tok]
                    in_draft = min(j, k - 1)
                    st["lag"] = commit[in_draft:]
                    for i, tok in enumerate(commit):
                        if st["lps"] is not None:
                            st["lps"].append(token_logprob(
                                t_logits_np[s, i], tok))
                        st["last"] = tok
                        st["n_committed"] += 1
                        pos[s] += 1
                        push(s, st, np.asarray([[tok]]))
                        if slots[s] is None:
                            break
                continue

            k = self.k_decode
            active = [s for s in range(b) if slots[s] is not None]
            if (self.decode_paged_k is not None
                    and (self.fused_lps
                         or not any(slots[s]["lps"] is not None
                                    for s in active))
                    and all(pos[s] + k <= self.window for s in active)):
                # fused K-token dispatch over the paged cache: every page
                # the K writes may touch must exist BEFORE the dispatch
                # (the device cannot allocate), so reserve through
                # (pos+K-1)//page. Mixed greedy/sampled pools ride the
                # sampled artifact (device threefry streams, chunk- and
                # pool-invariant); all-greedy pools the cheaper one.
                #
                # DRAIN CHAINING (see LMEngine.step): with nothing
                # pending, budgets surviving, window room, AND the
                # burst's extra pages free WITHOUT preemption (never
                # preempt an active row to speculate further ahead),
                # dispatch several chunks back-to-back on device token
                # slices — one host sync per burst.
                chains = 1
                while (chains < 4 and not pending
                       and all(slots[s]["remaining"] > chains * k
                               for s in active if slots[s] is not None)
                       and all(pos[s] + (chains + 1) * k <= self.window
                               for s in active
                               if slots[s] is not None)):
                    chains += 1

                def burst_pages(extra_k: int) -> int:
                    need = 0
                    for s in active:
                        if slots[s] is None:
                            continue
                        for j in range(int(pos[s]) // self.page,
                                       (int(pos[s]) + extra_k - 1)
                                       // self.page + 1):
                            if table[s, j] == TRASH_PAGE:
                                need += 1
                    return need

                while chains > 1 and burst_pages(chains * k) > \
                        self.pool.n_free:
                    chains -= 1
                for s in active:
                    if slots[s] is None:
                        # a preceding ensure_page preempted this slot:
                        # reserving into its (now trashed) table row
                        # would leak unevictable pages
                        continue
                    for j in range(int(pos[s]) // self.page,
                                   (int(pos[s]) + chains * k - 1)
                                   // self.page + 1):
                        ensure_page(s, j)
                active = [s for s in range(b) if slots[s] is not None]
                peak_pages = max(peak_pages,
                                 self.pool.n_usable - self.pool.n_free)
                all_g = all(slots[s]["temperature"] == 0.0
                            for s in active)
                if not all_g:
                    keys = np.zeros((b, 2), np.uint32)
                    temp = np.zeros(b, np.float32)
                    topk = np.zeros(b, np.int32)
                    topp = np.ones(b, np.float32)
                    for s in active:
                        st = slots[s]
                        keys[s] = st["key"]
                        temp[s] = st["temperature"]
                        topk[s] = int(st["top_k"] or 0)
                        topp[s] = float(1.0 if st["top_p"] is None
                                        else st["top_p"])
                burst = []
                tok_dev = jnp.asarray(toks)
                pos_base = pos.copy()
                for c in range(chains):
                    pos_c = jnp.asarray(pos_base + c * k)
                    if all_g:
                        chunk, lps, cache = self.decode_paged_k(
                            tok_dev, self._cache(table), pos_c)
                    else:
                        chunk, lps, cache = self.decode_paged_k_sample(
                            tok_dev, self._cache(table), pos_c,
                            jnp.asarray(keys), jnp.asarray(temp),
                            jnp.asarray(topk), jnp.asarray(topp))
                    self._set_pools(cache)
                    burst.append((chunk, lps))
                    tok_dev = chunk[:, -1:]  # device slice — no sync
                decode_steps += chains
                decode_bursts += 1
                for chunk, lps in burst:
                    chunk_np = np.asarray(chunk)
                    lps_np = None if lps is None else np.asarray(lps)
                    for s in active:
                        st = slots[s]
                        if st is None:
                            continue  # finished earlier in the burst
                        for j in range(k):
                            pos[s] += 1
                            if st["lps"] is not None:
                                st["lps"].append(float(lps_np[s, j]))
                            push(s, st, chunk_np[s:s + 1, j:j + 1])
                            if slots[s] is None:
                                break
                continue

            # the coming dispatch writes each active row at pos[s]
            for s in range(b):
                if slots[s] is not None:
                    ensure_page(s, int(pos[s]) // self.page)
            peak_pages = max(peak_pages,
                             self.pool.n_usable - self.pool.n_free)

            logits, cache = self.decode_paged(
                jnp.asarray(toks), self._cache(table), jnp.asarray(pos))
            self._set_pools(cache)
            logits_dev = logits[:, -1]  # stays on device for the draw
            decode_steps += 1
            # one batched draw of the canonical stream (keys fold the
            # FED position — identical to the in-artifact scan schedule)
            keys = np.zeros((b, 2), np.uint32)
            temp = np.zeros(b, np.float32)
            topk = np.zeros(b, np.int32)
            topp = np.ones(b, np.float32)
            live = [s for s in range(b) if slots[s] is not None]
            for s in live:
                st = slots[s]
                keys[s] = st["key"]
                temp[s] = st["temperature"]
                topk[s] = int(st["top_k"] or 0)
                topp[s] = float(1.0 if st["top_p"] is None
                                else st["top_p"])
            drawn = device_sample(logits_dev, keys, pos.copy(), temp,
                                  topk, topp)
            # logprob rows fetch lazily and TOGETHER (one gather, not
            # one round-trip per row)
            lp_rows = [s for s in live if slots[s]["lps"] is not None]
            lp_np = (np.asarray(logits_dev[jnp.asarray(lp_rows)])
                     if lp_rows else None)
            for s in live:
                st = slots[s]
                if st["lps"] is not None:
                    st["lps"].append(token_logprob(
                        lp_np[lp_rows.index(s)], int(drawn[s, 0])))
                pos[s] += 1
                push(s, st, drawn[s:s + 1])

        dt = time.perf_counter() - t_start
        n_generated = sum(r["n_generated"] for r in responses
                          if r is not None)
        self.last_stats = {
            "decode_steps": decode_steps,
            "decode_bursts": decode_bursts,
            "prefills": prefills,
            "preemptions": preemptions,
            "peak_pages": peak_pages,
            **({"rounds": rounds, "drafted": drafted,
                "accepted": accepted, "k_draft": self.k_draft,
                "accept_rate": (round(accepted / drafted, 4)
                                if drafted else None)}
               if self.draft is not None else {}),
            "prefix_hits": self._prefix_hits - hits0,
            "auto_prefixes": len(auto_pfx),
            "shared_prefix_pages": sum(len(p) for p in
                                       self._prefix_pages.values()),
            "n_pages": self.pool.n_usable,
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
        return self.serve(requests, default_new_tokens)

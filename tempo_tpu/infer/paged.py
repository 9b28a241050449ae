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
from tempo_tpu.infer.serving import (_TicketEngine, check_stops,
                                      device_sample,
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
        'seed'/'eos'/'stop'/'logprobs'/'prefix'); responses keep request
        order. Closed-batch form: submit-all + drain over a
        PagedLMEngine (the stepper OnlineLMServer drives for open-world
        paged serving). submit() validates each request before any
        device work runs (all submits precede the first step)."""
        t_start = time.perf_counter()
        eng = PagedLMEngine(self, default_new_tokens)
        tickets = [eng.submit(req) for req in requests]
        while eng.has_work():
            eng.step()
        dt = time.perf_counter() - t_start
        responses = [eng.finished[t] for t in tickets]
        n_generated = sum(r["n_generated"] for r in responses)
        self.last_stats = {
            **eng.stats(),
            "n_requests": len(requests),
            "n_slots": self.n_slots,
            "n_generated": n_generated,
            "seconds": round(dt, 4),
            "tokens_per_sec": round(n_generated / dt, 2) if dt > 0 else 0.0,
        }
        return responses

    def serve_requests(self, requests: Sequence[Dict[str, Any]],
                       default_new_tokens: int = 64) -> List[Dict[str, Any]]:
        return self.serve(requests, default_new_tokens)


class PagedLMEngine(_TicketEngine):
    """Stepper form of the paged continuous-batching loop — the same
    submit/has_work/step/finished/cancel surface as LMEngine and
    SpecLMEngine, so OnlineLMServer drives PAGED pools for concurrent
    callers (the last cell of the scheduler x mode matrix).
    PagedLMServer.serve is submit-all + drain over this engine, so every
    closed-batch pin (dense equality, preemption replay, prefix
    sharing, speculation, chaining) pins the engine's scheduling too.

    One step() = one admission sweep + one decode quantum: a
    speculative draft/verify round when a draft is attached, a fused
    k-token burst when the artifacts allow, a per-token dispatch
    otherwise. NOT thread-safe: OnlineLMServer serializes access."""

    def __init__(self, server: PagedLMServer,
                 default_new_tokens: int = 64):
        self.s = server
        self.default_new_tokens = int(default_new_tokens)
        b = server.n_slots
        self.slots: List[Optional[Dict[str, Any]]] = [None] * b
        self.pos = np.zeros(b, np.int32)
        self.toks = np.zeros((b, 1), np.int32)
        self.table = np.zeros((b, server.mp), np.int32)
        self.pages_of: List[List[int]] = [[] for _ in range(b)]
        self.shared_of: List[List[int]] = [[] for _ in range(b)]
        self.d_cache = None
        if server.draft is not None:
            _, self.d_cache = server.d_prefill(
                jnp.zeros((b, 1), jnp.int32))
        self.pending: List[tuple] = []  # FIFO of (ticket, req, n_tokens)
        self.finished: Dict[int, Dict[str, Any]] = {}
        self._ticket = 0
        self.admit_serial = 0
        # requests that have been preempted once re-admit only when
        # their FULL remaining page need fits the free pool: preemption
        # loses all progress (the replay is deterministic), so cheap
        # re-admission can ping-pong two growing rows forever — each
        # preempting the other before it finishes. The conservative
        # re-gate guarantees the replayed row runs to completion.
        self.preempted_tickets: set = set()
        self.decode_steps = 0
        self.decode_bursts = 0  # host syncs on the fused path
        self.prefills = 0
        self.preemptions = 0
        self.rounds = self.drafted = self.accepted = 0
        self.peak_pages = 0
        self.auto_tickets: set = set()  # requests with a detected head
        self._auto_cache: tuple = ((), {})
        self._hits0 = server._prefix_hits  # per-engine registry hits

    def stats(self) -> Dict[str, Any]:
        s = self.s
        out = {
            "decode_steps": self.decode_steps,
            "decode_bursts": self.decode_bursts,
            "prefills": self.prefills,
            "preemptions": self.preemptions,
            "peak_pages": self.peak_pages,
            "prefix_hits": s._prefix_hits - self._hits0,
            "auto_prefixes": len(self.auto_tickets),
            "shared_prefix_pages": sum(len(p) for p in
                                       s._prefix_pages.values()),
            "n_pages": s.pool.n_usable,
        }
        if s.draft is not None:
            out.update({
                "rounds": self.rounds, "drafted": self.drafted,
                "accepted": self.accepted, "k_draft": s.k_draft,
                "accept_rate": (round(self.accepted / self.drafted, 4)
                                if self.drafted else None)})
        return out

    # ---------------------------------------------- page bookkeeping
    def _release(self, s: int) -> None:
        pool = self.s.pool
        pool.free(self.pages_of[s])
        # shared-prefix pages: drop this row's refcount; the registry's
        # base count keeps them resident for the next hit
        pool.free(self.shared_of[s])
        self.pages_of[s] = []
        self.shared_of[s] = []
        self.table[s] = TRASH_PAGE
        self.slots[s] = None
        self.pos[s] = 0
        self.toks[s, 0] = 0

    def _evict_idle_prefix(self, keep: Optional[tuple] = None) -> bool:
        """Free a registry entry no live row is using (all refcounts at
        the registry's base 1). Last-resort pool pressure valve. `keep`
        protects the entry an admission is about to reuse."""
        pool = self.s.pool
        for key, pages in list(self.s._prefix_pages.items()):
            if key == keep:
                continue
            if all(pool._rc.get(p) == 1 for p in pages):
                pool.free(pages)
                del self.s._prefix_pages[key]
                return True
        return False

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
        # the conservative re-admission gate only matters while the
        # request can still be replayed — prune, or the long-lived
        # online engine's set grows forever
        self.preempted_tickets.discard(st["ticket"])
        self._release(s)

    def _preempt_one(self, exclude: int) -> bool:
        """Evict the most recently admitted slot (except `exclude`):
        pages freed, request requeued at the FRONT so it re-admits
        next. Returns False if there is nobody to evict."""
        victim = None
        for s in range(self.s.n_slots):
            if s == exclude or self.slots[s] is None:
                continue
            if victim is None or \
                    self.slots[s]["serial"] > self.slots[victim]["serial"]:
                victim = s
        if victim is None:
            return False
        st = self.slots[victim]
        self.pending.insert(0, (st["ticket"], st["request"],
                                st["n_tokens"]))
        self.preempted_tickets.add(st["ticket"])
        self._release(victim)
        self.preemptions += 1
        return True

    def _ensure_page(self, s: int, logical: int) -> None:
        """Allocate row s's logical page, preempting (then evicting
        idle shared prefixes) until one frees up."""
        if self.table[s, logical] != TRASH_PAGE:
            return
        pool = self.s.pool
        while True:
            p = pool.alloc()
            if p is not None:
                self.table[s, logical] = p
                self.pages_of[s].append(p)
                return
            if self._preempt_one(exclude=s) or self._evict_idle_prefix():
                continue
            raise RuntimeError(
                "page pool exhausted with nothing left to preempt "
                f"or evict — raise n_pages (usable {pool.n_usable})")

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

    # ------------------------------------------------------ admission
    def _admit(self) -> None:
        srv = self.s
        for s in range(srv.n_slots):
            while self.slots[s] is None and self.pending:
                # automatic page-aligned prefix sharing over whatever
                # is pending RIGHT NOW plus the cross-call registry —
                # recomputed only when the pending sequence changes
                # (cache keyed by the ticket order)
                ck = tuple(t for t, _, _ in self.pending)
                if self._auto_cache[0] != ck:
                    self._auto_cache = (ck, srv._auto_prefixes(
                        [req for _, req, _ in self.pending]))
                auto = self._auto_cache[1]
                ticket, nxt, n_tokens = self.pending[0]
                pfx = tuple(nxt.get("prefix") or ())
                body = list(nxt.get("tokens") or ())
                auto_hit = False
                if not pfx and 0 in auto:
                    # detected shared head: split it off the prompt
                    pfx = auto[0]
                    body = body[len(pfx):]
                    auto_hit = True
                n_full = len(pfx) // srv.page
                key = pfx[:n_full * srv.page]
                build = n_full if (n_full and
                                   key not in srv._prefix_pages) else 0
                total = len(pfx) + len(body)
                if ticket in self.preempted_tickets:
                    # full-lifetime need (see preempted_tickets above)
                    slack = (srv.k_draft if srv.draft is not None
                             else 0)
                    life = total + n_tokens + slack
                    private = max(
                        _pages_for(life, srv.page) - n_full, 1)
                else:
                    private = max(
                        _pages_for(total, srv.page) - n_full, 1)
                # idle registry prefixes (base refcount 1) hold pool
                # capacity across calls: evict them before concluding
                # the pool is too tight to admit
                while (build + private > srv.pool.n_free
                       and self._evict_idle_prefix(
                           keep=key if n_full else None)):
                    pass
                if build + private > srv.pool.n_free:
                    return  # wait for pages instead of thrashing
                self.pending.pop(0)
                if auto_hit:
                    self.auto_tickets.add(ticket)
                if n_full:
                    # page-aligned prefix head: shared read-only pages
                    shared = srv._prefix_registry(key)
                    srv.pool.share(shared)
                    self.shared_of[s] = list(shared)
                    self.table[s, :n_full] = shared
                for j in range(n_full,
                               max(_pages_for(total, srv.page), 1)):
                    self._ensure_page(s, j)
                if srv.extend_paged is not None:
                    # ONE dispatch: prefix tail + prompt body ingest
                    # straight into the row's pages (chunked when
                    # prefill_chunk is set)
                    ingest = np.asarray(
                        list(pfx[n_full * srv.page:]) + body, np.int32)
                    logits = srv._ingest_row(
                        self.table, s, ingest, n_full * srv.page)
                else:
                    # artifacts exported before extend_paged:
                    # dense prefill + page splice (two dispatches)
                    prompt = np.asarray(body, np.int32).reshape(1, -1)
                    logits, row_cache = srv.prefill(jnp.asarray(prompt))
                    page_list = np.full(srv.mp, TRASH_PAGE, np.int32)
                    page_list[:len(self.pages_of[s])] = self.pages_of[s]
                    cache = srv.admit_paged(srv._cache(self.table),
                                            row_cache,
                                            jnp.asarray(page_list))
                    srv._set_pools(cache)
                if srv.draft is not None:
                    # the draft sees the FULL context (prefix + prompt)
                    # in its own dense continuous cache
                    full = np.asarray(list(pfx) + body,
                                      np.int32).reshape(1, -1)
                    _, d_row = srv.d_prefill(jnp.asarray(full))
                    self.d_cache = srv.d_admit(self.d_cache, d_row,
                                               jnp.int32(s))
                self.prefills += 1
                st = {
                    "ticket": ticket,
                    "request": nxt,
                    "n_tokens": n_tokens,
                    "serial": self.admit_serial,
                    "n_prompt": len(nxt["tokens"]),
                    "out": [],
                    "remaining": n_tokens,
                    "temperature": float(nxt.get("temperature", 0.0)),
                    "top_k": nxt.get("top_k"),
                    "top_p": nxt.get("top_p"),
                    "eos": nxt.get("eos"),
                    "eos_hit": False,
                    "stops": parse_stops(nxt, srv.vocab),
                    "lps": [] if nxt.get("logprobs") else None,
                    # the canonical per-request rng root
                    # (serving.device_sample)
                    "key": np.asarray(jax.random.PRNGKey(
                        int(nxt.get("seed", 0))), np.uint32),
                }
                self.admit_serial += 1
                self.slots[s] = st
                self.pos[s] = total  # prefix + prompt (abs decode pos)
                tok = device_sample(
                    logits[:, -1], st["key"][None],
                    [total - 1], [st["temperature"]],
                    [int(st["top_k"] or 0)],
                    [1.0 if st["top_p"] is None
                     else float(st["top_p"])])
                if st["lps"] is not None:
                    st["lps"].append(token_logprob(
                        np.asarray(logits[0, -1]), int(tok[0, 0])))
                # draft/verify bookkeeping (spec mode)
                st["last"] = int(tok[0, 0])
                st["lag"] = [int(tok[0, 0])]
                st["n_committed"] = total + 1
                self._push(s, st, tok)

    # ------------------------------------------------------ decoding
    def step(self) -> None:
        """One admission sweep + (if anything is active) one decode
        quantum (speculative round / fused burst / per-token)."""
        self._admit()
        srv = self.s
        b = srv.n_slots
        slots, pos, toks, table = (self.slots, self.pos, self.toks,
                                   self.table)
        if not any(st is not None for st in slots):
            if self.pending:
                # every slot idle yet nothing admitted: only idle
                # registry prefixes can be holding pages — evict one
                # and retry at the next step; anything else is a bug
                if not self._evict_idle_prefix():
                    raise RuntimeError(
                        "scheduler stalled with free slots")
            return

        if srv.draft is not None:
            self._spec_round()
            return

        k = srv.k_decode
        active = [s for s in range(b) if slots[s] is not None]
        if (srv.decode_paged_k is not None
                and (srv.fused_lps
                     or not any(slots[s]["lps"] is not None
                                for s in active))
                and all(pos[s] + k <= srv.window for s in active)):
            # fused K-token dispatch over the paged cache (pages the K
            # writes may touch reserved BEFORE the dispatch), with
            # DRAIN CHAINING (shared _TicketEngine machinery) gated
            # additionally on the burst's page appetite fitting the
            # free pool — never preempt an active row to speculate
            # further ahead
            chains = self._chain_gate(active, k, srv.window)

            def burst_pages(extra_k: int) -> int:
                need = 0
                for s in active:
                    if slots[s] is None:
                        continue
                    for j in range(int(pos[s]) // srv.page,
                                   (int(pos[s]) + extra_k - 1)
                                   // srv.page + 1):
                        if table[s, j] == TRASH_PAGE:
                            need += 1
                return need

            while chains > 1 and burst_pages(chains * k) > \
                    srv.pool.n_free:
                chains -= 1
            for s in active:
                if slots[s] is None:
                    # a preceding _ensure_page preempted this slot
                    continue
                for j in range(int(pos[s]) // srv.page,
                               (int(pos[s]) + chains * k - 1)
                               // srv.page + 1):
                    self._ensure_page(s, j)
            active = [s for s in range(b) if slots[s] is not None]
            self.peak_pages = max(
                self.peak_pages, srv.pool.n_usable - srv.pool.n_free)
            all_g = all(slots[s]["temperature"] == 0.0 for s in active)
            keys = temp = topk = topp = None
            if not all_g:
                keys, temp, topk, topp = self._policy_arrays(active)

            def dispatch(tok_dev, pos_dev):
                if all_g:
                    chunk, lps, cache = srv.decode_paged_k(
                        tok_dev, srv._cache(table), pos_dev)
                else:
                    chunk, lps, cache = srv.decode_paged_k_sample(
                        tok_dev, srv._cache(table), pos_dev,
                        jnp.asarray(keys), jnp.asarray(temp),
                        jnp.asarray(topk), jnp.asarray(topp))
                srv._set_pools(cache)
                return chunk, lps

            self._run_burst(active, k, chains, dispatch)
            return

        # per-token path: the coming dispatch writes each row at pos[s]
        for s in range(b):
            if slots[s] is not None:
                self._ensure_page(s, int(pos[s]) // srv.page)
        self.peak_pages = max(
            self.peak_pages, srv.pool.n_usable - srv.pool.n_free)
        logits, cache = srv.decode_paged(
            jnp.asarray(toks), srv._cache(table), jnp.asarray(pos))
        srv._set_pools(cache)
        logits_dev = logits[:, -1]  # stays on device for the draw
        self.decode_steps += 1
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
            topp[s] = float(1.0 if st["top_p"] is None else st["top_p"])
        drawn = device_sample(logits_dev, keys, pos.copy(), temp, topk,
                              topp)
        # logprob rows fetch lazily and TOGETHER
        lp_rows = [s for s in live if slots[s]["lps"] is not None]
        lp_np = (np.asarray(logits_dev[jnp.asarray(lp_rows)])
                 if lp_rows else None)
        for s in live:
            st = slots[s]
            if st["lps"] is not None:
                st["lps"].append(token_logprob(
                    lp_np[lp_rows.index(s)], int(drawn[s, 0])))
            pos[s] += 1
            self._push(s, st, drawn[s:s + 1])

    def _spec_round(self) -> None:
        """Speculative round over the paged cache: the same draft/verify
        quantum as SpecLMEngine.step, with the target verify riding
        extend_paged at per-row positions (rejected-draft KV is masked
        by the absolute-position mask, then overwritten; its pages are
        reserved up front — _validate budgets the k_draft slack)."""
        srv = self.s
        b = srv.n_slots
        slots, pos, table = self.slots, self.pos, self.table
        k = srv.k_draft
        for s in range(b):
            if slots[s] is None:
                continue
            for j in range(int(pos[s]) // srv.page,
                           (int(pos[s]) + k) // srv.page + 1):
                if slots[s] is None:
                    break  # preempted by an earlier _ensure_page
                self._ensure_page(s, j)
        active = [s for s in range(b) if slots[s] is not None]
        if not active:
            return  # everyone preempted: re-admit at the next step
        self.peak_pages = max(
            self.peak_pages, srv.pool.n_usable - srv.pool.n_free)

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
        d_logits, self.d_cache = srv.d_extend_rows(
            jnp.asarray(block_d), self.d_cache, jnp.asarray(pos_d))
        d_logits_np = np.asarray(d_logits)  # [b, W, V]

        drafts = np.zeros((b, k), np.int32)
        step_tok = np.zeros((b, 1), np.int32)
        step_pos = np.zeros(b, np.int32)
        prop = np.zeros((b, 1, srv.vocab), np.float32)
        for s in active:
            prop[s, 0] = d_logits_np[s, len(slots[s]["lag"]) - 1]
        di = spec_draw_block(slots, prop, offset=0)
        for s in active:
            drafts[s, 0] = di[s, 0]
            step_tok[s, 0] = di[s, 0]
            step_pos[s] = slots[s]["n_committed"]
        for i in range(1, k):
            d_logits, self.d_cache = srv.d_decode_rows(
                jnp.asarray(step_tok), self.d_cache,
                jnp.asarray(step_pos))
            di = spec_draw_block(slots, np.asarray(d_logits[:, -1:]),
                                 offset=i)
            for s in active:
                drafts[s, i] = di[s, 0]
                step_tok[s, 0] = di[s, 0]
                step_pos[s] = slots[s]["n_committed"] + i
        self.drafted += k * len(active)

        # verify phase: ONE paged target pass per round
        block_t = np.zeros((b, k + 1), np.int32)
        pos_t = np.zeros(b, np.int32)
        for s in active:
            st = slots[s]
            block_t[s, 0] = st["last"]
            block_t[s, 1:] = drafts[s]
            pos_t[s] = st["n_committed"] - 1
        t_logits, cache = srv.extend_paged(
            jnp.asarray(block_t), srv._cache(table), jnp.asarray(pos_t))
        srv._set_pools(cache)
        t_logits_np = np.asarray(t_logits)  # [b, k+1, V]
        draws = spec_draw_block(slots, t_logits_np)
        self.decode_steps += 1
        self.rounds += 1

        # accept/commit per row against the canonical chain
        for s in active:
            st = slots[s]
            j = 0
            while j < k and int(drafts[s, j]) == int(draws[s, j]):
                j += 1
            next_tok = int(draws[s, j])
            self.accepted += j
            commit = [int(d) for d in drafts[s, :j]] + [next_tok]
            in_draft = min(j, k - 1)
            st["lag"] = commit[in_draft:]
            for i, tok in enumerate(commit):
                if st["lps"] is not None:
                    st["lps"].append(token_logprob(t_logits_np[s, i],
                                                   tok))
                st["last"] = tok
                st["n_committed"] += 1
                pos[s] += 1
                self._push(s, st, np.asarray([[tok]]))
                if slots[s] is None:
                    break

"""Paged KV cache: shared page pools + per-row block tables.

The dense decode cache reserves batch x window slots up front; the paged
cache (nn/transformer.py paged branch, infer/paged.py allocator) reserves
pages on demand from a shared pool, so the pool oversubscribes. These
tests pin the load-bearing claims:

- decode through a paged cache with an ARBITRARY (shuffled) page
  assignment is bit-identical to the dense cache path, for MHA and GQA,
  prompt ingest (t > 1) and per-token decode alike;
- the allocator's invariants (trash page never handed out, free-list
  accounting, per-row growth, preemption frees everything);
- the paged continuous server equals the dense continuous server on
  mixed workloads even when a tight pool forces preemption.

No reference counterpart (the reference re-runs eager torch per token,
networks.py:727-754); this is the serving-memory rung of the framework's
own serving ladder (docs/DESIGN.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.nn.transformer import (Transformer, TransformerConfig,
                                      init_cache, init_paged_cache)


def _mk_model(n_kv_head=0, rope=False):
    cfg = TransformerConfig(in_size=29, block_size=16, n_layer=2, n_head=2,
                            n_embd=32, n_kv_head=n_kv_head, rope=rope,
                            pos_embed=not rope)
    model = Transformer(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 29)
    params = model.init(jax.random.PRNGKey(0), toks)["params"]
    return cfg, model, params


def _paged_with_table(cfg, batch, n_pages, page_size, table):
    base = init_paged_cache(cfg, batch, n_pages, page_size,
                            window=cfg.block_size)
    t = jnp.asarray(table, jnp.int32)
    return tuple((pk, pv, t) for pk, pv, _ in base)


@pytest.mark.parametrize("n_kv_head,rope", [(0, False), (1, True)])
def test_paged_decode_matches_dense(n_kv_head, rope):
    """Prompt ingest + 6 decode steps through a paged cache with shuffled
    page assignment == the dense cache chain, logits bit-for-bit."""
    cfg, model, params = _mk_model(n_kv_head, rope)
    b, t0, page = 2, 6, 4
    prompt = jax.random.randint(jax.random.PRNGKey(2), (b, t0), 0, 29)

    dense = init_cache(cfg, b)
    # shuffled, disjoint page ids (page 0 = trash, never assigned)
    table = np.asarray([[7, 3, 11, 5], [2, 9, 1, 13]], np.int32)
    paged = _paged_with_table(cfg, b, 16, page, table)

    pos0 = jnp.zeros(b, jnp.int32)
    logits_d, dense = model.apply({"params": params}, prompt, cache=dense,
                                  input_pos=pos0)
    logits_p, paged = model.apply({"params": params}, prompt, cache=paged,
                                  input_pos=pos0)
    np.testing.assert_array_equal(np.asarray(logits_d),
                                  np.asarray(logits_p))

    tok = jnp.argmax(logits_d[:, -1:], axis=-1).astype(jnp.int32)
    pos = jnp.full((b,), t0, jnp.int32)
    for _ in range(6):
        logits_d, dense = model.apply({"params": params}, tok, cache=dense,
                                      input_pos=pos)
        logits_p, paged = model.apply({"params": params}, tok, cache=paged,
                                      input_pos=pos)
        np.testing.assert_array_equal(np.asarray(logits_d),
                                      np.asarray(logits_p))
        tok = jnp.argmax(logits_d[:, -1:], axis=-1).astype(jnp.int32)
        pos = pos + 1


def test_paged_kernel_matches_gathered_reference():
    """paged_decode_attention (interpret mode) == masked-softmax einsum
    over the GATHERED dense view of the same pool, MHA + GQA, positions
    at page boundaries."""
    from tempo_tpu.ops.pallas_decode import paged_decode_attention

    rng = np.random.default_rng(0)
    for n, kv in ((4, 4), (8, 2)):
        b, hd, pg, n_pages, mp = 4, 16, 8, 20, 4
        q = jnp.asarray(rng.standard_normal((b, 1, n, hd)), jnp.float32)
        pk = jnp.asarray(rng.standard_normal((n_pages, pg, kv, hd)),
                         jnp.float32)
        pv = jnp.asarray(rng.standard_normal((n_pages, pg, kv, hd)),
                         jnp.float32)
        # distinct non-trash pages per row, deliberately shuffled
        table = jnp.asarray(
            1 + rng.permutation(n_pages - 1)[:b * mp].reshape(b, mp),
            jnp.int32)
        pos = jnp.asarray([0, 7, 8, 31], jnp.int32)  # page edges

        got = paged_decode_attention(q, pk, pv, table, pos, interpret=True)

        ck = pk[table].reshape(b, mp * pg, kv, hd)
        cv = pv[table].reshape(b, mp * pg, kv, hd)
        g = n // kv
        q_idx = pos[:, None] + jnp.arange(1)
        mask = jnp.arange(mp * pg)[None, None, :] <= q_idx[:, :, None]
        qg = q.reshape(b, 1, kv, g, hd)
        scores = jnp.einsum("bqkgh,bskh->bkgqs", qg, ck) / np.sqrt(hd)
        scores = jnp.where(mask[:, None, None], scores, -jnp.inf)
        want = jnp.einsum("bkgqs,bskh->bqkgh",
                          jax.nn.softmax(scores, axis=-1), cv
                          ).reshape(b, 1, n, hd)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


def test_paged_model_pallas_matches_xla():
    """decode_attn='pallas_interpret' through a paged cache == the XLA
    gathered-einsum paged path, over a short decode chain."""
    import dataclasses

    cfg, model, params = _mk_model(n_kv_head=1)
    model_k = Transformer(dataclasses.replace(
        cfg, decode_attn="pallas_interpret"))
    b, t0, page = 2, 5, 8
    prompt = jax.random.randint(jax.random.PRNGKey(3), (b, t0), 0, 29)
    table = np.asarray([[4, 2], [6, 1]], np.int32)
    c_x = _paged_with_table(cfg, b, 8, page, table)
    c_k = jax.tree_util.tree_map(lambda x: x, c_x)

    pos0 = jnp.zeros(b, jnp.int32)
    lx, c_x = model.apply({"params": params}, prompt, cache=c_x,
                          input_pos=pos0)
    lk, c_k = model_k.apply({"params": params}, prompt, cache=c_k,
                            input_pos=pos0)
    np.testing.assert_array_equal(np.asarray(lx), np.asarray(lk))
    tok = jnp.argmax(lx[:, -1:], axis=-1).astype(jnp.int32)
    pos = jnp.full((b,), t0, jnp.int32)
    for _ in range(4):
        lx, c_x = model.apply({"params": params}, tok, cache=c_x,
                              input_pos=pos)
        lk, c_k = model_k.apply({"params": params}, tok, cache=c_k,
                                input_pos=pos)
        np.testing.assert_allclose(np.asarray(lx), np.asarray(lk),
                                   atol=2e-5, rtol=2e-5)
        tok = jnp.argmax(lx[:, -1:], axis=-1).astype(jnp.int32)
        pos = pos + 1


@pytest.fixture(scope="module")
def paged_lm(tmp_path_factory):
    """One paged-artifact export for the server tests (page_size=8,
    window 32 -> 4 logical pages per row)."""
    from tempo_tpu.infer.export_lm import export_lm

    cfg = TransformerConfig(in_size=31, block_size=32, n_layer=2, n_head=2,
                            n_embd=32)
    model = Transformer(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 31)
    params = model.init(jax.random.PRNGKey(0), toks)["params"]
    return export_lm(params, cfg,
                     tmp_path_factory.mktemp("paged_export") / "lm",
                     decode_chunk=4, page_size=8)


@pytest.fixture(scope="module")
def draft_lm31(tmp_path_factory):
    """A smaller draft model sharing the paged fixture's vocab (31) and
    window (32) — for the paged x speculation composition."""
    from tempo_tpu.infer.export_lm import export_lm

    cfg = TransformerConfig(in_size=31, block_size=32, n_layer=1, n_head=2,
                            n_embd=16)
    model = Transformer(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(5), (2, 8), 0, 31)
    params = model.init(jax.random.PRNGKey(4), toks)["params"]
    return export_lm(params, cfg,
                     tmp_path_factory.mktemp("draft_export") / "lm")


def test_paged_speculative_matches_dense(paged_lm, draft_lm31):
    """Speculation composes with the paged pool: PagedLMServer with a
    dense-cache draft verifies per-slot blocks through extend_paged,
    and every request's output (greedy AND sampled — the canonical
    stream) equals the dense continuous server's; a self-draft accepts
    everything; a tight pool preempts without changing outputs."""
    from tempo_tpu.infer.paged import PagedLMServer
    from tempo_tpu.infer.serving import ContinuousLMServer

    reqs = [
        {"tokens": [3, 1, 4, 1, 5], "n_tokens": 12},
        {"tokens": [9, 2, 6], "n_tokens": 9,
         "temperature": 1.0, "top_k": 5, "seed": 3},
        {"tokens": [7, 7], "n_tokens": 11},
        {"tokens": [5], "n_tokens": 8, "temperature": 0.7, "top_p": 0.9,
         "seed": 11},
    ]
    base = ContinuousLMServer(paged_lm, n_slots=2).serve(reqs)

    srv = PagedLMServer(paged_lm, n_slots=2, draft_dir=draft_lm31,
                        k_draft=3)
    got = srv.serve(reqs)
    for rb, rp in zip(base, got):
        assert rb["tokens"] == rp["tokens"]
    assert srv.last_stats["rounds"] > 0
    assert srv.last_stats["drafted"] > 0

    # self-draft: acceptance 1.0, decode dispatches collapse
    self_srv = PagedLMServer(paged_lm, n_slots=2, draft_dir=paged_lm,
                             k_draft=3)
    got = self_srv.serve(reqs)
    for rb, rp in zip(base, got):
        assert rb["tokens"] == rp["tokens"]
    assert self_srv.last_stats["accept_rate"] == 1.0

    # tight pool: two long rows can't hold their peak pages together —
    # preemption fires, outputs unchanged (requeued requests replay the
    # canonical stream deterministically)
    long_reqs = [
        {"tokens": [3, 1, 4, 1, 5], "n_tokens": 12},
        {"tokens": [9, 2, 6, 5, 3, 5, 8], "n_tokens": 16,
         "temperature": 0.7, "seed": 5},
    ]
    long_base = ContinuousLMServer(paged_lm, n_slots=2).serve(long_reqs)
    tight = PagedLMServer(paged_lm, n_slots=2, n_pages=5,
                          draft_dir=draft_lm31, k_draft=3)
    got = tight.serve(long_reqs)
    assert tight.last_stats["preemptions"] > 0
    for rb, rp in zip(long_base, got):
        assert rb["tokens"] == rp["tokens"]

    # eos + stop + logprobs all compose with the speculative rounds
    eos = base[0]["tokens"][5]
    r = srv.serve([dict(reqs[0], eos=eos)])[0]
    first = base[0]["tokens"].index(eos) + 1
    assert r["tokens"] == base[0]["tokens"][:first] and r["stopped_early"]
    stop = base[0]["tokens"][3:5]
    r = srv.serve([dict(reqs[0], stop=stop)])[0]
    i0 = next(i for i in range(len(base[0]["tokens"]) - 1)
              if base[0]["tokens"][i:i + 2] == stop)
    assert r["tokens"] == base[0]["tokens"][:i0] and r["stopped_early"]
    r_lp = srv.serve([dict(reqs[0], logprobs=True)])[0]
    b_lp = ContinuousLMServer(paged_lm, n_slots=2).serve(
        [dict(reqs[0], logprobs=True)])[0]
    assert r_lp["tokens"] == b_lp["tokens"]
    np.testing.assert_allclose(r_lp["logprobs"], b_lp["logprobs"],
                               rtol=1e-5, atol=1e-6)

    # the write slack past the window is budgeted, not silently aliased
    with pytest.raises(ValueError, match="draft slack"):
        srv.serve([{"tokens": [1] * 10, "n_tokens": 20}])


def test_paged_chunked_prefill_matches_one_shot(paged_lm):
    """prefill_chunk composes with the paged pool: long prompts ingest
    straight into the row's pages through extend_paged in fixed chunks,
    bit-equal to one-shot admission — with and without a shared prefix,
    and under the fused k_decode path."""
    from tempo_tpu.infer.paged import PagedLMServer
    from tempo_tpu.infer.serving import ContinuousLMServer

    long_reqs = [
        {"tokens": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8], "n_tokens": 10},
        {"tokens": [9, 2, 6, 5, 3], "n_tokens": 6,
         "temperature": 1.0, "top_k": 5, "seed": 7},
    ]
    base = ContinuousLMServer(paged_lm, n_slots=2).serve(long_reqs)
    for kw in ({}, {"k_decode": 4}):
        srv = PagedLMServer(paged_lm, n_slots=2, prefill_chunk=4, **kw)
        got = srv.serve(long_reqs)
        for rb, rp in zip(base, got):
            assert rb["tokens"] == rp["tokens"]

    # chunked ingest of a prefix tail + prompt over shared pages
    prefix = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]  # 1 full page + 2 tail
    req = {"tokens": [7, 7, 1, 2, 3], "n_tokens": 6, "prefix": prefix}
    cat = {"tokens": prefix + req["tokens"], "n_tokens": 6}
    want = ContinuousLMServer(paged_lm, n_slots=2).serve([cat])[0]
    srv = PagedLMServer(paged_lm, n_slots=2, prefill_chunk=4)
    got = srv.serve([req])[0]
    assert got["tokens"] == want["tokens"]


def test_serve_lm_cli_paged_speculative_chunked(tmp_path, paged_lm,
                                                draft_lm31):
    """The serving CLI composes scheduler: paged + draft_artifacts +
    k_draft + prefill_chunk in one config — the round-4 FATAL matrix
    holes — and the completions match the dense continuous server."""
    import json

    from tempo_tpu.cli.serve_lm import main as serve_main
    from tempo_tpu.infer.serving import ContinuousLMServer
    from tempo_tpu.utils.config import load_config, save_yaml

    reqs = [{"tokens": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3], "n_tokens": 8},
            {"tokens": [9, 2, 6], "n_tokens": 6,
             "temperature": 0.7, "seed": 1}]
    req_path = tmp_path / "requests.jsonl"
    req_path.write_text("\n".join(json.dumps(r) for r in reqs) + "\n")
    cfg_path = tmp_path / "serve.yaml"
    save_yaml({"output_dir": str(tmp_path / "served"),
               "artifacts": str(paged_lm), "mode": "batch",
               "scheduler": "paged", "slots": 2, "n_pages": 7,
               "draft_artifacts": str(draft_lm31), "k_draft": 2,
               "prefill_chunk": 4,
               "requests": str(req_path)}, cfg_path)
    serve_main(str(cfg_path))

    lines = [json.loads(l) for l in
             (tmp_path / "served" / "completions.jsonl").read_text()
             .splitlines()]
    base = ContinuousLMServer(paged_lm, n_slots=2).serve(reqs)
    for got, want in zip(lines, base):
        assert got["tokens"] == want["tokens"]
    info = load_config(str(tmp_path / "served" / "serving_info.yaml"))
    assert info["scheduler_stats"]["rounds"] > 0


def test_page_pool_invariants():
    from tempo_tpu.infer.paged import TRASH_PAGE, PagePool

    pool = PagePool(5)
    assert pool.n_usable == 4 and pool.n_free == 4
    got = [pool.alloc() for _ in range(4)]
    assert sorted(got) == [1, 2, 3, 4]  # trash page 0 never handed out
    assert TRASH_PAGE not in got
    assert pool.alloc() is None and pool.n_free == 0
    pool.free([got[0]])
    assert pool.n_free == 1 and pool.alloc() == got[0]
    with pytest.raises(AssertionError, match="double free"):
        pool.free([got[1], got[1]])
    with pytest.raises(AssertionError, match="trash"):
        pool.free([TRASH_PAGE])


def test_paged_server_matches_dense_continuous(paged_lm):
    """PagedLMServer == ContinuousLMServer per request, on a roomy pool
    (no preemption) AND a tight pool where slots oversubscribe the pool
    and the scheduler must preempt — greedy, sampled, and eos requests
    alike (preempted requests replay their streams deterministically)."""
    from tempo_tpu.infer.paged import PagedLMServer
    from tempo_tpu.infer.serving import ContinuousLMServer

    reqs = [
        {"tokens": [3, 1, 4, 1, 5], "n_tokens": 17},
        {"tokens": [9, 2, 6], "n_tokens": 11,
         "temperature": 1.0, "top_k": 5, "seed": 3},
        {"tokens": [7, 7], "n_tokens": 20},
        {"tokens": [1, 2, 3, 4], "n_tokens": 5},
        {"tokens": [5], "n_tokens": 9, "temperature": 0.7, "top_p": 0.9,
         "seed": 11},
    ]
    dense = ContinuousLMServer(paged_lm, n_slots=2)
    base = dense.serve(reqs)
    eos = base[0]["tokens"][7]
    reqs = reqs + [{"tokens": [3, 1, 4, 1, 5], "n_tokens": 17, "eos": eos}]
    base = dense.serve(reqs)

    roomy = PagedLMServer(paged_lm, n_slots=2)
    got = roomy.serve(reqs)
    assert roomy.last_stats["preemptions"] == 0
    for rb, rp in zip(base, got):
        assert rb["tokens"] == rp["tokens"]
        assert rb["stopped_early"] == rp["stopped_early"]

    # 4 usable pages < the 5-page two-slot peak: must preempt, and the
    # peak page hold must respect the pool cap
    tight = PagedLMServer(paged_lm, n_slots=2, n_pages=5)
    got = tight.serve(reqs)
    assert tight.last_stats["preemptions"] > 0
    assert tight.last_stats["peak_pages"] <= 4
    for rb, rp in zip(base, got):
        assert rb["tokens"] == rp["tokens"]

    # a request that cannot fit the pool at all is refused up front
    with pytest.raises(ValueError, match="pages"):
        PagedLMServer(paged_lm, n_slots=1, n_pages=3).serve(
            [{"tokens": [1] * 10, "n_tokens": 20}])


def test_paged_k_decode_matches_dense_fused(paged_lm):
    """The two serving levers compose: PagedLMServer(k_decode=4) — fused
    K-token dispatch over the paged cache — equals the dense
    ContinuousLMServer(k_decode=4) per request (greedy rows AND sampled
    rows: the device threefry stream is keyed by (seed, absolute
    position), so it is invariant to cache layout, pool size, and
    preemption), with fewer device dispatches than per-token paged."""
    from tempo_tpu.infer.paged import PagedLMServer
    from tempo_tpu.infer.serving import ContinuousLMServer

    reqs = [
        {"tokens": [3, 1, 4, 1, 5], "n_tokens": 17},
        {"tokens": [9, 2, 6], "n_tokens": 11,
         "temperature": 1.0, "top_k": 5, "seed": 3},
        {"tokens": [7, 7], "n_tokens": 20},
        {"tokens": [5], "n_tokens": 9, "temperature": 0.7, "top_p": 0.9,
         "seed": 11},
    ]
    dense = ContinuousLMServer(paged_lm, n_slots=2, k_decode=4)
    base = dense.serve(reqs)

    per_token = PagedLMServer(paged_lm, n_slots=2)
    per_token.serve(reqs)

    roomy = PagedLMServer(paged_lm, n_slots=2, k_decode=4)
    got = roomy.serve(reqs)
    for rb, rp in zip(base, got):
        assert rb["tokens"] == rp["tokens"]
    assert (roomy.last_stats["decode_steps"]
            < per_token.last_stats["decode_steps"])

    # tight pool: chunked dispatch must pre-reserve every page the K
    # writes touch, preempting as needed — outputs unchanged
    tight = PagedLMServer(paged_lm, n_slots=2, n_pages=5, k_decode=4)
    got = tight.serve(reqs)
    assert tight.last_stats["preemptions"] > 0
    assert tight.last_stats["peak_pages"] <= 4
    for rb, rp in zip(base, got):
        assert rb["tokens"] == rp["tokens"]


def test_paged_admission_logits_bitwise(paged_lm):
    """Admission must land the FULL prompt KV in the allocated pages:
    after prefill + admit_paged + one decode, the logits equal the dense
    decode_rows path BITWISE, for a prompt longer than one page. (The
    tiny model's greedy chains are attractors — token-level pins missed
    a ceil/floor slip that sent admission pages to the trash; this pin
    is the sharp version. The sampled-equality pins below also catch
    it statistically.)"""
    from tempo_tpu.infer.export_lm import (load_exported_continuous,
                                           load_exported_paged)

    out = paged_lm
    pre, dp, ap, meta = load_exported_paged(out)
    _, rows, _, _ = load_exported_continuous(out)
    pg, mp = int(meta["page_size"]), 32 // int(meta["page_size"])

    prompt = jnp.asarray([[5, 3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]], jnp.int32)
    t0 = prompt.shape[1]           # 12 tokens -> 2 pages of 8
    logits, row = pre(prompt)

    pool_shape = (7, pg, int(meta.get("n_kv_head") or meta["n_head"]),
                  int(meta["n_embd"]) // int(meta["n_head"]))
    z = jnp.zeros(pool_shape, jnp.dtype(meta["compute_dtype"]))
    table = np.zeros((1, mp), np.int32)
    cache = tuple((z, z, jnp.asarray(table))
                  for _ in range(int(meta["n_layer"])))
    pages = np.asarray([4, 2, 0, 0], np.int32)  # shuffled, 2 live pages
    cache = ap(cache, row, jnp.asarray(pages))
    table[0, :2] = [4, 2]
    cache = tuple((pk, pv, jnp.asarray(table)) for pk, pv, _ in cache)

    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    pos = jnp.asarray([t0], jnp.int32)
    l_dense, _ = rows(tok, row, pos)      # dense cache IS the row cache
    l_paged, _ = dp(tok, cache, pos)
    np.testing.assert_array_equal(np.asarray(l_dense), np.asarray(l_paged))


def test_paged_prefix_sharing(paged_lm):
    """Page-aligned shared-prefix caching: requests carrying the same
    'prefix' share its full pages read-only (one registry build, then
    hits), outputs equal the dense continuous server on the concatenated
    prompts, peak page usage drops vs no sharing, preemption composes,
    and idle shared pages are evicted under pool pressure."""
    from tempo_tpu.infer.paged import PagedLMServer
    from tempo_tpu.infer.serving import ContinuousLMServer

    prefix = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]  # page 8: 1 shared + 2 tail
    reqs_pfx = [
        {"tokens": [7, 7], "n_tokens": 8, "prefix": prefix},
        {"tokens": [1, 2, 3], "n_tokens": 6, "prefix": prefix},
        {"tokens": [4], "n_tokens": 7, "prefix": prefix,
         "temperature": 1.0, "top_k": 5, "seed": 3},
    ]
    reqs_cat = [dict({k: v for k, v in r.items() if k != "prefix"},
                     tokens=prefix + list(r["tokens"])) for r in reqs_pfx]
    base = ContinuousLMServer(paged_lm, n_slots=2).serve(reqs_cat)

    srv = PagedLMServer(paged_lm, n_slots=2)
    got = srv.serve(reqs_pfx)
    for rb, rp in zip(base, got):
        assert rb["tokens"] == rp["tokens"]
    stats = srv.last_stats
    assert stats["shared_prefix_pages"] == 1
    assert stats["prefix_hits"] == 2  # built once, hit twice

    # memory: sharing beats the same-shape workload without a common
    # head (first tokens perturbed so AUTO-detection cannot share the
    # concatenated prompts either)
    unshared = PagedLMServer(paged_lm, n_slots=2)
    uniq = [dict(r, tokens=[i] + list(r["tokens"][1:]))
            for i, r in enumerate(reqs_cat)]
    unshared.serve(uniq)
    assert stats["peak_pages"] < unshared.last_stats["peak_pages"]

    # a pool too tight for both rows' private pages: preemption fires,
    # outputs unchanged (shared pages survive the preemption)
    tight = PagedLMServer(paged_lm, n_slots=2, n_pages=5)
    got = tight.serve(reqs_pfx)
    assert tight.last_stats["preemptions"] > 0
    for rb, rp in zip(base, got):
        assert rb["tokens"] == rp["tokens"]

    # idle shared pages are the last-resort eviction victim: a later
    # no-prefix workload that needs the whole pool reclaims them
    small = PagedLMServer(paged_lm, n_slots=1, n_pages=4)
    small.serve([{"tokens": [7, 7], "n_tokens": 6, "prefix": prefix}])
    assert small.last_stats["shared_prefix_pages"] == 1
    want = ContinuousLMServer(paged_lm, n_slots=1).serve(
        [{"tokens": [1] * 9, "n_tokens": 14}])[0]
    r = small.serve([{"tokens": [1] * 9, "n_tokens": 14}])[0]
    assert r["tokens"] == want["tokens"]
    assert small.last_stats["shared_prefix_pages"] == 0  # evicted


def test_paged_automatic_prefix_sharing(paged_lm):
    """Prefix sharing WITHOUT a 'prefix' field: requests whose prompts
    share a page-aligned head (a common system prompt) are detected at
    admission, the shared pages are built once and refcounted, outputs
    are pinned unchanged vs the dense continuous server, peak page use
    drops vs unshared admission, and the registry persists across
    serve() calls (a later lone request still hits it) while remaining
    idle-evictable under pool pressure."""
    from tempo_tpu.infer.paged import PagedLMServer
    from tempo_tpu.infer.serving import ContinuousLMServer

    system = [3, 1, 4, 1, 5, 9, 2, 6]  # exactly one 8-token page
    reqs = [
        {"tokens": system + [7, 7], "n_tokens": 8},
        {"tokens": system + [1, 2, 3], "n_tokens": 6},
        {"tokens": system + [4], "n_tokens": 7,
         "temperature": 1.0, "top_k": 5, "seed": 3},
    ]
    base = ContinuousLMServer(paged_lm, n_slots=2).serve(reqs)

    srv = PagedLMServer(paged_lm, n_slots=2)
    got = srv.serve(reqs)
    for rb, rp in zip(base, got):
        assert rb["tokens"] == rp["tokens"]
    stats = srv.last_stats
    assert stats["auto_prefixes"] == 3
    assert stats["shared_prefix_pages"] == 1  # built once
    assert stats["prefix_hits"] == 2          # ...then hit twice

    # memory: sharing beats the same workload with detection disabled
    # (simulate by making prompts differ in their first page)
    unshared = PagedLMServer(paged_lm, n_slots=2)
    uniq = [dict(r, tokens=[i] + list(r["tokens"][1:]))
            for i, r in enumerate(reqs)]
    unshared.serve(uniq)
    assert stats["peak_pages"] < unshared.last_stats["peak_pages"]

    # cross-call: a LONE request with the same head hits the registry
    r = srv.serve([{"tokens": system + [7, 7], "n_tokens": 8}])[0]
    assert r["tokens"] == base[0]["tokens"]
    assert srv.last_stats["auto_prefixes"] == 1
    assert srv.last_stats["prefix_hits"] == 1

    # a prompt that IS exactly the shared head keeps >= 1 private
    # token to prefill (no zero-length ingest)
    r2 = srv.serve([{"tokens": system, "n_tokens": 4},
                    {"tokens": system, "n_tokens": 4}])
    want = ContinuousLMServer(paged_lm, n_slots=2).serve(
        [{"tokens": system, "n_tokens": 4}])[0]
    assert r2[0]["tokens"] == want["tokens"]
    assert r2[1]["tokens"] == want["tokens"]

    # idle shared pages still evict under pressure
    small = PagedLMServer(paged_lm, n_slots=1, n_pages=4)
    small.serve([{"tokens": system + [7, 7], "n_tokens": 4},
                 {"tokens": system + [1], "n_tokens": 4}])
    assert small.last_stats["shared_prefix_pages"] == 1
    lone = ContinuousLMServer(paged_lm, n_slots=1).serve(
        [{"tokens": [1] * 9, "n_tokens": 14}])[0]
    got = small.serve([{"tokens": [1] * 9, "n_tokens": 14}])[0]
    assert got["tokens"] == lone["tokens"]
    assert small.last_stats["shared_prefix_pages"] == 0  # evicted


def test_live_surface_matches_artifacts(paged_lm):
    """export_lm.live_paged_surface (weights as jit arguments — the
    checkpoint-direct / relay-safe serving form) drives PagedLMServer
    to the same outputs as the deserialized baked-weight artifacts,
    across chunked prefill + fused k_decode + sampled rows."""
    from tempo_tpu.infer.export_lm import live_paged_surface
    from tempo_tpu.infer.paged import PagedLMServer

    cfg = TransformerConfig(in_size=31, block_size=32, n_layer=2,
                            n_head=2, n_embd=32)
    model = Transformer(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 31)
    params = model.init(jax.random.PRNGKey(0), toks)["params"]

    surface = live_paged_surface(params, cfg, max_seq=32, decode_chunk=4,
                                 page_size=8)
    reqs = [
        {"tokens": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3], "n_tokens": 8},
        {"tokens": [9, 2, 6], "n_tokens": 6,
         "temperature": 1.0, "top_k": 5, "seed": 3},
    ]
    live = PagedLMServer(surface=surface, n_slots=2, k_decode=4,
                         prefill_chunk=4).serve(reqs)
    # paged_lm exports the IDENTICAL params/config (same seeds/shapes)
    base = PagedLMServer(paged_lm, n_slots=2, k_decode=4,
                         prefill_chunk=4).serve(reqs)
    assert [r["tokens"] for r in live] == [r["tokens"] for r in base]


def test_paged_drain_chaining_matches_dense(paged_lm):
    """Drain chaining over the paged pool: with nothing pending and
    pages free, several fused chunks dispatch per host sync (pages
    pre-reserved for the whole burst WITHOUT preemption); outputs stay
    identical to the dense continuous server, greedy and sampled."""
    from tempo_tpu.infer.paged import PagedLMServer
    from tempo_tpu.infer.serving import ContinuousLMServer

    reqs = [{"tokens": [7, 7], "n_tokens": 25},
            {"tokens": [3, 1], "n_tokens": 25,
             "temperature": 1.0, "top_k": 5, "seed": 11}]
    base = ContinuousLMServer(paged_lm, n_slots=2).serve(reqs)
    srv = PagedLMServer(paged_lm, n_slots=2, k_decode=4)
    got = srv.serve(reqs)
    for rb, rp in zip(base, got):
        assert rb["tokens"] == rp["tokens"]
    stats = srv.last_stats
    assert stats["decode_bursts"] < stats["decode_steps"]

    # a tight pool limits the burst's page appetite but never corrupts:
    # outputs unchanged
    tight = PagedLMServer(paged_lm, n_slots=2, n_pages=6, k_decode=4)
    got = tight.serve(reqs)
    for rb, rp in zip(base, got):
        assert rb["tokens"] == rp["tokens"]


def test_online_paged_server(paged_lm, draft_lm31):
    """Online x paged — the last cell of the scheduler x mode matrix:
    OnlineLMServer drives a PagedLMEngine, so concurrent callers share
    one running PAGED batch (tight pool included). Every request comes
    back identical to the dense continuous server; cancellation
    releases the slot's pages mid-flight; the speculative paged engine
    rides the same front."""
    import threading

    from tempo_tpu.infer.serving import ContinuousLMServer, OnlineLMServer

    reqs = [
        {"tokens": [3, 1, 4, 1, 5], "n_tokens": 12},
        {"tokens": [9, 2, 6], "n_tokens": 9,
         "temperature": 1.0, "top_k": 5, "seed": 3},
        {"tokens": [7, 7], "n_tokens": 11},
        {"tokens": [5], "n_tokens": 8, "temperature": 0.7, "top_p": 0.9,
         "seed": 11},
    ]
    base = ContinuousLMServer(paged_lm, n_slots=2).serve(reqs)

    for kw in ({"n_pages": 5, "k_decode": 4},       # tight pool + fused
               {"draft_dir": draft_lm31, "k_draft": 3}):  # speculation
        online = OnlineLMServer(paged_lm, n_slots=2, scheduler="paged",
                                **kw)
        try:
            results: list = [None] * len(reqs)

            def worker(i):
                results[i] = online.generate(reqs[i], timeout=300)

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(len(reqs))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(300)
            for i, (rb, rp) in enumerate(zip(base, results)):
                assert rp is not None, (kw, i)
                assert rb["tokens"] == rp["tokens"], (kw, i)
        finally:
            online.close()

    # cancellation mid-flight frees the slot's pages: the pool drains
    # back to fully free once everything else completes
    online = OnlineLMServer(paged_lm, n_slots=1, scheduler="paged")
    try:
        t_a = online.submit({"tokens": [3, 1, 4, 1, 5], "n_tokens": 24})
        t_b = online.submit({"tokens": [7, 7], "n_tokens": 5})
        with online._cond:
            assert online._cond.wait_for(
                lambda: any(st is not None and st["ticket"] == t_a
                            for st in online._engine.slots), timeout=60)
            assert online._engine.cancel(t_a)
            online._cond.notify_all()
        r_a = online.result(t_a, timeout=60)
        assert r_a["cancelled"]
        want = ContinuousLMServer(paged_lm, n_slots=1).serve(
            [{"tokens": [7, 7], "n_tokens": 5}])[0]
        r_b = online.result(t_b, timeout=120)
        assert r_b["tokens"] == want["tokens"]
        assert online._server.pool.n_free == online._server.pool.n_usable
    finally:
        online.close()


def test_paged_stop_sequences(paged_lm):
    """Multi-token 'stop' through the paged scheduler (incl. the fused
    chunked path): same truncation as the dense continuous server."""
    from tempo_tpu.infer.paged import PagedLMServer
    from tempo_tpu.infer.serving import ContinuousLMServer

    req = {"tokens": [3, 1, 4, 1, 5], "n_tokens": 17}
    base = ContinuousLMServer(paged_lm, n_slots=2).serve([req])[0]["tokens"]
    stop = base[3:5]
    i0 = next(i for i in range(len(base) - 1) if base[i:i + 2] == stop)
    for kw in ({}, {"k_decode": 4}):
        r = PagedLMServer(paged_lm, n_slots=2, **kw).serve(
            [dict(req, stop=stop)])[0]
        assert r["tokens"] == base[:i0] and r["stopped_early"]


def test_paged_admission_evicts_idle_prefix(paged_lm):
    """Regression (round-4 advisor, high): idle shared-prefix registry
    pages survive across serve() calls at the registry's base refcount.
    On a tight pool they can hold enough pages that a _validate-accepted
    plain request cannot clear the admission gate — the sweep must evict
    the idle registry instead of stalling the whole batch."""
    from tempo_tpu.infer.paged import PagedLMServer
    from tempo_tpu.infer.serving import ContinuousLMServer

    prefix = [2] * 16  # exactly 2 full pages at page_size=8
    srv = PagedLMServer(paged_lm, n_slots=2, n_pages=4)  # 3 usable
    srv.serve([{"tokens": [7, 3], "n_tokens": 4, "prefix": prefix}])
    assert srv.last_stats["shared_prefix_pages"] == 2

    # n_free is now 1 < the 2 private pages this prompt needs: before
    # the fix this raised 'scheduler stalled with free slots'
    req = {"tokens": [1] * 12, "n_tokens": 6}
    want = ContinuousLMServer(paged_lm, n_slots=2).serve([req])[0]
    got = srv.serve([req])[0]
    assert got["tokens"] == want["tokens"]
    assert srv.last_stats["shared_prefix_pages"] == 0  # evicted


def test_paged_logprobs(paged_lm):
    """'logprobs' through the paged scheduler equals the dense
    continuous server's (paged logits are pinned bitwise to dense, so
    the logprobs follow). The fused-k paged server keeps logprob
    requests on the chunked dispatch (device-f32 chosen-token logprobs
    vs the per-token host-f64 recompute — same values to fp rounding)."""
    from tempo_tpu.infer.paged import PagedLMServer
    from tempo_tpu.infer.serving import ContinuousLMServer

    req = {"tokens": [3, 1, 4, 1, 5], "n_tokens": 8, "logprobs": True}
    r_d = ContinuousLMServer(paged_lm, n_slots=2).serve([req])[0]
    fused = PagedLMServer(paged_lm, n_slots=2, k_decode=4)
    r_p = fused.serve([req])[0]
    assert r_p["tokens"] == r_d["tokens"]
    np.testing.assert_allclose(r_p["logprobs"], r_d["logprobs"],
                               rtol=1e-5, atol=1e-6)
    # 7 post-prefill tokens / 4-token chunks = 2 fused dispatches
    assert fused.last_stats["decode_steps"] == 2


def test_paged_rows_isolated():
    """A row writing through its table never perturbs another row's
    logits (pages are disjoint; trash-page collisions are invisible)."""
    cfg, model, params = _mk_model()
    page = 4
    prompt = jnp.asarray([[3, 1, 4, 1], [3, 1, 4, 1]], jnp.int32)
    # row 1 parked on all-trash: its writes land on page 0 only
    table = np.asarray([[5, 6, 7, 8], [0, 0, 0, 0]], np.int32)
    paged = _paged_with_table(cfg, 2, 10, page, table)
    logits, paged = model.apply({"params": params}, prompt, cache=paged,
                                input_pos=jnp.zeros(2, jnp.int32))
    # identical prompts, row 0 on real pages vs row 1 on trash: the
    # FIRST call's logits agree (mask hides unwritten slots both ways)
    np.testing.assert_array_equal(np.asarray(logits[0]),
                                  np.asarray(logits[1]))
    # decode row 0 further; its chain must stay self-consistent even as
    # row 1 keeps clobbering the trash page
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    pos = jnp.full((2,), 4, jnp.int32)
    logits2, paged = model.apply({"params": params}, tok, cache=paged,
                                 input_pos=pos)

    dense = init_cache(cfg, 2)
    ld, dense = model.apply({"params": params}, prompt, cache=dense,
                            input_pos=jnp.zeros(2, jnp.int32))
    ld2, dense = model.apply({"params": params}, tok, cache=dense,
                             input_pos=pos)
    np.testing.assert_array_equal(np.asarray(logits2[0]),
                                  np.asarray(ld2[0]))

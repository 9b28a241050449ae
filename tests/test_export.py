"""AOT serving export: the serialized StableHLO codec must reproduce the
live model exactly and serve any batch size from one artifact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.models.vae import AutoencoderKL, VAEConfig

TINY = VAEConfig(shape=(8, 16, 16), chs=(12, 8, 8), z_channels=4,
                 embed_dim=4, n_attention_heads=2, norm_groups=4,
                 compute_dtype="float32")


def test_export_roundtrip(tmp_path):
    from tempo_tpu.infer.export_codec import export_codec, load_exported

    model = AutoencoderKL(TINY)
    x = np.random.default_rng(0).standard_normal(
        (2, 16, 16, 8)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        rng=jax.random.PRNGKey(1))["params"]

    out = export_codec(params, TINY, tmp_path / "codec", tile_hw=(16, 16))
    assert (out / "encode.stablehlo").exists()
    assert (out / "decode.stablehlo").exists()

    encode, decode, meta = load_exported(out)
    assert meta["spectral_channels"] == 8
    assert meta["downsample_factor"] == 4

    want_z = model.apply({"params": params}, jnp.asarray(x),
                         method=AutoencoderKL.encode).mean
    got_z = encode(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_z), np.asarray(want_z),
                               atol=1e-6)

    want_rec = model.apply({"params": params}, want_z,
                           method=AutoencoderKL.decode)
    got_rec = decode(got_z)
    assert got_rec.shape == (2, 16, 16, 8)
    np.testing.assert_allclose(np.asarray(got_rec), np.asarray(want_rec),
                               atol=1e-6)

    # one artifact serves other batch sizes (symbolic batch dim)
    x5 = np.random.default_rng(1).standard_normal(
        (5, 16, 16, 8)).astype(np.float32)
    z5 = encode(jnp.asarray(x5))
    assert z5.shape == (5, 4, 4, 4)
    want5 = model.apply({"params": params}, jnp.asarray(x5),
                        method=AutoencoderKL.encode).mean
    np.testing.assert_allclose(np.asarray(z5), np.asarray(want5), atol=1e-6)


def test_lm_export_roundtrip(tmp_path):
    """GPT AOT serving export: prefill + decode_step StableHLO artifacts
    reproduce the direct KV-cache greedy decode exactly, at a batch size
    and prompt length never seen at export time (symbolic dims)."""
    from tempo_tpu.infer.export_lm import (export_lm, greedy_decode_exported,
                                           load_exported_lm)
    from tempo_tpu.nn.transformer import (Transformer, TransformerConfig,
                                          generate)

    cfg = TransformerConfig(in_size=31, block_size=32, n_layer=2, n_head=2,
                            n_embd=32)
    model = Transformer(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 31)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]

    out = export_lm(params, cfg, tmp_path / "lm")
    assert (out / "prefill.stablehlo").exists()
    assert (out / "decode_step.stablehlo").exists()

    _, _, meta = load_exported_lm(out)
    assert meta["vocab_size"] == 31 and meta["block_size"] == 32

    # batch 3, prompt 5 — neither seen at export time
    prompt = jax.random.randint(jax.random.PRNGKey(2), (3, 5), 0, 31)
    got = greedy_decode_exported(out, prompt, 6)
    ref = np.asarray(generate(model, params, prompt, 6,
                              rng=jax.random.PRNGKey(9), temperature=0.0))
    np.testing.assert_array_equal(got, ref)


def test_lm_export_decode_bound(tmp_path):
    """The exported serving loop refuses to decode past the block size
    (where the clamped cache writes would silently go stale)."""
    import pytest

    from tempo_tpu.infer.export_lm import export_lm, greedy_decode_exported
    from tempo_tpu.nn.transformer import Transformer, TransformerConfig

    cfg = TransformerConfig(in_size=13, block_size=12, n_layer=1, n_head=2,
                            n_embd=16)
    model = Transformer(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 4), 0, 13)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    out = export_lm(params, cfg, tmp_path / "lm")

    with pytest.raises(ValueError, match="serving window"):
        greedy_decode_exported(out, tokens, 9)  # 4 + 9 > 12
    np.testing.assert_array_equal(
        greedy_decode_exported(out, tokens, 0), np.asarray(tokens))

    # a request-sized cache (max_seq < block_size) is exact within its
    # window and refuses beyond it
    out8 = export_lm(params, cfg, tmp_path / "lm8", max_seq=8)
    np.testing.assert_array_equal(
        greedy_decode_exported(out8, tokens, 4),
        greedy_decode_exported(out, tokens, 4))
    with pytest.raises(ValueError, match="serving window"):
        greedy_decode_exported(out8, tokens, 5)  # 4 + 5 > 8


def _tiny_lm_export(tmp_path):
    from tempo_tpu.infer.export_lm import export_lm
    from tempo_tpu.nn.transformer import Transformer, TransformerConfig

    cfg = TransformerConfig(in_size=31, block_size=32, n_layer=2, n_head=2,
                            n_embd=32)
    model = Transformer(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 31)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    return export_lm(params, cfg, tmp_path / "lm"), model, params, cfg


@pytest.fixture(scope="module")
def tiny_lm(tmp_path_factory):
    """One shared export for every read-only serving test: the 6-artifact
    export costs ~30 s on this 1-core host, and nothing below mutates the
    artifact directory (servers only deserialize)."""
    return _tiny_lm_export(tmp_path_factory.mktemp("lm_export"))


@pytest.fixture(scope="module")
def draft_lm(tmp_path_factory):
    return _draft_lm_export(tmp_path_factory.mktemp("draft_export"))


def test_lm_server_policies_and_bucketing(tmp_path, tiny_lm):
    """LMServer: greedy matches the reference serving loop; seeded
    sampling is reproducible and respects top-k support; mixed-length
    request lists bucket into batched chains with order preserved."""
    import pytest

    from tempo_tpu.infer.export_lm import greedy_decode_exported
    from tempo_tpu.infer.serving import LMServer

    out, model, params, cfg = tiny_lm
    server = LMServer(out)

    prompt = np.asarray([[3, 1, 4, 1, 5], [9, 2, 6, 5, 3]], np.int32)
    got = server.generate_batch(prompt, 6)
    ref = greedy_decode_exported(out, prompt, 6)[:, 5:]
    np.testing.assert_array_equal(got, ref)

    # seeded sampling: reproducible, in-vocab, and distinct from greedy
    s1 = server.generate_batch(prompt, 6, temperature=1.0, top_k=5, seed=7)
    s2 = server.generate_batch(prompt, 6, temperature=1.0, top_k=5, seed=7)
    np.testing.assert_array_equal(s1, s2)
    assert s1.min() >= 0 and s1.max() < cfg.in_size

    # the fused sampled path (decode_k_sample): top_k=1 collapses the
    # support to the argmax, so the device-sampled chain must equal the
    # greedy chain exactly — a functional pin on the fused sampler
    assert server.decode_k_sample is not None
    g = server.generate_batch(prompt, 12)
    k1 = server.generate_batch(prompt, 12, temperature=1.0, top_k=1,
                               seed=9)
    np.testing.assert_array_equal(g, k1)
    # absolute-position key schedule: a longer call extends the shorter
    # one (the stream does not depend on max_new_tokens or chunking)
    long = server.generate_batch(prompt, 20, temperature=1.0, top_k=5,
                                 seed=7)
    short = server.generate_batch(prompt, 12, temperature=1.0, top_k=5,
                                  seed=7)
    np.testing.assert_array_equal(long[:, :12], short)

    # guards
    with pytest.raises(ValueError, match="serving window"):
        server.generate_batch(prompt, 28)
    with pytest.raises(ValueError, match="token ids"):
        server.generate_batch(np.full((1, 3), 99, np.int32), 2)

    # bucketing: 2 lengths + 2 sampling configs -> per-request results
    # equal the unbatched calls, in request order
    reqs = [
        {"tokens": [3, 1, 4, 1, 5], "n_tokens": 4},
        {"tokens": [9, 2, 6], "n_tokens": 4},
        {"tokens": [9, 2, 6, 5, 3], "n_tokens": 4},
        {"tokens": [1, 1, 2], "n_tokens": 4, "temperature": 1.0, "seed": 3},
    ]
    resp = server.serve_requests(reqs)
    assert len(resp) == 4
    assert resp[0]["batch"] == 2 and resp[2]["batch"] == 2  # same bucket
    for i in (0, 1, 2):
        solo = server.generate_batch(
            np.asarray([reqs[i]["tokens"]], np.int32), 4)
        np.testing.assert_array_equal(np.asarray([resp[i]["tokens"]]), solo)


def test_lm_server_beam_matches_live(tmp_path, tiny_lm):
    """Serving beam decode (LMServer.beam_batch over the StableHLO
    artifacts + host scoring + jitted cache gather) pinned token-for-token
    against the live-model nn.beam.beam_search, with and without eos, and
    exposed through serve_requests ('beam_width')."""
    from tempo_tpu.infer.serving import LMServer
    from tempo_tpu.nn.beam import beam_search

    out, model, params, cfg = tiny_lm
    server = LMServer(out)
    prompt = np.asarray([[3, 1, 4, 1, 5], [9, 2, 6, 5, 3]], np.int32)
    k, n_new = 3, 6

    live_seqs, live_scores = beam_search(model, params,
                                         jnp.asarray(prompt), n_new, k)
    got_toks, got_scores = server.beam_batch(prompt, n_new, k)
    np.testing.assert_array_equal(got_toks,
                                  np.asarray(live_seqs)[:, :, 5:])
    np.testing.assert_allclose(got_scores, np.asarray(live_scores),
                               atol=1e-4)

    # width 1 == greedy serving decode
    g1, _ = server.beam_batch(prompt, n_new, 1)
    np.testing.assert_array_equal(g1[:, 0],
                                  server.generate_batch(prompt, n_new))

    # eos semantics match the live path too (greedy first token as eos
    # guarantees at least one beam finishes immediately)
    eos = int(server.generate_batch(prompt[:1], 1)[0, 0])
    live_e, live_es = beam_search(model, params, jnp.asarray(prompt[:1]),
                                  n_new, k, eos_id=eos)
    got_e, got_es = server.beam_batch(prompt[:1], n_new, k, eos_id=eos)
    np.testing.assert_array_equal(got_e, np.asarray(live_e)[:, :, 5:])
    np.testing.assert_allclose(got_es, np.asarray(live_es), atol=1e-4)

    # request-level surface: best hypothesis is 'tokens', all k under
    # 'beams'/'scores'; non-beam requests in the same list are unaffected
    resp = server.serve_requests([
        {"tokens": prompt[0].tolist(), "n_tokens": n_new, "beam_width": k},
        {"tokens": prompt[1].tolist(), "n_tokens": n_new},
    ])
    np.testing.assert_array_equal(np.asarray(resp[0]["tokens"]),
                                  got_toks[0, 0])
    assert len(resp[0]["beams"]) == k and len(resp[0]["scores"]) == k
    assert "beams" not in resp[1]
    import pytest

    with pytest.raises(ValueError, match="compose with"):
        server.serve_requests([{"tokens": [1, 2], "beam_width": 2,
                                "prefix": [5]}])


def test_serve_lm_cli_batch(tmp_path, tiny_lm):
    import json

    from tempo_tpu.cli.serve_lm import main as serve_main
    from tempo_tpu.utils.config import save_yaml

    out, model, params, cfg = tiny_lm
    reqs = [{"tokens": [3, 1, 4, 1], "n_tokens": 5},
            {"tokens": [2, 7], "n_tokens": 3, "temperature": 0.7, "seed": 1}]
    req_path = tmp_path / "requests.jsonl"
    req_path.write_text("\n".join(json.dumps(r) for r in reqs) + "\n")
    cfg_path = tmp_path / "serve.yaml"
    save_yaml({"output_dir": str(tmp_path / "served"),
               "artifacts": str(out), "mode": "batch",
               "requests": str(req_path)}, cfg_path)

    serve_main(str(cfg_path))
    lines = [json.loads(l) for l in
             (tmp_path / "served" / "completions.jsonl").read_text()
             .splitlines()]
    assert len(lines) == 2
    assert lines[0]["n_generated"] == 5 and lines[1]["n_generated"] == 3
    assert (tmp_path / "served" / "serving_info.yaml").exists()


def test_serve_lm_cli_http(tmp_path, tiny_lm):
    import json
    import threading
    import time
    import urllib.request

    from tempo_tpu.cli.serve_lm import main as serve_main
    from tempo_tpu.utils.config import load_config, save_yaml

    out, model, params, cfg = tiny_lm
    cfg_path = tmp_path / "serve.yaml"
    save_yaml({"output_dir": str(tmp_path / "served"),
               "artifacts": str(out), "mode": "http", "port": 0,
               "max_requests": 2}, cfg_path)

    th = threading.Thread(target=serve_main, args=(str(cfg_path),),
                          daemon=True)
    th.start()
    info_path = tmp_path / "served" / "serving_info.yaml"
    for _ in range(200):
        if info_path.exists():
            break
        time.sleep(0.05)
    port = int(load_config(str(info_path))["port"])
    base = f"http://127.0.0.1:{port}"

    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["vocab_size"] == 31

    body = json.dumps({"tokens": [3, 1, 4, 1, 5], "n_tokens": 4}).encode()
    req = urllib.request.Request(f"{base}/generate", data=body,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        resp = json.loads(r.read())
    assert resp["n_generated"] == 4

    # second POST (multi-request payload) also ends the server loop
    body = json.dumps({"requests": [{"tokens": [2, 7], "n_tokens": 2},
                                    {"tokens": [5, 5], "n_tokens": 2}]}).encode()
    req = urllib.request.Request(f"{base}/generate", data=body,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        multi = json.loads(r.read())
    assert len(multi["responses"]) == 2
    th.join(timeout=60)
    assert not th.is_alive()


def test_online_server_matches_solo(tmp_path, tiny_lm):
    """OnlineLMServer: requests submitted from concurrent threads —
    including one submitted MID-FLIGHT while the pool is already
    decoding — join the shared running batch and come back identical to
    solo per-request decodes (greedy and host-sampled alike); the
    cumulative engine stats show the batch sharing."""
    import threading
    import time as _t

    from tempo_tpu.infer.serving import LMServer, OnlineLMServer

    out, model, params, cfg = tiny_lm
    solo = LMServer(out)
    online = OnlineLMServer(out, n_slots=2)
    reqs = [
        {"tokens": [3, 1, 4, 1, 5], "n_tokens": 17},
        {"tokens": [9, 2, 6], "n_tokens": 11,
         "temperature": 1.0, "top_k": 5, "seed": 3},
        {"tokens": [7, 7], "n_tokens": 20},
        {"tokens": [1, 2, 3, 4], "n_tokens": 5},
    ]
    results: list = [None] * len(reqs)

    def worker(i):
        results[i] = online.generate(reqs[i], timeout=300)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(reqs))]
    for t in threads:
        t.start()
    # a genuinely mid-flight submission: wait until decoding started
    deadline = _t.time() + 300
    while online.stats()["decode_steps"] == 0 and _t.time() < deadline:
        _t.sleep(0.01)
    late = {"tokens": [5], "n_tokens": 9, "temperature": 0.7,
            "top_p": 0.9, "seed": 11}
    late_resp = online.generate(late, timeout=300)
    for t in threads:
        t.join(300)
    stats = online.stats()
    online.close()

    for i, req in enumerate(reqs):
        want = solo.generate_batch(
            np.asarray([req["tokens"]], np.int32), req["n_tokens"],
            temperature=req.get("temperature", 0.0),
            top_k=req.get("top_k"), top_p=req.get("top_p"),
            seed=req.get("seed", 0))
        np.testing.assert_array_equal(
            np.asarray([results[i]["tokens"]]), want)
    want_late = solo.generate_batch(
        np.asarray([late["tokens"]], np.int32), 9, temperature=0.7,
        top_p=0.9, seed=11)
    assert late_resp["tokens"] == want_late[0].tolist()
    assert stats["prefills"] == 5 and stats["pending"] == 0
    # shared batch: fewer dispatches than serial per-token decode
    serial = sum(r["n_tokens"] - 1 for r in reqs) + late["n_tokens"] - 1
    assert stats["decode_steps"] < serial


def test_online_server_speculative(tmp_path, tiny_lm, draft_lm):
    """Online x speculation: OnlineLMServer with a draft drives the
    SpecLMEngine — concurrent callers join one running draft/verify
    batch, and every request (greedy and sampled) comes back identical
    to the solo canonical chain."""
    import threading

    from tempo_tpu.infer.serving import LMServer, OnlineLMServer

    out, model, params, cfg = tiny_lm
    solo = LMServer(out)
    online = OnlineLMServer(out, n_slots=2, draft_dir=draft_lm, k_draft=2)
    reqs = [
        {"tokens": [3, 1, 4, 1, 5], "n_tokens": 9},
        {"tokens": [9, 2, 6], "n_tokens": 7,
         "temperature": 1.0, "top_k": 5, "seed": 3},
        {"tokens": [7, 7], "n_tokens": 8},
        {"tokens": [1, 2, 3, 4], "n_tokens": 5, "temperature": 0.7,
         "seed": 11},
    ]
    results: list = [None] * len(reqs)

    def worker(i):
        results[i] = online.generate(reqs[i], timeout=300)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    try:
        stats = online.stats()
        assert stats["decode_steps"] > 0  # spec rounds ran
        for i, req in enumerate(reqs):
            want = solo.generate_batch(
                np.asarray([req["tokens"]], np.int32), req["n_tokens"],
                temperature=float(req.get("temperature", 0.0)),
                top_k=req.get("top_k"), seed=int(req.get("seed", 0)))
            assert results[i] is not None, i
            assert results[i]["tokens"] == want[0].tolist(), i
    finally:
        online.close()


def test_online_server_cancellation(tmp_path, tiny_lm):
    """cancel(ticket): a pending request never runs, an active one
    finalizes with its partial tokens (a PREFIX of the uncancelled
    chain), both responses carry cancelled: true, blocked result()
    callers return immediately, and other requests are unaffected."""
    from tempo_tpu.infer.serving import LMServer, OnlineLMServer

    out, model, params, cfg = tiny_lm
    solo = LMServer(out)
    online = OnlineLMServer(out, n_slots=1)  # one slot -> real queueing
    try:
        t_active = online.submit({"tokens": [3, 1, 4, 1, 5],
                                  "n_tokens": 24})
        t_pending = online.submit({"tokens": [9, 2, 6], "n_tokens": 24})
        t_after = online.submit({"tokens": [7, 7], "n_tokens": 5})

        # the pending request is dropped before it ever occupies a slot
        assert online.cancel(t_pending)
        r_p = online.result(t_pending, timeout=60)
        assert r_p["cancelled"] and r_p["tokens"] == []

        # the active request finalizes with a prefix of its full chain
        # (check-and-cancel under the engine lock: no decode step can
        # slip between the activity check and the cancel)
        with online._cond:
            assert online._cond.wait_for(
                lambda: any(st is not None
                            and st["ticket"] == t_active
                            for st in online._engine.slots), timeout=60)
            assert online._engine.cancel(t_active)
            online._cond.notify_all()
        r_a = online.result(t_active, timeout=60)
        assert r_a["cancelled"]
        full = solo.generate_batch(
            np.asarray([[3, 1, 4, 1, 5]], np.int32), 24)[0].tolist()
        assert 0 < len(r_a["tokens"]) <= 24
        assert r_a["tokens"] == full[:len(r_a["tokens"])]

        # untouched requests complete normally
        r = online.result(t_after, timeout=120)
        assert "cancelled" not in r
        want = solo.generate_batch(np.asarray([[7, 7]], np.int32), 5)
        assert r["tokens"] == want[0].tolist()
        # cancelling a finished ticket is a no-op
        assert not online.cancel(t_after)
    finally:
        online.close()


def test_online_server_scheduler_death_raises(tmp_path, tiny_lm):
    """Regression (round-4 advisor): an exception inside engine.step()
    must not kill the scheduler thread silently — blocked result()
    callers raise instead of hanging forever, and later submits are
    refused."""
    import pytest

    from tempo_tpu.infer.serving import OnlineLMServer

    out, model, params, cfg = tiny_lm
    online = OnlineLMServer(out, n_slots=2)
    try:
        with online._cond:
            def boom():
                raise RuntimeError("transport died mid-dispatch")
            online._engine.step = boom
        ticket = online.submit({"tokens": [3, 1, 4], "n_tokens": 4})
        with pytest.raises(RuntimeError, match="scheduler died"):
            online.result(ticket, timeout=60)
        with pytest.raises(RuntimeError, match="scheduler died"):
            online.submit({"tokens": [1, 2], "n_tokens": 2})
    finally:
        online.close()


def test_serve_lm_cli_http_online(tmp_path, tiny_lm):
    """`online: true` + mode http: the ThreadingHTTPServer front — two
    concurrent POSTs land in one running batch and both complete with
    correct outputs (pinned against the solo server)."""
    import json
    import threading
    import time
    import urllib.request

    from tempo_tpu.cli.serve_lm import main as serve_main
    from tempo_tpu.infer.serving import LMServer
    from tempo_tpu.utils.config import load_config, save_yaml

    out, model, params, cfg = tiny_lm
    cfg_path = tmp_path / "serve.yaml"
    save_yaml({"output_dir": str(tmp_path / "served"),
               "artifacts": str(out), "mode": "http", "port": 0,
               "scheduler": "continuous", "online": True, "slots": 2,
               "max_requests": 2}, cfg_path)

    th = threading.Thread(target=serve_main, args=(str(cfg_path),),
                          daemon=True)
    th.start()
    info_path = tmp_path / "served" / "serving_info.yaml"
    for _ in range(600):
        if info_path.exists():
            break
        time.sleep(0.05)
    port = int(load_config(str(info_path))["port"])
    base = f"http://127.0.0.1:{port}"

    payloads = [{"tokens": [3, 1, 4, 1, 5], "n_tokens": 6},
                {"tokens": [9, 2, 6], "n_tokens": 4}]
    got: list = [None, None]

    def post(i):
        body = json.dumps(payloads[i]).encode()
        req = urllib.request.Request(
            f"{base}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            got[i] = json.loads(r.read())

    posters = [threading.Thread(target=post, args=(i,)) for i in (0, 1)]
    for p in posters:
        p.start()
    for p in posters:
        p.join(120)
    th.join(timeout=120)
    assert not th.is_alive()

    solo = LMServer(out)
    for i, pl in enumerate(payloads):
        want = solo.generate_batch(
            np.asarray([pl["tokens"]], np.int32), pl["n_tokens"])
        assert got[i]["tokens"] == want[0].tolist()


def test_serve_lm_cli_openai_completions(tmp_path, tiny_lm):
    """POST /v1/completions: the OpenAI-Completions-shaped surface over
    token ids — greedy choices match the solo server, n>1 fans out over
    consecutive seeds (distinct samples under the canonical stream),
    logprobs/finish_reason/usage populate, and bad payloads 400."""
    import json
    import threading
    import time
    import urllib.request
    from urllib.error import HTTPError

    from tempo_tpu.cli.serve_lm import main as serve_main
    from tempo_tpu.infer.serving import LMServer
    from tempo_tpu.utils.config import load_config, save_yaml

    out, model, params, cfg = tiny_lm
    cfg_path = tmp_path / "serve.yaml"
    save_yaml({"output_dir": str(tmp_path / "served"),
               "artifacts": str(out), "mode": "http", "port": 0,
               "scheduler": "continuous", "slots": 2,
               "max_requests": 3}, cfg_path)
    th = threading.Thread(target=serve_main, args=(str(cfg_path),),
                          daemon=True)
    th.start()
    info_path = tmp_path / "served" / "serving_info.yaml"
    for _ in range(600):
        if info_path.exists():
            break
        time.sleep(0.05)
    port = int(load_config(str(info_path))["port"])

    def post(payload, path="/v1/completions"):
        body = json.dumps(payload).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    # greedy, batch of two prompts, with logprobs
    got = post({"prompt": [[3, 1, 4, 1, 5], [9, 2, 6]],
                "max_tokens": 6, "logprobs": True})
    solo = LMServer(out)
    assert got["object"] == "text_completion"
    assert len(got["choices"]) == 2
    for i, toks in enumerate(([3, 1, 4, 1, 5], [9, 2, 6])):
        want = solo.generate_batch(np.asarray([toks], np.int32), 6)
        ch = got["choices"][i]
        assert ch["tokens"] == want[0].tolist()
        assert ch["finish_reason"] == "length"
        assert len(ch["logprobs"]["token_logprobs"]) == 6
    assert got["usage"] == {"prompt_tokens": 8, "completion_tokens": 12,
                            "total_tokens": 20}

    # n=2 sampled: distinct consecutive seeds -> distinct samples,
    # each reproducing the solo chain at its own seed
    got = post({"prompt": [3, 1, 4, 1, 5], "max_tokens": 6, "n": 2,
                "temperature": 1.0, "seed": 5})
    assert len(got["choices"]) == 2
    for i, ch in enumerate(got["choices"]):
        want = solo.generate_batch(np.asarray([[3, 1, 4, 1, 5]],
                                              np.int32), 6,
                                   temperature=1.0, seed=5 + i)
        assert ch["tokens"] == want[0].tolist()
    assert got["choices"][0]["tokens"] != got["choices"][1]["tokens"]

    # malformed payload -> 400, server stays up
    try:
        post({"max_tokens": 4})
        raise AssertionError("expected HTTP 400")
    except HTTPError as e:
        assert e.code == 400

    th.join(timeout=120)
    assert not th.is_alive()


def test_stop_sequences(tmp_path, tiny_lm):
    """Multi-token 'stop' sequences: generation halts the first time the
    output ends with any stop sequence, the matched tokens are EXCLUDED
    (OpenAI convention; 'eos' keeps its token), per-token and fused
    chunked schedulers agree, and invalid stop ids fail fast."""
    from tempo_tpu.infer.serving import ContinuousLMServer

    out, model, params, cfg = tiny_lm
    server = ContinuousLMServer(out, n_slots=2)
    req = {"tokens": [3, 1, 4, 1, 5], "n_tokens": 17}
    base = server.serve([req])[0]["tokens"]

    stop = base[3:5]
    i0 = next(i for i in range(len(base) - 1)
              if base[i:i + 2] == stop)
    want = base[:i0]

    r = server.serve([dict(req, stop=stop)])[0]
    assert r["tokens"] == want and r["stopped_early"]

    # list-of-sequences form: the earlier match wins
    r = server.serve([dict(req, stop=[stop, base[1:3]])])[0]
    j0 = next(i for i in range(len(base) - 1)
              if base[i:i + 2] in (stop, base[1:3]))
    assert r["tokens"] == base[:j0] and r["stopped_early"]

    # the fused chunked scheduler discards its over-decoded tail the
    # same way
    fused = ContinuousLMServer(out, n_slots=2, k_decode=8)
    r = fused.serve([dict(req, stop=stop)])[0]
    assert r["tokens"] == want and r["stopped_early"]

    with pytest.raises(ValueError, match="stop token ids"):
        server.serve([dict(req, stop=[99])])
    with pytest.raises(ValueError, match="empty stop"):
        server.serve([dict(req, stop=[[]])])


def test_logprobs(tmp_path, tiny_lm):
    """'logprobs': per-token RAW-model logprobs of the emitted tokens,
    verified against an independent per-token recompute through the
    decode_step artifact; the request RIDES the fused decode_k chunks
    (the artifacts return chosen-token logprobs, so no per-token
    fallback — pinned via the dispatch count); absent unless requested;
    stays in step with 'stop' trimming."""
    from tempo_tpu.infer.export_lm import load_exported_lm
    from tempo_tpu.infer.serving import ContinuousLMServer

    out, model, params, cfg = tiny_lm
    server = ContinuousLMServer(out, n_slots=2, k_decode=8)
    req = {"tokens": [3, 1, 4, 1, 5], "n_tokens": 8, "logprobs": True}
    r = server.serve([req])[0]
    assert len(r["logprobs"]) == len(r["tokens"]) == 8
    # 7 post-prefill tokens in ONE fused dispatch — the logprob request
    # must not force 7 per-token dispatches
    assert server.last_stats["decode_steps"] == 1

    pre, dec, meta = load_exported_lm(out)
    logits, cache = pre(jnp.asarray([req["tokens"]], jnp.int32))
    toks = r["tokens"]

    def lp(row, tok):
        x = np.asarray(row, np.float64)
        x -= x.max()
        return float(x[tok] - np.log(np.exp(x).sum()))

    want = [lp(logits[0, -1], toks[0])]
    pos = 5
    for i in range(1, 8):
        logits, cache = dec(jnp.asarray([[toks[i - 1]]], jnp.int32),
                            cache, jnp.int32(pos))
        want.append(lp(logits[0, -1], toks[i]))
        pos += 1
    np.testing.assert_allclose(r["logprobs"], want, rtol=1e-5, atol=1e-6)

    r2 = server.serve([{"tokens": [3, 1, 4, 1, 5], "n_tokens": 4}])[0]
    assert "logprobs" not in r2

    base = server.serve([{"tokens": [3, 1, 4, 1, 5],
                          "n_tokens": 17}])[0]["tokens"]
    stop = base[3:5]
    r3 = server.serve([dict(req, n_tokens=17, stop=stop)])[0]
    assert r3["stopped_early"]
    assert len(r3["logprobs"]) == len(r3["tokens"])


def test_lm_export_continuous_batching(tmp_path, tiny_lm):
    """decode_rows + admit: slot-scheduled continuous batching reproduces
    per-request greedy decode exactly across mixed prompt and generation
    lengths, while sharing one device batch (no same-length bucketing)."""
    from tempo_tpu.infer.serving import ContinuousLMServer, LMServer

    out, model, params, cfg = tiny_lm
    server = ContinuousLMServer(out, n_slots=2)
    solo = LMServer(out)

    reqs = [
        {"tokens": [3, 1, 4, 1, 5], "n_tokens": 6},
        {"tokens": [9, 2, 6], "n_tokens": 3},
        {"tokens": [9, 2, 6, 5, 3, 5], "n_tokens": 5},
        {"tokens": [1, 1], "n_tokens": 7},
        {"tokens": [2], "n_tokens": 1},
    ]
    resp = server.serve(reqs)
    assert len(resp) == 5
    for i, req in enumerate(reqs):
        want = solo.generate_batch(
            np.asarray([req["tokens"]], np.int32), req["n_tokens"])
        np.testing.assert_array_equal(
            np.asarray([resp[i]["tokens"]]), want)

    # 5 requests shared 2 slots: the makespan must beat serial decoding
    stats = server.last_stats
    assert stats["prefills"] == 5 and stats["n_slots"] == 2
    serial_steps = sum(r["n_tokens"] - 1 for r in reqs)
    assert stats["decode_steps"] < serial_steps

    # eos early-stop: the stop token is kept, the budget is not spent
    eos = resp[0]["tokens"][2]
    stopped = server.serve(
        [{"tokens": [3, 1, 4, 1, 5], "n_tokens": 6, "eos": eos}])[0]
    assert stopped["stopped_early"]
    first_hit = resp[0]["tokens"].index(eos) + 1
    assert stopped["tokens"] == resp[0]["tokens"][:first_hit]

    # zero-budget requests answer immediately without occupying a slot
    empty = server.serve([{"tokens": [5, 5], "n_tokens": 0}])[0]
    assert empty["tokens"] == [] and not empty["stopped_early"]


def test_decode_k_greedy_matches_per_token(tmp_path, tiny_lm):
    """The fused decode_k artifact (K greedy steps in one dispatch, argmax
    feedback on-device) emits the exact per-token decode_step chain —
    LMServer's greedy path chains chunks + a per-token tail."""
    from tempo_tpu.infer.export_lm import greedy_decode_exported
    from tempo_tpu.infer.serving import LMServer

    out, model, params, cfg = tiny_lm
    server = LMServer(out)
    assert server.decode_k is not None and server.k_decode == 8

    prompt = np.asarray([[3, 1, 4, 1, 5], [9, 2, 6, 5, 3]], np.int32)
    # 20 new tokens = prefill token + 2 fused chunks + 3-token tail
    got = server.generate_batch(prompt, 20)
    ref = greedy_decode_exported(out, prompt, 20)[:, 5:]
    np.testing.assert_array_equal(got, ref)


def test_continuous_k_decode_matches_per_token(tmp_path, tiny_lm):
    """ContinuousLMServer(k_decode=8): multi-step scheduling — every slot
    advances 8 greedy tokens per dispatch via decode_k_rows — reproduces
    the per-token continuous schedule exactly (incl. a request that ends
    flush against the serving window, which forces the per-token fallback
    near the edge, and an eos that lands mid-chunk), with fewer device
    dispatches."""
    from tempo_tpu.infer.serving import ContinuousLMServer

    out, model, params, cfg = tiny_lm
    reqs = [
        {"tokens": [3, 1, 4, 1, 5], "n_tokens": 17},
        {"tokens": [9, 2, 6], "n_tokens": 11},
        {"tokens": [7, 7], "n_tokens": 20},
        {"tokens": [1, 2, 3, 4], "n_tokens": 5},
        # 12 + 20 = 32 fills the exported window exactly: pos + 8 > 32
        # near the end, so the scheduler must drop to per-token steps
        {"tokens": [5, 3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5], "n_tokens": 20},
    ]
    base_server = ContinuousLMServer(out, n_slots=2)
    base = base_server.serve(reqs)
    fast_server = ContinuousLMServer(out, n_slots=2, k_decode=8)
    fast = fast_server.serve(reqs)
    for rb, rf in zip(base, fast):
        assert rb["tokens"] == rf["tokens"]
    assert (fast_server.last_stats["decode_steps"]
            < base_server.last_stats["decode_steps"])

    # eos mid-chunk: the chunked server discards its over-decoded tail
    eos = base[0]["tokens"][9]
    for srv in (base_server, fast_server):
        r = srv.serve([{"tokens": [3, 1, 4, 1, 5], "n_tokens": 17,
                        "eos": eos}])[0]
        first_hit = base[0]["tokens"].index(eos) + 1
        assert r["stopped_early"]
        assert r["tokens"] == base[0]["tokens"][:first_hit]

    # a sampled request in the pool rides decode_k_sample (policy + rng
    # on-device): greedy rows stay pinned to the per-token schedule, and
    # the sampled row's device stream is chunk-invariant — the same
    # (seed, prompt) yields the same tokens whether the row decodes
    # alone, in a mixed pool, or on a pool with a different slot count
    sampled_req = {"tokens": [4, 4, 4], "n_tokens": 14,
                   "temperature": 1.0, "top_k": 7, "seed": 5}
    mixed = reqs[:2] + [sampled_req]
    got = fast_server.serve(mixed)
    for rb, rf in zip(base[:2], got[:2]):
        assert rb["tokens"] == rf["tokens"]
    alone = ContinuousLMServer(out, n_slots=2, k_decode=8).serve(
        [sampled_req])[0]
    wide = ContinuousLMServer(out, n_slots=4, k_decode=8).serve(
        [sampled_req] + reqs[:3])[0]
    assert got[2]["tokens"] == alone["tokens"] == wide["tokens"]
    assert min(alone["tokens"]) >= 0 and max(alone["tokens"]) < cfg.in_size

    # guard: the scheduler refuses a chunk size the artifacts don't carry
    with pytest.raises(AssertionError, match="decode_chunk"):
        ContinuousLMServer(out, n_slots=2, k_decode=4)


def test_bucketed_refuses_slot_scheduler_fields(tmp_path, tiny_lm):
    """The bucketed scheduler REFUSES stop/logprobs/eos (outside beam
    requests) instead of silently mis-serving them — including the
    falsy-but-real eos token id 0."""
    from tempo_tpu.infer.serving import LMServer

    out, model, params, cfg = tiny_lm
    server = LMServer(out)
    base = {"tokens": [3, 1, 4], "n_tokens": 4}
    for bad in ({"stop": [[1, 2]]}, {"logprobs": True}, {"eos": 5},
                {"eos": 0}):
        with pytest.raises(ValueError, match="bucketed scheduler"):
            server.serve_requests([dict(base, **bad)])
    # beam requests keep their eos (honored inside beam_batch)
    r = server.serve_requests([dict(base, beam_width=2, eos=0)])[0]
    assert len(r["beams"]) == 2


def test_drain_chaining_matches_unchained(tmp_path, tiny_lm):
    """Burst chaining: with nothing pending the fused engine dispatches
    several chunks back-to-back (device token slices feed the next
    chunk; one host sync per burst). Outputs — greedy and sampled —
    are bit-identical to the unchained chunked path (the canonical
    stream is chunk-boundary invariant), and the sync count drops."""
    from tempo_tpu.infer.serving import ContinuousLMServer, LMServer

    out, model, params, cfg = tiny_lm
    solo = LMServer(out)
    srv = ContinuousLMServer(out, n_slots=2, k_decode=8)
    reqs = [{"tokens": [7, 7], "n_tokens": 25},
            {"tokens": [3, 1], "n_tokens": 25,
             "temperature": 1.0, "top_k": 5, "seed": 11}]
    got = srv.serve(reqs)
    for req, r in zip(reqs, got):
        want = solo.generate_batch(
            np.asarray([req["tokens"]], np.int32), req["n_tokens"],
            temperature=float(req.get("temperature", 0.0)),
            top_k=req.get("top_k"), seed=int(req.get("seed", 0)))
        assert r["tokens"] == want[0].tolist()
    stats = srv.last_stats
    # 24 post-prefill tokens / 8-chunks = 3 decode dispatches, but the
    # burst gate (remaining > c*8, window 2+(c+1)*8 <= 32) chains 2 of
    # them into one sync: fewer bursts than dispatches
    assert stats["decode_steps"] == 3
    assert stats["decode_bursts"] < stats["decode_steps"]


def test_decode_k_sample_policy_support(tmp_path, tiny_lm):
    """The on-device support truncation (truncate_support_rows) keeps
    exactly the host policy's support (serving.policy_probs: top-k then
    nucleus with the boundary token), per row with per-row parameters;
    greedy rows (temperature 0) in decode_k_sample reproduce decode_k's
    argmax chain exactly."""
    import json
    from pathlib import Path

    from tempo_tpu.infer.export_lm import (load_exported_decode_k,
                                           load_exported_decode_k_sample,
                                           truncate_support_rows,
                                           zero_cache)
    from tempo_tpu.infer.serving import policy_probs

    out, model, params, cfg = tiny_lm

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, cfg.in_size)).astype(np.float32)
    top_k = np.asarray([0, 3, 1, 8, 0, 5], np.int32)
    top_p = np.asarray([1.0, 1.0, 0.9, 0.5, 0.3, 0.7], np.float32)
    masked = np.asarray(truncate_support_rows(
        jnp.asarray(logits), jnp.asarray(top_k), jnp.asarray(top_p)))
    for r in range(6):
        want = policy_probs(logits[r], 1.0,
                            int(top_k[r]) or None, float(top_p[r])) > 0
        np.testing.assert_array_equal(np.isfinite(masked[r]), want)

    # greedy rows through the sampled artifact == the greedy artifact
    dks, k = load_exported_decode_k_sample(out)
    _, dkr, _ = load_exported_decode_k(out)
    cache = zero_cache(json.loads((Path(out) / "meta.json").read_text()), 2)
    tok = jnp.asarray([[3], [9]], jnp.int32)
    pos = jnp.zeros(2, jnp.int32)
    keys = jnp.asarray(np.stack([jax.random.PRNGKey(1),
                                 jax.random.PRNGKey(2)]), jnp.uint32)
    zeros = jnp.zeros(2, jnp.float32)
    g_toks, g_lps, _ = dkr(tok, cache, pos)
    s_toks, s_lps, _ = dks(tok, cache, pos, keys, zeros,
                           jnp.zeros(2, jnp.int32),
                           jnp.ones(2, jnp.float32))
    np.testing.assert_array_equal(np.asarray(g_toks), np.asarray(s_toks))
    # both fused artifacts report the SAME raw-model chosen-token
    # logprobs for the same chain
    np.testing.assert_array_equal(np.asarray(g_lps), np.asarray(s_lps))


@pytest.mark.slow  # variant with its own model export: RoPE per-row
# decode is also covered fast by test_gqa.py (rope=True grouped cache)
def test_lm_export_continuous_rope(tmp_path):
    """The per-row-position decode path also covers RoPE models (per-row
    rotation-angle gather instead of the learned-table gather)."""
    from tempo_tpu.infer.export_lm import export_lm
    from tempo_tpu.infer.serving import ContinuousLMServer, LMServer
    from tempo_tpu.nn.transformer import Transformer, TransformerConfig

    cfg = TransformerConfig(in_size=23, block_size=24, n_layer=2, n_head=2,
                            n_embd=24, rope=True, pos_embed=False)
    model = Transformer(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 23)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    out = export_lm(params, cfg, tmp_path / "lm_rope")

    server = ContinuousLMServer(out, n_slots=2)
    solo = LMServer(out)
    reqs = [{"tokens": [3, 1, 4, 1, 5], "n_tokens": 5},
            {"tokens": [7, 7], "n_tokens": 6},
            {"tokens": [2, 0, 9, 9], "n_tokens": 4}]
    resp = server.serve(reqs)
    for i, req in enumerate(reqs):
        want = solo.generate_batch(
            np.asarray([req["tokens"]], np.int32), req["n_tokens"])
        np.testing.assert_array_equal(np.asarray([resp[i]["tokens"]]), want)


def test_speculative_accept_math():
    """The rejection-sampling step preserves the target distribution
    EXACTLY: marginalized over draft ~ q, P(emitted = x) == p(x). Checked
    analytically (no sampling noise) using the helper's own acceptance
    boundary and residual."""
    from tempo_tpu.infer.serving import speculative_accept

    rng = np.random.default_rng(0)
    for trial in range(5):
        v = 7
        p = rng.dirichlet(np.ones(v) * (0.3 + trial))
        q = rng.dirichlet(np.ones(v) * (0.3 + trial))
        if trial == 4:
            q[2] = 0.0  # a token the draft can never propose
            q /= q.sum()
        marginal = np.zeros(v)
        for d in range(v):
            a_d = min(1.0, p[d] / q[d]) if q[d] > 0 else 0.0
            # the helper's boundary must sit exactly at a_d
            if q[d] > 0 and a_d > 1e-9:
                ok, _ = speculative_accept(p, q, d, a_d - 1e-12)
                assert ok
            if a_d < 1.0:
                ok, residual = speculative_accept(p, q, d, a_d + 1e-12)
                assert not ok
            _, residual = speculative_accept(p, q, d, 1.0)  # forced reject
            marginal[d] += q[d] * a_d
            marginal += q[d] * (1.0 - a_d) * residual
        np.testing.assert_allclose(marginal, p, atol=1e-12)


def _draft_lm_export(tmp_path):
    """A genuinely smaller draft model sharing the target's vocab."""
    from tempo_tpu.infer.export_lm import export_lm
    from tempo_tpu.nn.transformer import Transformer, TransformerConfig

    cfg = TransformerConfig(in_size=31, block_size=32, n_layer=1, n_head=2,
                            n_embd=16)
    model = Transformer(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, 31)
    params = model.init(jax.random.PRNGKey(4), tokens)["params"]
    return export_lm(params, cfg, tmp_path / "draft")


def test_lm_export_speculative_greedy(tmp_path, tiny_lm, draft_lm):
    """Draft-propose / target-verify greedy decoding emits EXACTLY the
    target-only greedy sequence, at any speculation depth, with the
    verify pass running as one multi-token `extend` per round."""
    from tempo_tpu.infer.serving import LMServer, SpeculativeLMServer

    out, model, params, cfg = tiny_lm
    draft = draft_lm
    solo = LMServer(out)

    reqs = [{"tokens": [3, 1, 4, 1, 5], "n_tokens": 9},
            {"tokens": [9, 2], "n_tokens": 6},
            {"tokens": [7], "n_tokens": 1}]
    for k_draft in (1, 3):
        server = SpeculativeLMServer(out, draft, k_draft=k_draft)
        resp = server.serve(reqs)
        for i, req in enumerate(reqs):
            want = solo.generate_batch(
                np.asarray([req["tokens"]], np.int32), req["n_tokens"])
            np.testing.assert_array_equal(
                np.asarray([resp[i]["tokens"]]), want,
                err_msg=f"k_draft={k_draft} req={i}")

    # a self-draft (draft == target) accepts every proposal, so each
    # round commits k+1 tokens: the target-pass count collapses
    self_server = SpeculativeLMServer(out, out, k_draft=3)
    resp = self_server.serve([{"tokens": [3, 1, 4, 1, 5], "n_tokens": 9}])
    assert resp[0]["accept_rate"] == 1.0
    assert resp[0]["rounds"] == 2  # 1 prefill token + 2 rounds x (3+1)
    want = solo.generate_batch(np.asarray([[3, 1, 4, 1, 5]], np.int32), 9)
    np.testing.assert_array_equal(np.asarray([resp[0]["tokens"]]), want)


def test_lm_export_speculative_sampled(tmp_path, tiny_lm, draft_lm):
    """Sampled speculative decoding draws the CANONICAL stream: the
    emitted chain is IDENTICAL to target-only sampled decode under the
    same (seed, prompt) — speculation is a transparent accelerator, not
    merely distribution-preserving. Also: seeded-reproducible, in-vocab,
    guards hold (window = min of target/draft, shared vocab), and a
    self-draft accepts every sampled proposal (the draft proposes
    through the same key schedule on identical logits)."""
    import pytest

    from tempo_tpu.infer.serving import LMServer, SpeculativeLMServer

    out, model, params, cfg = tiny_lm
    draft = draft_lm
    server = SpeculativeLMServer(out, draft, k_draft=2)

    req = {"tokens": [3, 1, 4], "n_tokens": 8, "temperature": 1.0,
           "top_k": 5, "seed": 11}
    r1 = server.serve([req])[0]
    r2 = server.serve([req])[0]
    assert r1["tokens"] == r2["tokens"]
    assert len(r1["tokens"]) == 8
    assert min(r1["tokens"]) >= 0 and max(r1["tokens"]) < cfg.in_size
    assert server.last_stats["tokens_per_target_pass"] is not None

    # the cross-scheduler stream pin, now including speculation: the
    # sampled chain equals the target-only canonical chain exactly
    solo = LMServer(out)
    want = solo.generate_batch(np.asarray([req["tokens"]], np.int32), 8,
                               temperature=1.0, top_k=5, seed=11)
    assert r1["tokens"] == want[0].tolist()
    # ... at other policies/depths too
    for k_draft in (1, 3):
        srv = SpeculativeLMServer(out, draft, k_draft=k_draft)
        req2 = {"tokens": [9, 2, 6], "n_tokens": 7, "temperature": 0.7,
                "top_p": 0.9, "seed": 3}
        got = srv.serve([req2])[0]["tokens"]
        want2 = solo.generate_batch(
            np.asarray([req2["tokens"]], np.int32), 7, temperature=0.7,
            top_p=0.9, seed=3)
        assert got == want2[0].tolist(), k_draft

    # self-draft: identical logits + shared threefry noise => every
    # sampled proposal matches the canonical draw, acceptance 1.0
    self_srv = SpeculativeLMServer(out, out, k_draft=3)
    r = self_srv.serve([req])[0]
    assert r["accept_rate"] == 1.0
    assert r["tokens"] == want[0].tolist()

    # eos / stop / logprobs through the batch-1 speculative server:
    # same truncation and values as the continuous scheduler
    from tempo_tpu.infer.serving import ContinuousLMServer
    greq = {"tokens": [3, 1, 4, 1, 5], "n_tokens": 10}
    base = ContinuousLMServer(out, n_slots=2).serve([greq])[0]
    eos = base["tokens"][4]
    r = server.serve([dict(greq, eos=eos)])[0]
    first = base["tokens"].index(eos) + 1
    assert r["tokens"] == base["tokens"][:first] and r["stopped_early"]
    stop = base["tokens"][2:4]
    i0 = next(i for i in range(len(base["tokens"]) - 1)
              if base["tokens"][i:i + 2] == stop)
    r = server.serve([dict(greq, stop=stop)])[0]
    assert r["tokens"] == base["tokens"][:i0] and r["stopped_early"]
    b_lp = ContinuousLMServer(out, n_slots=2).serve(
        [dict(greq, logprobs=True)])[0]
    r = server.serve([dict(greq, logprobs=True)])[0]
    assert r["tokens"] == b_lp["tokens"]
    np.testing.assert_allclose(r["logprobs"], b_lp["logprobs"],
                               rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="serving window"):
        server.serve([{"tokens": [1] * 30, "n_tokens": 6}])
    with pytest.raises(ValueError, match="token ids"):
        server.serve([{"tokens": [99], "n_tokens": 2}])


def test_continuous_speculative_greedy_matches_target_only(tmp_path,
                                                           tiny_lm,
                                                           draft_lm):
    """Speculation composed WITH continuous batching: ContinuousLMServer
    with a draft + k_draft > 0 runs per-slot draft/verify blocks through
    `extend_rows` (rows accept different lengths in one device batch).
    Greedy output must be EXACTLY the target-only sequence for every
    request in a mixed-length workload, at several (k_draft, n_slots)."""
    from tempo_tpu.infer.serving import ContinuousLMServer, LMServer

    out, model, params, cfg = tiny_lm
    solo = LMServer(out)

    reqs = [{"tokens": [3, 1, 4, 1, 5], "n_tokens": 9},
            {"tokens": [9, 2], "n_tokens": 6},
            {"tokens": [7], "n_tokens": 1},
            {"tokens": [2, 7, 7, 1], "n_tokens": 7},
            {"tokens": [5, 5, 5], "n_tokens": 4}]
    want = [solo.generate_batch(np.asarray([r["tokens"]], np.int32),
                                r["n_tokens"])[0].tolist() for r in reqs]
    for k_draft, n_slots in ((1, 2), (3, 2), (3, 8)):
        server = ContinuousLMServer(out, n_slots=n_slots,
                                    draft_dir=draft_lm, k_draft=k_draft)
        resp = server.serve(reqs)
        for i in range(len(reqs)):
            assert resp[i]["tokens"] == want[i], (k_draft, n_slots, i)
        assert server.last_stats["drafted"] > 0


@pytest.mark.slow  # perf-property sibling (dispatch counting); the
# greedy/sampled equality pins for the composition stay fast
def test_continuous_speculative_beats_both_levers(tmp_path, tiny_lm):
    """The composition must strictly batch-AND-speculate: with a
    self-draft (acceptance 1.0, deterministic) the composed scheduler's
    verify-round count is below BOTH the continuous-only decode-step
    count (speculation commits k+1 tokens per round) AND the per-request
    speculative scheduler's total round count (rounds overlap across
    slots instead of running serially)."""
    from tempo_tpu.infer.serving import (ContinuousLMServer, LMServer,
                                         SpeculativeLMServer)

    out, model, params, cfg = tiny_lm
    reqs = [{"tokens": [3, 1, 4, 1, 5], "n_tokens": 12},
            {"tokens": [9, 2], "n_tokens": 12},
            {"tokens": [2, 7, 7, 1], "n_tokens": 10},
            {"tokens": [5, 5, 5], "n_tokens": 11}]
    solo = LMServer(out)
    want = [solo.generate_batch(np.asarray([r["tokens"]], np.int32),
                                r["n_tokens"])[0].tolist() for r in reqs]

    cont = ContinuousLMServer(out, n_slots=4)
    resp = cont.serve(reqs)
    assert [r["tokens"] for r in resp] == want
    cont_steps = cont.last_stats["decode_steps"]

    spec = SpeculativeLMServer(out, out, k_draft=3)
    resp = spec.serve(reqs)
    assert [r["tokens"] for r in resp] == want
    spec_rounds = spec.last_stats["rounds"]
    assert spec.last_stats["accepted"] == spec.last_stats["drafted"]

    both = ContinuousLMServer(out, n_slots=4, draft_dir=out, k_draft=3)
    resp = both.serve(reqs)
    assert [r["tokens"] for r in resp] == want
    assert both.last_stats["accept_rate"] == 1.0
    assert both.last_stats["rounds"] < cont_steps, both.last_stats
    assert both.last_stats["rounds"] < spec_rounds, both.last_stats


def test_continuous_speculative_sampled_reproducible(tmp_path, tiny_lm,
                                                     draft_lm):
    """Sampled rows under the composed scheduler draw the CANONICAL
    stream: per-request outputs equal the plain continuous (and solo)
    sampled chains exactly; seeded-reproducible, in-vocab, eos
    early-stop still honored."""
    from tempo_tpu.infer.serving import ContinuousLMServer

    out, model, params, cfg = tiny_lm
    server = ContinuousLMServer(out, n_slots=2, draft_dir=draft_lm,
                                k_draft=2)
    reqs = [{"tokens": [3, 1, 4], "n_tokens": 8, "temperature": 1.0,
             "top_k": 5, "seed": 11},
            {"tokens": [9, 2], "n_tokens": 6, "temperature": 0.7,
             "seed": 3}]
    r1 = server.serve(reqs)
    r2 = server.serve(reqs)
    assert [r["tokens"] for r in r1] == [r["tokens"] for r in r2]
    assert len(r1[0]["tokens"]) == 8 and len(r1[1]["tokens"]) == 6
    for r in r1:
        assert min(r["tokens"]) >= 0 and max(r["tokens"]) < cfg.in_size

    # the cross-scheduler sampled-equality pin now covers speculation
    plain = ContinuousLMServer(out, n_slots=2).serve(reqs)
    assert [r["tokens"] for r in r1] == [r["tokens"] for r in plain]

    # window-flush requests are REFUSED under the batched draft/verify
    # engines: the fixed-width verify block writes rejected-draft KV up
    # to k_draft positions past the last committed token, and a
    # beyond-window write would clamp onto committed KV (regression:
    # caught by review; the paged scheduler gained this guard first)
    import pytest
    with pytest.raises(ValueError, match="draft slack"):
        server.serve([{"tokens": [1] * 12, "n_tokens": 20}])

    # 'stop' and 'logprobs' compose with the draft/verify rounds
    base = plain[0]["tokens"]
    stop = base[2:4]
    i0 = next(i for i in range(len(base) - 1) if base[i:i + 2] == stop)
    r = server.serve([dict(reqs[0], stop=stop)])[0]
    assert r["tokens"] == base[:i0] and r["stopped_early"]
    r_lp = server.serve([dict(reqs[0], logprobs=True)])[0]
    b_lp = ContinuousLMServer(out, n_slots=2).serve(
        [dict(reqs[0], logprobs=True)])[0]
    assert r_lp["tokens"] == b_lp["tokens"]
    np.testing.assert_allclose(r_lp["logprobs"], b_lp["logprobs"],
                               rtol=1e-5, atol=1e-6)

    # eos: find a token the greedy continuation emits, stop there
    greedy = server.serve([{"tokens": [3, 1, 4, 1, 5], "n_tokens": 6}])[0]
    eos_tok = greedy["tokens"][2]
    stopped = server.serve([{"tokens": [3, 1, 4, 1, 5], "n_tokens": 6,
                             "eos": eos_tok}])[0]
    first = stopped["tokens"].index(eos_tok)
    assert stopped["tokens"] == greedy["tokens"][:first + 1]
    assert stopped["stopped_early"]


def test_serve_lm_cli_continuous_speculative(tmp_path, tiny_lm, draft_lm):
    """The serving CLI composes draft_artifacts + k_draft under
    scheduler: continuous and records the round/acceptance stats."""
    import json

    from tempo_tpu.cli.serve_lm import main as serve_main
    from tempo_tpu.utils.config import load_config, save_yaml

    out, model, params, cfg = tiny_lm
    reqs = [{"tokens": [3, 1, 4, 1], "n_tokens": 5},
            {"tokens": [2, 7], "n_tokens": 3}]
    req_path = tmp_path / "requests.jsonl"
    req_path.write_text("\n".join(json.dumps(r) for r in reqs) + "\n")
    cfg_path = tmp_path / "serve.yaml"
    save_yaml({"output_dir": str(tmp_path / "served"),
               "artifacts": str(out), "mode": "batch",
               "scheduler": "continuous", "slots": 2,
               "draft_artifacts": str(draft_lm), "k_draft": 2,
               "requests": str(req_path)}, cfg_path)

    serve_main(str(cfg_path))
    lines = [json.loads(l) for l in
             (tmp_path / "served" / "completions.jsonl").read_text()
             .splitlines()]
    assert [l["n_generated"] for l in lines] == [5, 3]
    info = load_config(str(tmp_path / "served" / "serving_info.yaml"))
    stats = info["scheduler_stats"]
    assert stats["k_draft"] == 2 and stats["rounds"] > 0
    assert stats["drafted"] > 0


def test_serve_lm_cli_speculative(tmp_path, tiny_lm, draft_lm):
    """The serving CLI drives the speculative scheduler end-to-end and
    records acceptance stats."""
    import json

    from tempo_tpu.cli.serve_lm import main as serve_main
    from tempo_tpu.utils.config import load_config, save_yaml

    out, model, params, cfg = tiny_lm
    draft = draft_lm
    reqs = [{"tokens": [3, 1, 4, 1], "n_tokens": 5},
            {"tokens": [2, 7], "n_tokens": 3}]
    req_path = tmp_path / "requests.jsonl"
    req_path.write_text("\n".join(json.dumps(r) for r in reqs) + "\n")
    cfg_path = tmp_path / "serve.yaml"
    save_yaml({"output_dir": str(tmp_path / "served"),
               "artifacts": str(out), "mode": "batch",
               "scheduler": "speculative", "draft_artifacts": str(draft),
               "k_draft": 2, "requests": str(req_path)}, cfg_path)

    serve_main(str(cfg_path))
    lines = [json.loads(l) for l in
             (tmp_path / "served" / "completions.jsonl").read_text()
             .splitlines()]
    assert [l["n_generated"] for l in lines] == [5, 3]
    info = load_config(str(tmp_path / "served" / "serving_info.yaml"))
    assert info["scheduler_stats"]["k_draft"] == 2
    assert info["scheduler_stats"]["target_passes"] > 0


def test_serve_lm_cli_continuous(tmp_path, tiny_lm):
    """The serving CLI drives the continuous scheduler end-to-end and
    records its slot-level stats."""
    import json

    from tempo_tpu.cli.serve_lm import main as serve_main
    from tempo_tpu.utils.config import load_config, save_yaml

    out, model, params, cfg = tiny_lm
    reqs = [{"tokens": [3, 1, 4, 1], "n_tokens": 5},
            {"tokens": [2, 7], "n_tokens": 3},
            {"tokens": [2, 7, 7, 1, 1], "n_tokens": 4}]
    req_path = tmp_path / "requests.jsonl"
    req_path.write_text("\n".join(json.dumps(r) for r in reqs) + "\n")
    cfg_path = tmp_path / "serve.yaml"
    save_yaml({"output_dir": str(tmp_path / "served"),
               "artifacts": str(out), "mode": "batch",
               "scheduler": "continuous", "slots": 2,
               "requests": str(req_path)}, cfg_path)

    serve_main(str(cfg_path))
    lines = [json.loads(l) for l in
             (tmp_path / "served" / "completions.jsonl").read_text()
             .splitlines()]
    assert [l["n_generated"] for l in lines] == [5, 3, 4]
    info = load_config(str(tmp_path / "served" / "serving_info.yaml"))
    assert info["scheduler_stats"]["n_slots"] == 2
    assert info["scheduler_stats"]["prefills"] == 3


def test_chunked_prefill_matches_one_shot(tmp_path, tiny_lm):
    """chunked_prefill (extend into a zero cache from position 0) must be
    EXACTLY prefill — same cache, same final-position logits — for any
    chunk size, including ragged tails; and a chunked LMServer decodes
    bit-equal to the unchunked one."""
    from tempo_tpu.infer.export_lm import load_exported_speculative
    from tempo_tpu.infer.serving import LMServer, chunked_prefill

    out, model, params, cfg = tiny_lm
    prefill, extend, meta = load_exported_speculative(out)

    prompt = np.asarray([[3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5],
                         [9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3]], np.int32)
    ref_logits, ref_cache = prefill(jnp.asarray(prompt))
    for chunk in (1, 3, 4, 11, 16):
        logits, cache = chunked_prefill(extend, meta, prompt, chunk)
        np.testing.assert_allclose(np.asarray(logits[:, -1]),
                                   np.asarray(ref_logits[:, -1]),
                                   rtol=1e-6, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(cache),
                        jax.tree_util.tree_leaves(ref_cache)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    # end-to-end: chunked server == unchunked server, greedy pinned
    plain = LMServer(out).generate_batch(prompt, 6)
    chunked = LMServer(out, prefill_chunk=4).generate_batch(prompt, 6)
    np.testing.assert_array_equal(plain, chunked)


def test_continuous_server_chunked_prefill(tmp_path, tiny_lm):
    """ContinuousLMServer with prefill_chunk admits requests through
    chunked prefill and stays pinned to the unchunked scheduler."""
    from tempo_tpu.infer.serving import ContinuousLMServer

    out, model, params, cfg = tiny_lm
    reqs = [
        {"tokens": [3, 1, 4, 1, 5, 9, 2], "n_tokens": 5},
        {"tokens": [9, 2, 6], "n_tokens": 4},
        {"tokens": [1, 1, 2, 3, 5, 8, 13 % 7, 1, 2], "n_tokens": 6},
    ]
    plain = ContinuousLMServer(out, n_slots=2).serve(reqs)
    chunked = ContinuousLMServer(out, n_slots=2,
                                 prefill_chunk=4).serve(reqs)
    for a, b in zip(plain, chunked):
        assert a["tokens"] == b["tokens"]


def test_serving_top_p_policy():
    """top-p (nucleus) truncation in the serving policy: exact support
    on a crafted distribution (the reference probability vector the
    on-device truncation is pinned against), top_p=1.0 a no-op in the
    canonical device stream, and a tiny top_p reduces to greedy."""
    from tempo_tpu.infer.serving import device_sample, policy_probs

    logits = np.log(np.array([0.4, 0.05, 0.35, 0.2], np.float64))
    # sorted probs 0.4, 0.35, 0.2, 0.05; top_p=0.5 keeps {0.4, 0.35}
    p = policy_probs(logits, 1.0, None, top_p=0.5)
    np.testing.assert_allclose(
        p, [0.4 / 0.75, 0.0, 0.35 / 0.75, 0.0], atol=1e-12)
    # composes with top_k: top_k=2 already restricts to {0.4, 0.35};
    # top_p=0.9 then keeps both
    p2 = policy_probs(logits, 1.0, 2, top_p=0.9)
    np.testing.assert_allclose(
        p2, [0.4 / 0.75, 0.0, 0.35 / 0.75, 0.0], atol=1e-12)
    # top_p=1.0 is a no-op (identical threefry stream => identical
    # draws through the canonical device sampler)
    batch = np.tile(logits, (5, 1)).astype(np.float32)
    keys = np.stack([np.asarray(jax.random.PRNGKey(i), np.uint32)
                     for i in range(5)])
    pos = np.arange(5)
    ones = np.ones(5, np.float32)
    a = device_sample(batch, keys, pos, ones, np.zeros(5, np.int32),
                      np.full(5, 2.0, np.float32))
    b = device_sample(batch, keys, pos, ones, np.zeros(5, np.int32),
                      ones)
    np.testing.assert_array_equal(a, b)
    # a tiny nucleus is the argmax
    g = device_sample(batch, keys, pos, ones, np.zeros(5, np.int32),
                      np.full(5, 1e-9, np.float32))
    np.testing.assert_array_equal(g, np.zeros((5, 1), np.int64))


def test_prefix_cache_matches_full_prefill(tmp_path, tiny_lm):
    """Shared-prefix (system prompt) KV caching: the prefix cache is
    computed once, tiled across the batch, and the suffix-only prefill
    through `extend` must reproduce full-prompt greedy decode bit-equal."""
    from tempo_tpu.infer.serving import LMServer

    out, _, _, _ = tiny_lm
    server = LMServer(out)
    prefix = [3, 1, 4, 1, 5, 9]
    suffixes = np.asarray([[6, 7], [8, 9], [2, 6]], np.int32)
    full_prompts = np.asarray([prefix + list(s) for s in suffixes],
                              np.int32)

    want = server.generate_batch(full_prompts, 6)
    got = server.generate_batch(suffixes, 6, prefix=prefix)
    np.testing.assert_array_equal(got, want)

    # the cache is memoized: a second call with the same prefix reuses it
    assert len(server._prefix_caches) == 1
    got2 = server.generate_batch(suffixes[:1], 4, prefix=prefix)
    assert len(server._prefix_caches) == 1
    want2 = server.generate_batch(full_prompts[:1], 4)
    np.testing.assert_array_equal(got2, want2)

    # the window guard counts the prefix
    import pytest as _pytest
    with _pytest.raises(ValueError, match="prefix"):
        server.generate_batch(suffixes, 32, prefix=prefix)

    # request-level routing through serve_requests ('prefix' field)
    reqs = [{"tokens": [6, 7], "prefix": prefix, "n_tokens": 5},
            {"tokens": list(map(int, full_prompts[0])), "n_tokens": 5}]
    resp = server.serve_requests(reqs)
    np.testing.assert_array_equal(resp[0]["tokens"][:5],
                                  resp[1]["tokens"][:5])

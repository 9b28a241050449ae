"""Grouped-query attention (TransformerConfig.n_kv_head): K/V heads are
shared across query-head groups, shrinking the KV cache — and its
per-token decode HBM stream, the first-order serving cost — by the group
factor. Beyond the reference toolkit's MHA-only GPT
(src/mltools/networks/blocks.py:219-410), so the oracle here is internal:
the fused GQA kernel vs the manual broadcast path, and cache decode vs
the full forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.nn.transformer import (
    Transformer,
    TransformerConfig,
    cached_forward,
    generate,
    init_cache,
)

CFG = TransformerConfig(in_size=61, block_size=32, n_layer=2, n_head=4,
                        n_kv_head=2, n_embd=32, rope=True, pos_embed=False,
                        attn_impl="xla")


def _setup(cfg=CFG, b=2, t=16, seed=0):
    model = Transformer(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(seed + 1), (b, t), 0,
                                cfg.in_size)
    params = model.init(jax.random.PRNGKey(seed), tokens)["params"]
    return model, params, tokens


def test_gqa_param_shapes_and_cache():
    model, params, _ = _setup()
    # fused qkv projection: n_embd query features + 2 * kv * hd
    kernel = params["h_0"]["attn"]["c_attn"]["kernel"]
    assert kernel.shape == (32, 32 + 2 * 2 * 8)
    # the cache holds kv heads, not query heads
    cache = init_cache(CFG, batch_size=3, cache_len=32)
    assert cache[0][0].shape == (3, 32, 2, 8)
    # group factor must divide the query heads
    bad = TransformerConfig(in_size=61, n_layer=1, n_head=4, n_kv_head=3,
                            n_embd=32)
    with pytest.raises(AssertionError):
        Transformer(bad).init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 4), jnp.int32))


def test_gqa_fused_matches_manual_broadcast():
    # two independent code paths: the no-tap forward runs the fused
    # jax.nn.dot_product_attention GQA kernel; capture runs the manual
    # einsum path with K/V groups explicitly repeated. They must agree.
    model, params, tokens = _setup()
    fused = model.apply({"params": params}, tokens)
    manual, hiddens = cached_forward(model, params, tokens)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(manual),
                               atol=2e-5)
    # the tapped score tensor keeps the reference [b, n_head, t, t] layout
    assert hiddens["attn^1"].shape == (2, 4, 16, 16)


def test_gqa_nkv_equal_nhead_is_plain_mha():
    # n_kv_head == n_head must be bit-identical in structure to the
    # default (n_kv_head=0): same param shapes, same forward
    cfg_mha = TransformerConfig(in_size=61, block_size=32, n_layer=2,
                                n_head=4, n_embd=32, rope=True,
                                pos_embed=False, attn_impl="xla")
    cfg_kv4 = TransformerConfig(in_size=61, block_size=32, n_layer=2,
                                n_head=4, n_kv_head=4, n_embd=32, rope=True,
                                pos_embed=False, attn_impl="xla")
    model, params, tokens = _setup(cfg_mha)
    out_a = model.apply({"params": params}, tokens)
    out_b = Transformer(cfg_kv4).apply({"params": params}, tokens)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_gqa_kv_cache_decode_matches_full_forward():
    # grouped cache decode (the einsum that never materializes repeated
    # K/V) must reproduce the full forward exactly: greedy generate ==
    # step-by-step argmax over full re-forwards
    model, params, tokens = _setup(b=2, t=6)
    n_new = 8
    got = generate(model, params, tokens, n_new, jax.random.PRNGKey(7),
                   temperature=0.0)
    # causality: ONE full forward over the generated sequence yields
    # every step's logits (logits[:, :t] == forward of the prefix), so
    # the whole greedy chain pins against a single apply instead of
    # n_new growing-shape re-forwards
    full = jnp.concatenate([tokens, jnp.asarray(got)[:, tokens.shape[1]:]],
                           axis=1)
    logits = model.apply({"params": params}, full)
    t0 = tokens.shape[1]
    seq = tokens
    for i in range(n_new):
        nxt = jnp.argmax(logits[:, t0 + i - 1].astype(jnp.float32),
                         axis=-1)
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(seq))


def test_gqa_per_row_positions_decode():
    # continuous-batching per-row [b] input_pos through the grouped cache
    # path: row-shifted decode equals the same rows decoded one by one
    model, params, _ = _setup(b=1, t=1)
    cfg = CFG
    b = 2
    cache = init_cache(cfg, b, cache_len=16)
    toks = jax.random.randint(jax.random.PRNGKey(3), (b, 4), 0, cfg.in_size)
    # batch prefill at per-row positions 0 and 2
    pos = jnp.asarray([0, 2], jnp.int32)
    # rows are independent: compare against scalar-pos single-row calls
    logits_rows, cache_rows = model.apply({"params": params}, toks,
                                          cache=cache, input_pos=pos)
    for r in range(b):
        c1 = init_cache(cfg, 1, cache_len=16)
        l1, c1 = model.apply({"params": params}, toks[r:r + 1], cache=c1,
                             input_pos=jnp.int32(int(pos[r])))
        np.testing.assert_allclose(np.asarray(logits_rows[r]),
                                   np.asarray(l1[0]), atol=2e-5)
        for li in range(cfg.n_layer):
            np.testing.assert_allclose(np.asarray(cache_rows[li][0][r]),
                                       np.asarray(c1[li][0][0]), atol=1e-6)


def test_gqa_trains_and_loss_drops():
    import optax

    from tempo_tpu.ops.losses import lm_cross_entropy

    model, params, _ = _setup(b=8, t=16)
    rng = np.random.default_rng(0)
    # learnable pattern: next token = (token + 1) mod V
    base = rng.integers(0, CFG.in_size, size=(8, 17))
    base[:, 1:] = (base[:, :-1] + 1) % CFG.in_size
    batch = jnp.asarray(base, jnp.int32)
    tx = optax.adamw(3e-3)
    opt = tx.init(params)

    def loss_fn(p):
        return lm_cross_entropy(
            model.apply({"params": p}, batch[:, :-1]), batch[:, 1:])

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    losses = []
    for _ in range(80):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < 0.35 * losses[0], (losses[0], losses[-1])


@pytest.mark.slow  # composition variant: GQA and int8 each have fast
# solo coverage; the cross is the heavy sibling
def test_gqa_composes_with_int8_quant():
    # the two serving levers — group-shrunk KV cache and int8 weights —
    # must compose: quantized GQA logits stay close to float GQA, and the
    # quantized cache decode path still matches the full forward greedily
    import dataclasses

    from tempo_tpu.nn.quant import quantize_lm_params

    model, params, tokens = _setup()
    qcfg = dataclasses.replace(CFG, quantize="int8")
    qm = Transformer(qcfg)
    qparams = quantize_lm_params(params)

    ref = np.asarray(model.apply({"params": params}, tokens), np.float64)
    got = np.asarray(qm.apply({"params": qparams}, tokens), np.float64)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel

    prompt = tokens[:, :5]
    dec = generate(qm, qparams, prompt, 6, jax.random.PRNGKey(0),
                   temperature=0.0)
    seq = prompt
    for _ in range(6):
        logits = qm.apply({"params": qparams}, seq)
        nxt = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1)
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(seq))


@pytest.mark.slow  # composition variant: export has fast coverage in
# test_export.py, GQA decode in the tests above
def test_gqa_export_roundtrip(tmp_path):
    from tempo_tpu.infer.export_lm import (export_lm, greedy_decode_exported,
                                           load_exported_lm)

    model, params, _ = _setup()
    out = export_lm(params, CFG, tmp_path / "lm_gqa")
    _, _, meta = load_exported_lm(out)
    assert meta["n_kv_head"] == 2 and meta["n_head"] == 4

    prompt = jax.random.randint(jax.random.PRNGKey(2), (3, 5), 0,
                                CFG.in_size)
    got = greedy_decode_exported(out, prompt, 6)
    ref = np.asarray(generate(model, params, prompt, 6,
                              jax.random.PRNGKey(0), temperature=0.0))
    np.testing.assert_array_equal(np.asarray(got), ref)

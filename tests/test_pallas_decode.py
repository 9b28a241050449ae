"""Active-length Pallas decode attention (ops/pallas_decode.py): exact
against the XLA masked-softmax formulation of nn/transformer.py's cache
path, for MHA and GQA, scalar and per-row positions, at block-boundary
edge cases. Runs the kernel in interpret mode on the CPU mesh; the DMA
elision it exists for is a TPU-runtime property measured on-chip
(tools/bench_toolkit.py --family decode)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.ops.pallas_decode import decode_attention


def _xla_reference(q, ck, cv, pos):
    """The cache-branch math of nn/transformer.py SelfAttention (GQA
    grouped einsum; per-row absolute mask), t = 1."""
    b, t, n, hd = q.shape
    kv = ck.shape[2]
    g = n // kv
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    q_idx = pos[:, None] + jnp.arange(t)
    mask = jnp.arange(ck.shape[1])[None, None, :] <= q_idx[:, :, None]
    qg = q.reshape(b, t, kv, g, hd)
    scores = jnp.einsum("bqkgh,bskh->bkgqs", qg.astype(jnp.float32),
                        ck.astype(jnp.float32)) / np.sqrt(hd)
    scores = jnp.where(mask[:, None, None], scores, -jnp.inf)
    weights = jax.nn.softmax(scores, axis=-1)
    y = jnp.einsum("bkgqs,bskh->bqkgh", weights, cv.astype(jnp.float32))
    return y.reshape(b, t, n, hd)


def _case(b, s, n, kv, hd, pos, block_k=8, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, 1, n, hd)), dtype)
    ck = jnp.asarray(rng.standard_normal((b, s, kv, hd)), dtype)
    cv = jnp.asarray(rng.standard_normal((b, s, kv, hd)), dtype)
    got = decode_attention(q, ck, cv, pos, block_k=block_k, interpret=True)
    want = _xla_reference(q, ck, cv, pos)
    # the kernel emits q's dtype: compare after the same output rounding
    want = want.astype(dtype)
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)
    return got


def test_matches_xla_mha_scalar_pos():
    _case(b=2, s=32, n=4, kv=4, hd=16, pos=11)


def test_matches_xla_gqa_per_row_pos():
    # per-row positions spanning several blocks, incl. block boundaries
    pos = jnp.asarray([0, 7, 8, 31], jnp.int32)  # block_k=8 edges
    _case(b=4, s=32, n=8, kv=2, hd=16, pos=pos)


def test_matches_xla_single_block_and_full_cache():
    _case(b=1, s=8, n=2, kv=2, hd=16, pos=3, block_k=8)   # one block
    _case(b=2, s=16, n=2, kv=1, hd=16, pos=15, block_k=8)  # fully live


def test_bfloat16_inputs_fp32_math():
    got = _case(b=2, s=16, n=4, kv=4, hd=16, pos=9, dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16


def test_generate_with_pallas_decode_matches_xla():
    """Model-level: greedy generate with decode_attn='pallas_interpret'
    (the kernel on the cache decode path) emits exactly the XLA-path
    tokens — GQA config, tiny shapes to keep interpret mode cheap."""
    import dataclasses

    from tempo_tpu.nn.transformer import (Transformer, TransformerConfig,
                                          generate)

    cfg = TransformerConfig(in_size=31, block_size=16, n_layer=1, n_head=4,
                            n_embd=16, n_kv_head=2)
    m = Transformer(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, 31)
    params = m.init(jax.random.PRNGKey(0), toks)["params"]
    want = generate(m, params, toks, 4, rng=jax.random.PRNGKey(5),
                    temperature=0.0)
    m_p = Transformer(dataclasses.replace(cfg,
                                          decode_attn="pallas_interpret"))
    got = generate(m_p, params, toks, 4, rng=jax.random.PRNGKey(5),
                   temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_shape_guards():
    q = jnp.zeros((1, 2, 4, 16))
    c = jnp.zeros((1, 8, 4, 16))
    with pytest.raises(AssertionError, match="single-token"):
        decode_attention(q, c, c, 0, interpret=True)
    with pytest.raises(AssertionError, match="divide"):
        decode_attention(jnp.zeros((1, 1, 4, 16)), jnp.zeros((1, 12, 4, 16)),
                         jnp.zeros((1, 12, 4, 16)), 0, block_k=8,
                         interpret=True)

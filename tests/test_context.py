"""Context (sequence-axis) parallelism: ring attention and the
sequence-sharded transformer loss must equal the unsharded model exactly
(float32 tolerance) on the 8-device CPU mesh — the same pin-equal standard
as every other parallel axis (tests/test_parallel.py). The reference is
single-GPU (SURVEY.md SS2.4); its attention materializes full [T, T]
scores (src/mltools/networks/blocks.py:352-363)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.nn.transformer import Transformer, TransformerConfig
from tempo_tpu.ops.losses import lm_cross_entropy
from tempo_tpu.parallel.context import (
    cp_loss_fn,
    create_cp_mesh,
    make_cp_model,
    ring_attention,
    ring_attention_zigzag,
    shard_tokens_cp,
    zigzag_permutation,
)
from tempo_tpu.parallel.pipeline import shard_map
from jax.sharding import PartitionSpec as P

B, T, N, HD, S = 2, 32, 3, 8, 4


def _qkv():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(B, T, N, HD)), jnp.float32)
    return mk(), mk(), mk()


def _full_attention(q, k, v, causal):
    s = jnp.einsum("bqnh,bknh->bnqk", q, k) / math.sqrt(HD)
    if causal:
        m = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(m[None, None], s, -jnp.inf)
    return jnp.einsum("bnqk,bknh->bqnh", jax.nn.softmax(s, axis=-1), v)


def _ring(causal):
    mesh = create_cp_mesh(S)
    return shard_map(
        lambda q, k, v: ring_attention(q, k, v, causal=causal),
        mesh=mesh, in_specs=(P(None, "seq"),) * 3,
        out_specs=P(None, "seq"), check_rep=False)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_full(causal):
    q, k, v = _qkv()
    out = jax.jit(_ring(causal))(q, k, v)
    expect = _full_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=2e-6)


def test_ring_attention_grads_match():
    # the transpose of ppermute is the reverse-ring ppermute, so jax.grad
    # through the scan IS backward ring attention — pin dq/dk/dv
    q, k, v = _qkv()
    ring = _ring(True)
    g_ring = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(ring(q, k, v))),
                      argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(_full_attention(q, k, v, True))),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def _ring_zigzag():
    mesh = create_cp_mesh(S)
    return shard_map(
        ring_attention_zigzag,
        mesh=mesh, in_specs=(P(None, "seq"),) * 3,
        out_specs=P(None, "seq"), check_rep=False)


def test_zigzag_permutation_is_a_permutation():
    perm = zigzag_permutation(T, S)
    assert sorted(perm.tolist()) == list(range(T))
    # shard d's slice is chunks (d, 2S-1-d): first local chunk ascending
    # early positions, second local chunk the mirrored late ones
    c = T // (2 * S)
    for d in range(S):
        local = perm[d * 2 * c:(d + 1) * 2 * c]
        assert local[0] == d * c and local[c] == (2 * S - 1 - d) * c


def test_ring_attention_zigzag_matches_full():
    # zigzag-permute on the host, run the balanced schedule, un-permute:
    # must equal full causal attention exactly
    q, k, v = _qkv()
    perm = zigzag_permutation(T, S)
    inv = np.argsort(perm)
    out_z = jax.jit(_ring_zigzag())(q[:, perm], k[:, perm], v[:, perm])
    expect = _full_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out_z)[:, inv],
                               np.asarray(expect), atol=2e-6)


@pytest.mark.slow
def test_ring_attention_zigzag_grads_match():
    q, k, v = _qkv()
    perm = zigzag_permutation(T, S)
    ring = _ring_zigzag()
    g_zig = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(
            ring(q[:, perm], k[:, perm], v[:, perm]))),
        argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(_full_attention(q, k, v, True))),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_zig, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def _tiny_gpt(rope: bool):
    cfg = TransformerConfig(in_size=64, block_size=32, n_layer=2, n_head=2,
                            n_embd=16, rope=rope, pos_embed=not rope,
                            attn_impl="xla")
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32), jnp.int32))["params"]
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 64, size=(4, 32)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 64, size=(4, 32)), jnp.int32)
    return cfg, model, params, tokens, targets


def test_cp_transformer_loss_and_grads_match_unsharded():
    cfg, model, params, tokens, targets = _tiny_gpt(rope=True)
    ref_loss = lm_cross_entropy(model.apply({"params": params}, tokens),
                                targets)
    ref_grad = jax.grad(lambda p: lm_cross_entropy(
        model.apply({"params": p}, tokens), targets))(params)

    mesh = create_cp_mesh(S)
    loss_fn = cp_loss_fn(make_cp_model(cfg, mesh), mesh)
    tok_s, tgt_s = shard_tokens_cp(tokens, mesh), shard_tokens_cp(targets,
                                                                  mesh)
    loss = jax.jit(loss_fn)(params, tok_s, tgt_s)
    assert abs(float(loss) - float(ref_loss)) < 5e-6
    grad = jax.jit(jax.grad(loss_fn))(params, tok_s, tgt_s)
    for a, b in zip(jax.tree_util.tree_leaves(grad),
                    jax.tree_util.tree_leaves(ref_grad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cp_wpe_positions_are_global():
    # learned position table: each shard must gather ITS global rows
    cfg, model, params, tokens, targets = _tiny_gpt(rope=False)
    ref_loss = lm_cross_entropy(model.apply({"params": params}, tokens),
                                targets)
    mesh = create_cp_mesh(S)
    loss_fn = cp_loss_fn(make_cp_model(cfg, mesh), mesh)
    loss = jax.jit(loss_fn)(params, shard_tokens_cp(tokens, mesh),
                            shard_tokens_cp(targets, mesh))
    assert abs(float(loss) - float(ref_loss)) < 5e-6


@pytest.mark.parametrize("rope", [True, False])
def test_cp_zigzag_transformer_matches_unsharded(rope):
    # the balanced layout must be invisible end-to-end: zigzag-permuted
    # tokens + per-token global positions (RoPE gather / wpe gather) give
    # the same loss AND grads as the unsharded model
    cfg, model, params, tokens, targets = _tiny_gpt(rope=rope)
    ref_loss = lm_cross_entropy(model.apply({"params": params}, tokens),
                                targets)
    mesh = create_cp_mesh(S)
    loss_fn = cp_loss_fn(make_cp_model(cfg, mesh, zigzag=True), mesh)
    tok_s = shard_tokens_cp(tokens, mesh, zigzag=True)
    tgt_s = shard_tokens_cp(targets, mesh, zigzag=True)
    loss = jax.jit(loss_fn)(params, tok_s, tgt_s)
    assert abs(float(loss) - float(ref_loss)) < 5e-6
    ref_grad = jax.grad(lambda p: lm_cross_entropy(
        model.apply({"params": p}, tokens), targets))(params)
    grad = jax.jit(jax.grad(loss_fn))(params, tok_s, tgt_s)
    for a, b in zip(jax.tree_util.tree_leaves(grad),
                    jax.tree_util.tree_leaves(ref_grad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cp_composes_with_data_axis():
    cfg, model, params, tokens, targets = _tiny_gpt(rope=True)
    ref_loss = lm_cross_entropy(model.apply({"params": params}, tokens),
                                targets)
    mesh = create_cp_mesh(S, n_data=2)
    loss_fn = cp_loss_fn(make_cp_model(cfg, mesh), mesh)
    loss = jax.jit(loss_fn)(params, shard_tokens_cp(tokens, mesh),
                            shard_tokens_cp(targets, mesh))
    assert abs(float(loss) - float(ref_loss)) < 5e-6

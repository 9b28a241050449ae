"""Mixture-of-experts FFN (nn/moe.py) + expert parallelism
(parallel/expert.py). No reference counterpart — correctness is pinned
against a naive per-token routing oracle instead of the torch toolkit."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tempo_tpu.nn.moe import MoEBlock
from tempo_tpu.nn.transformer import Transformer, TransformerConfig
from tempo_tpu.parallel.expert import create_ep_mesh, shard_params_ep

CFG = TransformerConfig(in_size=31, block_size=8, n_layer=2, n_head=2,
                        n_embd=16, rmlp=2, n_experts=4,
                        expert_capacity_factor=8.0)  # no drops


def _gelu(x):
    from scipy.special import erf
    return x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))


def test_moe_matches_naive_routing_oracle():
    """With capacity >= tokens, each token's output must be
    gate * MLP_{argmax}(token), computed here by a plain numpy loop."""
    block = MoEBlock(CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    params = block.init(jax.random.PRNGKey(1), x)["params"]
    y = block.apply({"params": params}, x)

    p = jax.tree.map(np.asarray, params)
    tokens = np.asarray(x).reshape(-1, 16)
    logits = tokens @ p["router"]["kernel"]
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    idx = probs.argmax(-1)
    gate = probs.max(-1)

    naive = np.zeros_like(tokens)
    for n, (e, g) in enumerate(zip(idx, gate)):
        h = _gelu(tokens[n] @ p["w1"][e] + p["b1"][e])
        naive[n] = g * (h @ p["w2"][e] + p["b2"][e])

    np.testing.assert_allclose(np.asarray(y).reshape(-1, 16), naive,
                               atol=1e-5, rtol=1e-4)


def test_moe_capacity_drops_tokens_to_zero():
    """Overflow tokens fall through the residual: their MoE output is
    exactly zero (capacity 1 per expert, 16 tokens, 4 experts)."""
    cfg = dataclasses.replace(CFG, expert_capacity_factor=0.25)  # C = 1
    block = MoEBlock(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    params = block.init(jax.random.PRNGKey(1), x)["params"]
    y = np.asarray(block.apply({"params": params}, x)).reshape(-1, 16)
    dropped = np.all(y == 0.0, axis=-1)
    assert dropped.sum() >= 16 - 4  # at most C=1 token kept per expert
    assert (~dropped).sum() >= 1


def test_moe_aux_loss_sown():
    block = MoEBlock(CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    params = block.init(jax.random.PRNGKey(1), x)["params"]
    _, state = block.apply({"params": params}, x, mutable=["losses"])
    aux = float(state["losses"]["moe_aux"])
    # E * sum(frac_e * prob_e) is 1.0 when perfectly balanced, >= 1 always
    assert np.isfinite(aux) and aux >= 1.0


def test_moe_transformer_forward_and_grads():
    model = Transformer(CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 31)
    targets = jax.random.randint(jax.random.PRNGKey(2), (4, 8), 0, 31)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    assert "moe" in params["h_0"] and "mlp" not in params["h_0"]

    def loss_fn(p):
        logits = model.apply({"params": p}, tokens)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(logp, targets[..., None], -1).mean()

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    for g in jax.tree.leaves(grads):
        assert bool(jnp.all(jnp.isfinite(g)))
    # router gets gradient through the gate values
    assert float(jnp.abs(grads["h_0"]["moe"]["router"]["kernel"]).max()) > 0


def test_expert_parallel_matches_unsharded():
    """4 experts sharded over a 4-device 'expert' mesh: jitted logits and
    grads must equal the unsharded model."""
    model = Transformer(CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 31)
    targets = jax.random.randint(jax.random.PRNGKey(2), (4, 8), 0, 31)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]

    def loss_fn(p):
        logits = model.apply({"params": p}, tokens)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(logp, targets[..., None], -1).mean()

    loss_1, grads_1 = jax.jit(jax.value_and_grad(loss_fn))(params)

    mesh = create_ep_mesh(4)
    params_ep = shard_params_ep(params, mesh)
    w1 = params_ep["h_0"]["moe"]["w1"]
    assert not w1.sharding.is_fully_replicated
    assert params_ep["h_0"]["moe"]["router"]["kernel"].sharding.is_fully_replicated

    loss_ep, grads_ep = jax.jit(jax.value_and_grad(loss_fn))(params_ep)
    np.testing.assert_allclose(float(loss_ep), float(loss_1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads_1), jax.tree.leaves(grads_ep)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_moe_lm_loss_includes_aux():
    from tempo_tpu.nn.moe import moe_lm_loss_fn

    model = Transformer(CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 31)
    targets = jax.random.randint(jax.random.PRNGKey(2), (4, 8), 0, 31)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]

    loss_fn = moe_lm_loss_fn(model, aux_weight=0.5)
    (loss, metrics), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params, tokens, targets)
    assert float(metrics["moe_aux"]) >= 1.0  # balanced minimum
    np.testing.assert_allclose(
        float(loss),
        float(metrics["nll"]) + 0.5 * float(metrics["moe_aux"]), rtol=1e-6)
    # aux routes gradient into the router even where gate grads vanish
    assert float(jnp.abs(grads["h_1"]["moe"]["router"]["kernel"]).max()) > 0


def test_moe_blocks_compose_with_pipeline_parallelism():
    """A 2-stage pipeline over MoE transformer blocks (stage-stacked
    [S, L/S, E, ...] expert weights) matches the unpipelined MoE model."""
    from tempo_tpu.parallel.pipeline import (create_pp_mesh,
                                             make_pipelined_apply,
                                             place_pipeline_params,
                                             split_pipeline_params)

    cfg = dataclasses.replace(CFG, n_layer=4, block_size=16)
    model = Transformer(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 31)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    ref_logits = model.apply({"params": params}, tokens)

    mesh = create_pp_mesh(2)
    rest, stack = place_pipeline_params(mesh,
                                        *split_pipeline_params(params, 2))
    pp_logits = jax.jit(make_pipelined_apply(cfg, 2, 4, mesh))(
        rest, stack, tokens)
    np.testing.assert_allclose(np.asarray(pp_logits), np.asarray(ref_logits),
                               atol=2e-5, rtol=2e-5)


def test_gpt_decay_mask_name_keyed():
    """Weight decay hits exactly kernels / expert matmuls / embeddings —
    never biases or norm scales — including 2-D MoE biases and
    pipeline-stacked (rank-shifted) leaves."""
    from tempo_tpu.nn.transformer import gpt_decay_mask
    from tempo_tpu.parallel.pipeline import split_pipeline_params

    model = Transformer(CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 31)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]

    mask = gpt_decay_mask(params)
    moe = mask["h_0"]["moe"]
    assert moe["w1"] and moe["w2"] and moe["router"]["kernel"]
    assert not moe["b1"] and not moe["b2"]  # 2-D but biases: no decay
    assert mask["wte"] and mask["wpe"]
    assert not mask["ln_f"]["scale"] and not mask["ln_f"]["bias"]
    assert not mask["h_0"]["attn"]["c_attn"]["bias"]

    # stacking shifts ranks but not names: the mask must be unchanged
    split = split_pipeline_params(params, 2)
    split_mask = gpt_decay_mask(split)
    rest_mask, stack_mask = split_mask
    assert not stack_mask["moe"]["b1"]  # now 4-D, still no decay
    assert stack_mask["moe"]["w1"]
    assert rest_mask["wte"]


def test_moe_top2_matches_naive_routing_oracle():
    """expert_top_k=2 with capacity >= all routes: each token's output is
    g0*MLP_{e0}(x) + g1*MLP_{e1}(x) with the two gates renormalized."""
    cfg = dataclasses.replace(CFG, expert_top_k=2)
    block = MoEBlock(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    params = block.init(jax.random.PRNGKey(1), x)["params"]
    y = np.asarray(block.apply({"params": params}, x)).reshape(-1, 16)

    p = jax.tree.map(np.asarray, params)
    tokens = np.asarray(x).reshape(-1, 16)
    logits = tokens @ p["router"]["kernel"]
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    order = np.argsort(-probs, axis=-1)

    naive = np.zeros_like(tokens)
    for i in range(tokens.shape[0]):
        e0, e1 = order[i, 0], order[i, 1]
        g = probs[i, [e0, e1]]
        g = g / g.sum()
        for e_idx, g_r in ((e0, g[0]), (e1, g[1])):
            h = _gelu(tokens[i] @ p["w1"][e_idx] + p["b1"][e_idx])
            naive[i] += g_r * (h @ p["w2"][e_idx] + p["b2"][e_idx])

    np.testing.assert_allclose(y, naive, atol=1e-5, rtol=1e-4)


def test_moe_top2_rank_major_overflow():
    """With capacity for exactly the primary routes, secondary routes drop
    first: the result equals top-1 routing with renormalized-gate scaling
    only where the secondary overflowed."""
    cfg = dataclasses.replace(CFG, expert_top_k=2,
                              expert_capacity_factor=0.5)  # C = k*N/E*0.5
    block = MoEBlock(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 16))
    params = block.init(jax.random.PRNGKey(1), x)["params"]
    y = np.asarray(block.apply({"params": params}, x))
    assert np.isfinite(y).all()
    # grads still flow
    g = jax.grad(lambda pp: jnp.sum(block.apply({"params": pp}, x) ** 2))(
        params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


def test_fsdp_experts_in_pipeline_match_unsharded():
    """('data','pipe') mesh with fsdp_experts: stacked expert weights are
    stored sharded over 'data' (each slice holds 1/D of every expert),
    all-gathered at stage entry; loss/grads equal the unpipelined model
    and the gradient arrays come back still FSDP-sharded (the gather's
    reduce-scatter transpose)."""
    from tempo_tpu.parallel.pipeline import (create_pp_mesh, make_pp_loss_fn,
                                             merge_pipeline_params,
                                             place_pipeline_params,
                                             split_pipeline_params)

    cfg = dataclasses.replace(CFG, n_layer=4, block_size=16)
    model = Transformer(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 31)
    targets = jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, 31)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]

    def ref_loss(p, tok, tgt):
        logits = model.apply({"params": p}, tok)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0].mean()

    l_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(
        params, tokens, targets)

    mesh = create_pp_mesh(2, n_data=2)
    rest, stack = place_pipeline_params(
        mesh, *split_pipeline_params(params, 2), fsdp_experts=True)
    w1 = stack["moe"]["w1"]
    # stored sharded: expert axis split over 'data'
    assert w1.sharding.spec == (("pipe", None, "data")) or \
        tuple(w1.sharding.spec) == ("pipe", None, "data")
    assert (w1.addressable_shards[0].data.shape[2] * 2 == w1.shape[2])

    loss_fn = make_pp_loss_fn(cfg, 2, 4, mesh, fsdp_experts=True)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_fn))(
        (rest, stack), tokens, targets)

    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    assert tuple(g_pp[1]["moe"]["w1"].sharding.spec) == \
        ("pipe", None, "data")  # grads stay sharded, never materialized full
    merged = merge_pipeline_params(jax.device_get(g_pp[0]),
                                   jax.device_get(g_pp[1]))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

"""LoRA fine-tuning (nn/lora.py): zero-init exactness, adapter math,
gradient flow to adapters only, stacked-kernel (MoE) adaptation, and an
end-to-end fine-tune where the loss drops while the base stays frozen.

No reference counterpart (the toolkit re-trains full weights,
src/mltools/networks/networks.py:626-681) — the oracle is internal math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tempo_tpu.nn.lora import (
    apply_lora,
    init_lora,
    lora_loss_fn,
    merge_lora,
    num_lora_params,
)
from tempo_tpu.nn.transformer import Transformer, TransformerConfig
from tempo_tpu.ops.losses import lm_cross_entropy

CFG = TransformerConfig(in_size=61, block_size=32, n_layer=2, n_head=4,
                        n_embd=32, attn_impl="xla")


def _setup(cfg=CFG, b=4, t=16, seed=0):
    model = Transformer(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(seed + 1), (b, t), 0,
                                cfg.in_size)
    params = model.init(jax.random.PRNGKey(seed), tokens)["params"]
    return model, params, tokens


def test_init_shapes_and_zero_exactness():
    model, params, tokens = _setup()
    lora = init_lora(params, rank=4, rng=jax.random.PRNGKey(2))
    # adapters only on matmul kernels; b starts at zero
    attn = lora["h_0"]["attn"]["c_attn"]["kernel"]
    assert attn["a"].shape == (32, 4) and attn["b"].shape == (4, 3 * 32)
    assert float(jnp.abs(attn["b"]).max()) == 0.0
    assert "ln_1" not in lora["h_0"] and "wte" not in lora
    # far fewer trainable params than the base
    base_n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert num_lora_params(lora) < 0.25 * base_n
    # b=0 => adapted tree is the base tree, bit-for-bit, so the forward
    # pass at step 0 is the frozen model's
    adapted = apply_lora(params, lora)
    for p, a in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(adapted)):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(a))

    with pytest.raises(ValueError):
        init_lora(params, rank=0, rng=jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        init_lora(params, rank=4, rng=jax.random.PRNGKey(0),
                  targets=("no_such_leaf",))


def test_adapter_math_and_merge():
    _, params, _ = _setup()
    lora = init_lora(params, rank=3, rng=jax.random.PRNGKey(4))
    # give one b real values so the delta is nonzero
    lora["h_1"]["mlp"]["c_fc"]["kernel"]["b"] = 0.05 * jnp.ones_like(
        lora["h_1"]["mlp"]["c_fc"]["kernel"]["b"])
    scale = 2.0
    adapted = apply_lora(params, lora, scale=scale)
    want = (np.asarray(params["h_1"]["mlp"]["c_fc"]["kernel"])
            + scale * np.asarray(lora["h_1"]["mlp"]["c_fc"]["kernel"]["a"])
            @ np.asarray(lora["h_1"]["mlp"]["c_fc"]["kernel"]["b"]))
    np.testing.assert_allclose(
        np.asarray(adapted["h_1"]["mlp"]["c_fc"]["kernel"]), want,
        rtol=1e-6, atol=1e-7)
    # untouched leaves stay identical
    np.testing.assert_array_equal(
        np.asarray(adapted["h_0"]["ln_1"]["scale"]),
        np.asarray(params["h_0"]["ln_1"]["scale"]))
    # merge is the same map (exported tree == served adapted tree)
    merged = merge_lora(params, lora, scale=scale)
    for a, m in zip(jax.tree_util.tree_leaves(adapted),
                    jax.tree_util.tree_leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(m))


def test_moe_stacked_experts_get_batched_adapters():
    cfg = TransformerConfig(in_size=61, block_size=32, n_layer=1, n_head=4,
                            n_embd=32, n_experts=2, attn_impl="xla")
    _, params, _ = _setup(cfg)
    lora = init_lora(params, rank=2, rng=jax.random.PRNGKey(5))
    moe = lora["h_0"]["moe"]
    # [E, d, f] expert kernels adapt per-expert: leading axis preserved
    assert moe["w1"]["a"].shape[0] == 2 and moe["w1"]["a"].shape[-1] == 2
    assert moe["w2"]["b"].shape[0] == 2
    lora2 = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, 0.02) if x.shape[-1] != 2 else x, lora)
    adapted = apply_lora(params, lora2)
    want = (np.asarray(params["h_0"]["moe"]["w1"])
            + np.einsum("eir,ero->eio", np.asarray(lora2["h_0"]["moe"]
                                                   ["w1"]["a"]),
                        np.asarray(lora2["h_0"]["moe"]["w1"]["b"])))
    np.testing.assert_allclose(np.asarray(adapted["h_0"]["moe"]["w1"]),
                               want, rtol=1e-6, atol=1e-7)


def test_finetune_trains_adapters_only_and_loss_drops():
    model, params, tokens = _setup()
    inp, tgt = tokens[:, :-1], tokens[:, 1:]

    def base_loss(p, x, y):
        return lm_cross_entropy(model.apply({"params": p}, x), y)

    loss = lora_loss_fn(base_loss, params)
    lora = init_lora(params, rank=4, rng=jax.random.PRNGKey(7))
    opt = optax.adamw(3e-3)
    opt_state = opt.init(lora)

    @jax.jit
    def step(lora, opt_state, x, y):
        l, g = jax.value_and_grad(loss)(lora, x, y)
        updates, opt_state = opt.update(g, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, l

    params_before = jax.tree_util.tree_map(np.asarray, params)
    losses = []
    for _ in range(30):
        lora, opt_state, l = step(lora, opt_state, inp, tgt)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.05, losses[::10]
    # the frozen base never moved
    for before, after in zip(jax.tree_util.tree_leaves(params_before),
                             jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(before, np.asarray(after))
    # serving path: merged plain tree reproduces the adapted model
    merged = merge_lora(params, lora)
    out_merged = model.apply({"params": merged}, inp)
    out_adapted = model.apply({"params": apply_lora(params, lora)}, inp)
    np.testing.assert_allclose(np.asarray(out_merged),
                               np.asarray(out_adapted), rtol=1e-5,
                               atol=1e-5)
    # gradients exist for every adapter pair (none are dead)
    g = jax.grad(loss)(lora, inp, tgt)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()

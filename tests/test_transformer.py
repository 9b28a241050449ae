"""Transformer parity vs the reference toolkit's torch GPT.

Oracle: /root/reference/src/mltools (networks.py Transformer, blocks.py
SelfAttentionBlock/TransformerBlock, configs.py GPTConfig) imported live;
every test maps torch weights through tempo_tpu.interop.gpt_ckpt and pins
the flax forward (and the capture/patch/interp surfaces) to the torch
numerics in float32.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.interop.gpt_ckpt import (
    params_from_hf_gpt2,
    params_from_torch_transformer,
)
from tempo_tpu.nn.transformer import (
    Transformer,
    TransformerConfig,
    cached_forward,
    estimate_mfu,
    generate,
    make_gpt_optimizer,
    nucleus_mask,
    num_params,
)

torch = pytest.importorskip("torch")

REF_SRC = Path("/root/reference/src")
pytestmark = pytest.mark.skipif(not REF_SRC.exists(),
                                reason="reference tree not mounted")
if str(REF_SRC) not in sys.path:
    sys.path.insert(0, str(REF_SRC))


def _oracle():
    from mltools.models.configs import GPTConfig
    from mltools.networks.networks import Transformer as TorchTransformer

    return TorchTransformer, GPTConfig


SMALL = dict(in_size=97, block_size=16, n_layer=2, n_head=4, n_embd=32,
             dropout=0.0, bias=True)


def _pair(**overrides):
    """(torch model, flax model, imported params) with identical weights."""
    TorchTransformer, GPTConfig = _oracle()
    kw = dict(SMALL, **overrides)
    torch.manual_seed(0)
    tm = TorchTransformer(GPTConfig(verbose=0, **kw)).eval()
    cfg = TransformerConfig(**kw)
    params = params_from_torch_transformer(tm.state_dict(), cfg)
    return tm, Transformer(cfg), params


def _tokens(cfg=None, b=2, t=12):
    rng = np.random.default_rng(1)
    return rng.integers(0, SMALL["in_size"], size=(b, t))


def test_forward_parity_tokenized():
    tm, jm, params = _pair()
    idx = _tokens()
    with torch.no_grad():
        ref = tm(torch.from_numpy(idx)).numpy()
    out = np.asarray(jm.apply({"params": params}, jnp.asarray(idx)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_forward_parity_untied_head():
    tm, jm, params = _pair(tie_emb=False)
    idx = _tokens()
    with torch.no_grad():
        ref = tm(torch.from_numpy(idx)).numpy()
    out = np.asarray(jm.apply({"params": params}, jnp.asarray(idx)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_forward_parity_rope_untokenized():
    """RoPE adjacent-pair rotation + TiedLinear feature IO
    (reference: blocks.py:252-292, networks.py:405-416)."""
    tm, jm, params = _pair(rope=True, pos_embed=False, tokenized=False,
                           in_size=16, causal=True)
    x = np.random.default_rng(2).standard_normal((2, 12, 16)).astype(
        np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_capture_parity():
    """Activation capture must expose the reference's hiddens, same names
    and layouts (networks.py:529-564, blocks.py:333-369, 459-467)."""
    tm, jm, params = _pair()
    idx = _tokens()
    with torch.no_grad():
        ref_logits, ref_hid = tm.cached_forward(torch.from_numpy(idx))
    out, hid = cached_forward(jm, params, jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(out), ref_logits.numpy(),
                               atol=2e-5, rtol=1e-5)

    shared = set(hid) & set(ref_hid)
    # every interpretability surface the reference exposes is present
    for want in ("tok_emb", "pos_emb", "x_0", "x_1", "x_2", "x_ln_f",
                 "q^1", "k^2", "v^1", "attn_um^1", "attn^2", "y_out^1",
                 "y_out_proj^2", "attn_res^1", "x_attn^2", "mlp_res^1"):
        assert want in shared, f"missing hidden {want}"
    for key in sorted(shared):
        np.testing.assert_allclose(
            np.asarray(hid[key]), ref_hid[key].numpy(), atol=2e-5,
            rtol=1e-4, err_msg=f"hidden {key}")


def test_capture_parity_rope():
    tm, jm, params = _pair(rope=True, pos_embed=False)
    idx = _tokens()
    with torch.no_grad():
        ref_logits, ref_hid = tm.cached_forward(torch.from_numpy(idx))
    out, hid = cached_forward(jm, params, jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(out), ref_logits.numpy(),
                               atol=2e-5, rtol=1e-5)
    for want in ("kT^1", "qT^2", "k_rope^1", "q_rope^2", "v^1"):
        assert want in set(hid) & set(ref_hid)
    for key in sorted(set(hid) & set(ref_hid)):
        np.testing.assert_allclose(
            np.asarray(hid[key]), ref_hid[key].numpy(), atol=2e-5,
            rtol=1e-4, err_msg=f"hidden {key}")


def test_patch_parity():
    """Activation patching x + w*(patch - x) at named points must match the
    torch patched_forward (network_tools.py:65-76, networks.py:566-601)."""
    tm, jm, params = _pair()
    idx = _tokens()
    rng = np.random.default_rng(3)
    b, t, e = 2, 12, SMALL["n_embd"]
    patches_np = {
        "x_attn^1": rng.standard_normal((b, t, e)).astype(np.float32),
        "attn^2": jax.nn.softmax(jnp.asarray(
            rng.standard_normal((b, SMALL["n_head"], t, t)),
            dtype=jnp.float32), axis=-1),
        "mlp_res^2": rng.standard_normal((b, t, e)).astype(np.float32),
    }
    w = 0.37
    torch_patches = {k: (torch.from_numpy(np.asarray(v)), w)
                     for k, v in patches_np.items()}
    with torch.no_grad():
        ref = tm.patched_forward(torch.from_numpy(idx),
                                 torch_patches).numpy()
    taps = {k: (jnp.asarray(v), w) for k, v in patches_np.items()}
    out = np.asarray(jm.apply({"params": params}, jnp.asarray(idx),
                              taps=taps))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
    # and the patch actually changed the output
    base = np.asarray(jm.apply({"params": params}, jnp.asarray(idx)))
    assert np.abs(out - base).max() > 1e-3


def test_generate_kv_cache_matches_full_forward():
    """The scan/KV-cache decode must reproduce the full-recompute greedy
    trajectory (the reference's generate recomputes the whole prefix per
    token, networks.py:727-754)."""
    _, jm, params = _pair()
    idx = jnp.asarray(_tokens(b=2, t=4))
    toks = generate(jm, params, idx, 8, jax.random.PRNGKey(0), top_k=1)
    assert toks.shape == (2, 12)

    ref = idx
    for _ in range(8):
        logits = jm.apply({"params": params}, ref)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        ref = jnp.concatenate([ref, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_hf_gpt2_import_parity():
    """GPT-2 checkpoint import (the reference's from_pretrained capability,
    networks.py:626-681) validated against a locally constructed
    GPT2LMHeadModel — no download, same weights, same logits."""
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.GPT2Config(
        vocab_size=211, n_positions=32, n_embd=48, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    cfg, params = params_from_hf_gpt2(hf)
    idx = np.random.default_rng(4).integers(0, 211, size=(2, 10))
    with torch.no_grad():
        ref = hf(torch.from_numpy(idx)).logits.numpy()
    out = np.asarray(Transformer(cfg).apply({"params": params},
                                            jnp.asarray(idx)))
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


def test_optimizer_decay_split_matches_reference():
    """optax mask == the reference's two AdamW groups: >=2-D decayed,
    biases/norm scales not (networks.py:683-709)."""
    tm, jm, params = _pair()
    n_decay_ref = sum(p.numel() for _, p in tm.named_parameters()
                      if p.requires_grad and p.dim() >= 2)
    n_nodecay_ref = sum(p.numel() for _, p in tm.named_parameters()
                        if p.requires_grad and p.dim() < 2)
    # torch ties wte to lm_head (one tensor); flax stores wte once too
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda p: (p.ndim >= 2) * p.size, params))
    n_decay = sum(flat)
    n_total = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert n_decay == n_decay_ref
    assert n_total - n_decay == n_nodecay_ref

    tx = make_gpt_optimizer(params, 0.1, 3e-4, (0.9, 0.95))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert all(np.all(np.isfinite(u))
               for u in jax.tree_util.tree_leaves(updates))


def test_embedder_dict_mode():
    """Named embedder/unembedder modules (networks.py:446-466, 508-526):
    inputs are dicts, embeddings summed, output through unembedders['x']."""
    import flax.linen as nn

    cfg = TransformerConfig(in_size=8, block_size=16, n_layer=1, n_head=2,
                            n_embd=16, pos_embed=True)
    model = Transformer(cfg,
                        embedders={"x": nn.Dense(16), "cond": nn.Dense(16)},
                        unembedders={"x": nn.Dense(5)})
    x = {"x": jnp.ones((2, 6, 8)), "cond": jnp.ones((2, 6, 3))}
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 6, 5)
    assert "embedders_x" in params or "embedders" in str(params.keys()) or \
        any("Dense" in k or "embed" in k.lower() for k in params)

    def loss(p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(g))
               for g in jax.tree_util.tree_leaves(grads))


def test_num_params_and_mfu():
    tm, jm, params = _pair()
    # reference convention: position table excluded (gpt_model.py:14-20)
    ref_n = sum(p.numel() for p in tm.parameters())
    ref_n -= tm.transformer.wpe.weight.numel()
    assert num_params(params) == ref_n
    mfu = estimate_mfu(jm.config, num_params(params), fwdbwd_per_iter=8,
                       dt=0.1)
    assert 0 < mfu < 1


def test_gpt_trains_end_to_end():
    """Training pin (no oracle needed): a tiny GPT memorizes a fixed token
    sequence under the decay-split AdamW, with the whole optimization loop
    scanned into one compiled program."""
    import optax

    cfg = TransformerConfig(in_size=17, block_size=8, n_layer=2, n_head=2,
                            n_embd=16, dropout=0.0, bias=True)
    model = Transformer(cfg)
    seq = np.asarray([[3, 1, 4, 1, 5, 9, 2, 6],
                      [2, 7, 1, 8, 2, 8, 1, 8]], np.int32)
    x, y = jnp.asarray(seq[:, :-1]), jnp.asarray(seq[:, 1:])
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = make_gpt_optimizer(params, weight_decay=0.1, learning_rate=3e-3,
                            betas=(0.9, 0.95))
    opt_state = tx.init(params)

    def loss_of(p):
        logits = model.apply({"params": p}, x)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, y[..., None],
                                             axis=-1))

    @jax.jit
    def train(params, opt_state):
        def step(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_of)(p)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss
        (p, o), losses = jax.lax.scan(step, (params, opt_state), None,
                                      length=150)
        return p, losses

    params, losses = train(params, opt_state)
    assert float(losses[-1]) < 0.3 * float(losses[0])
    assert np.all(np.isfinite(np.asarray(losses)))
    # and the trained model continues the sequence greedily
    out = generate(model, params, jnp.asarray(seq[:, :4]),
                   max_new_tokens=3, rng=jax.random.PRNGKey(1),
                   temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out[:, 4:7]), seq[:, 4:7])


def test_bf16_first_moment_optimizer():
    """moments_dtype='bfloat16' stores AdamW's mu in bf16 (a third of
    optimizer memory) while nu stays f32, and a step still reduces the
    loss on the memorization task."""
    import optax

    from tempo_tpu.nn.transformer import make_gpt_optimizer

    cfg = TransformerConfig(in_size=17, block_size=8, n_layer=1, n_head=2,
                            n_embd=16)
    model = Transformer(cfg)
    seq = np.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], np.int32)
    x, y = jnp.asarray(seq[:, :-1]), jnp.asarray(seq[:, 1:])
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = make_gpt_optimizer(params, weight_decay=0.1, learning_rate=3e-3,
                            betas=(0.9, 0.95), moments_dtype="bfloat16")
    opt_state = tx.init(params)
    mus = [l for l in jax.tree_util.tree_leaves(opt_state)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment leaves found"

    def loss_of(p):
        logits = model.apply({"params": p}, x)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(logp, y[..., None], -1))

    @jax.jit
    def train(params, opt_state):
        def step(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_of)(p)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss
        return jax.lax.scan(step, (params, opt_state), None, length=80)

    (_, _), losses = train(params, opt_state)
    assert float(losses[-1]) < 0.5 * float(losses[0])


def test_remat_matches_plain_fwd_and_grads():
    """cfg.remat must change memory only: logits and parameter gradients
    stay numerically identical to the unrematerialized blocks (same trade
    the VAE pins in test_vae.py for models/vae.py remat)."""
    import dataclasses as _dc

    cfg = TransformerConfig(in_size=17, block_size=8, n_layer=2, n_head=2,
                            n_embd=16, dropout=0.0, bias=True)
    m_plain = Transformer(cfg)
    m_remat = Transformer(_dc.replace(cfg, remat=True))
    seq = np.asarray([[3, 1, 4, 1, 5, 9, 2, 6],
                      [2, 7, 1, 8, 2, 8, 1, 8]], np.int32)
    x, y = jnp.asarray(seq[:, :-1]), jnp.asarray(seq[:, 1:])
    params = m_plain.init(jax.random.PRNGKey(0), x)["params"]

    def loss_of(model):
        def f(p):
            logits = model.apply({"params": p}, x)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(logp, y[..., None], -1))
        return f

    # remat-wrapped blocks must accept the same param tree (no extra scope)
    lp, gp = jax.value_and_grad(loss_of(m_plain))(params)
    lr_, gr = jax.value_and_grad(loss_of(m_remat))(params)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lr_), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-6),
        gp, gr)


def test_lm_cross_entropy_matches_log_softmax_gather():
    """The fused (logsumexp - label logit) LM loss used by every training
    path must equal the reference log_softmax + gather formulation."""
    from tempo_tpu.ops.losses import lm_cross_entropy

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 6, 33)) * 4.0, jnp.float32)
    targets = jnp.asarray(rng.integers(0, 33, (2, 6)), jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    want = -jnp.take_along_axis(logp, targets[..., None], axis=-1).mean()
    got = lm_cross_entropy(logits, targets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    # bf16 logits: reductions still happen in f32
    got16 = lm_cross_entropy(logits.astype(jnp.bfloat16), targets)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(want), rtol=2e-2)


def test_attn_impl_routing():
    """'auto' resolves to the XLA path off-TPU and for ragged sequences;
    the forced modes obey. (The flash kernel itself is exercised on the
    real chip — tools/profile_gpt.py and the on-chip train_gpt runs.)"""
    from tempo_tpu.nn.transformer import _flash_ok

    auto = TransformerConfig(attn_impl="auto")
    on_tpu = jax.default_backend() == "tpu"
    assert _flash_ok(auto, 1024) == on_tpu
    assert not _flash_ok(auto, 640)     # not a multiple of 512
    assert not _flash_ok(auto, 256)     # shorter than one k block
    assert _flash_ok(TransformerConfig(attn_impl="flash"), 8)
    assert not _flash_ok(TransformerConfig(attn_impl="xla"), 1024)
    with pytest.raises(AssertionError):
        _flash_ok(TransformerConfig(attn_impl="bogus"), 1024)


def test_lm_cross_entropy_gradient_matches_autodiff():
    """The hand-written softmax-minus-onehot VJP must equal autodiff of the
    log_softmax formulation."""
    from tempo_tpu.ops.losses import lm_cross_entropy

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 5, 19)) * 3.0, jnp.float32)
    targets = jnp.asarray(rng.integers(0, 19, (3, 5)), jnp.int32)

    def ref(lg):
        logp = jax.nn.log_softmax(lg, axis=-1)
        return -jnp.take_along_axis(logp, targets[..., None], axis=-1).mean()

    g_ref = jax.grad(ref)(logits)
    g_got = jax.grad(lambda lg: lm_cross_entropy(lg, targets))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


def test_nucleus_mask_keeps_exact_nucleus():
    """top-p keeps the smallest prefix of the sorted distribution whose
    mass reaches p, INCLUDING the token that crosses the boundary."""
    probs = np.array([[0.4, 0.05, 0.35, 0.2]], np.float32)
    logits = jnp.log(jnp.asarray(probs))
    # sorted: 0.4, 0.35, 0.2, 0.05; exclusive cumsum 0, .4, .75, .95
    # top_p=0.5 -> keep {0.4, 0.35} (0.35 crosses the boundary)
    masked = np.asarray(nucleus_mask(logits, 0.5))
    assert np.isfinite(masked[0, 0]) and np.isfinite(masked[0, 2])
    assert masked[0, 1] == -np.inf and masked[0, 3] == -np.inf
    # kept logits are untouched (renormalization happens in categorical)
    np.testing.assert_allclose(masked[0, [0, 2]],
                               np.log(probs[0, [0, 2]]), rtol=1e-6)
    # top_p ~ 1 keeps everything
    assert np.isfinite(np.asarray(nucleus_mask(logits, 0.999))).all()


def test_generate_top_p():
    """top_p=1.0 is a no-op (bit-equal to unrestricted sampling); a tiny
    top_p collapses the nucleus to the argmax and must reproduce greedy
    decode through the whole KV-cache scan."""
    _, jm, params = _pair()
    idx = jnp.asarray(_tokens(b=2, t=4))
    rng = jax.random.PRNGKey(3)
    plain = generate(jm, params, idx, 6, rng)
    full = generate(jm, params, idx, 6, rng, top_p=1.0)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(full))

    nucleus1 = generate(jm, params, idx, 6, rng, top_p=1e-6)
    greedy = generate(jm, params, idx, 6, rng, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(nucleus1), np.asarray(greedy))

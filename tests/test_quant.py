"""Weight-only int8 serving quantization (tempo_tpu.nn.quant).

No reference oracle exists (the reference serves in full precision);
the pins are internal: exact round-trip on dequantized weights, bounded
logit error on raw trained-precision weights, and the full jitted
KV-cache generate running on the quantized tree.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.nn.quant import quantize_kernel, quantize_lm_params
from tempo_tpu.nn.transformer import Transformer, TransformerConfig, generate

CFG = TransformerConfig(in_size=211, block_size=64, n_layer=2, n_head=2,
                        n_embd=32, rope=True, pos_embed=False,
                        tie_emb=False, dropout=0.0)


def _models():
    fp = Transformer(CFG)
    q = Transformer(dataclasses.replace(CFG, quantize="int8"))
    return fp, q


def _init(model, batch=2, t=16, seed=0):
    tok = jnp.asarray(np.random.default_rng(seed).integers(
        0, CFG.in_size, (batch, t), dtype=np.int32))
    params = jax.jit(lambda k, x: model.init(k, x)["params"])(
        jax.random.PRNGKey(seed), tok)
    return params, tok


def _dequantize(tree):
    """Quantized tree -> the float tree encoding exactly the same
    weights (kernel = kernel_q * scale; wte = wte_q * row scale)."""
    if isinstance(tree, dict):
        if "kernel_q" in tree:
            out = {"kernel": (tree["kernel_q"].astype(jnp.float32)
                              * tree["scale"])}
            if "bias" in tree:
                out["bias"] = tree["bias"]
            return out
        out = {}
        for k, v in tree.items():
            if k == "wte_q":
                out["wte"] = (v.astype(jnp.float32)
                              * tree["wte_scale"][:, None])
            elif k == "wte_scale":
                pass
            else:
                out[k] = _dequantize(v)
        return out
    return tree


def test_quantize_kernel_roundtrip_exact():
    """Dequantized kernels are a fixed point: quantizing them again
    reproduces (kernel_q, scale) bit-exactly."""
    rng = np.random.default_rng(0)
    k = rng.standard_normal((24, 40)).astype(np.float32)
    q, scale = quantize_kernel(k)
    assert q.dtype == jnp.int8 and scale.shape == (40,)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    q2, scale2 = quantize_kernel(deq)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q2))
    np.testing.assert_array_equal(np.asarray(scale), np.asarray(scale2))
    # zero columns quantize to zeros with the sentinel scale 1.0
    q0, s0 = quantize_kernel(np.zeros((8, 3), np.float32))
    assert np.all(np.asarray(q0) == 0) and np.all(np.asarray(s0) == 1.0)


def test_quantized_forward_exact_on_dequantized_weights():
    """QuantDense == Dense when the float weights are exactly
    representable: fp32 forward on (kernel_q * scale) must match the
    quantized forward to numerical identity."""
    fp, qm = _models()
    params, tok = _init(fp)
    qparams = quantize_lm_params(params)
    fp_equiv = _dequantize(qparams)

    out_q = jax.jit(lambda p, x: qm.apply({"params": p}, x))(qparams, tok)
    out_fp = jax.jit(lambda p, x: fp.apply({"params": p}, x))(fp_equiv, tok)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_fp),
                               atol=1e-5, rtol=1e-5)


def test_quantized_logits_close_to_float():
    """On raw (not-representable) weights the per-channel int8 error stays
    small end to end."""
    fp, qm = _models()
    params, tok = _init(fp, seed=1)
    qparams = quantize_lm_params(params)

    ref = np.asarray(fp.apply({"params": params}, tok), np.float64)
    got = np.asarray(qm.apply({"params": qparams}, tok), np.float64)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.995, cos


def test_quantized_generate_runs_jitted():
    """The full serving path — jitted prefill + scanned KV-cache decode —
    runs on the quantized tree and matches its own eager trace."""
    fp, qm = _models()
    params, _ = _init(fp, seed=2)
    qparams = quantize_lm_params(params)
    prompt = jnp.asarray(np.random.default_rng(3).integers(
        0, CFG.in_size, (2, 8), dtype=np.int32))

    run = jax.jit(lambda p, key: generate(qm, p, prompt, 12, rng=key,
                                          temperature=1.0))
    out = run(qparams, jax.random.PRNGKey(4))
    assert out.shape == (2, 20)
    eager = generate(qm, qparams, prompt, 12, rng=jax.random.PRNGKey(4),
                     temperature=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(eager))


def test_quantize_param_bytes_shrink():
    """The point of the exercise: the block kernels' in-memory footprint
    drops ~4x vs float32 (int8 + one f32 scale per column)."""
    fp, _ = _models()
    params, _ = _init(fp, seed=5)
    qparams = quantize_lm_params(params)

    def nbytes(tree, pred):
        return sum(l.size * l.dtype.itemsize
                   for path, l in
                   jax.tree_util.tree_flatten_with_path(tree)[0]
                   if pred(path))

    is_kernel = lambda p: getattr(p[-1], "key", "") in ("kernel", "kernel_q")
    before = nbytes(params, is_kernel)
    after = nbytes(qparams, is_kernel)
    # wte stays float; the block kernels dominate this tiny config too
    assert after < 0.5 * before, (before, after)


def test_quantized_tied_embedding_exact():
    """GPT-2 shape (tied head): the int8 token table is exact on
    dequantized weights through BOTH uses — the input gather and the
    h @ wte.T logit matmul with its per-logit scale."""
    cfg = dataclasses.replace(CFG, tie_emb=True, pos_embed=True, rope=False)
    fp = Transformer(cfg)
    qm = Transformer(dataclasses.replace(cfg, quantize="int8"))
    tok = jnp.asarray(np.random.default_rng(11).integers(
        0, cfg.in_size, (2, 12), dtype=np.int32))
    params = jax.jit(lambda k, x: fp.init(k, x)["params"])(
        jax.random.PRNGKey(11), tok)
    qparams = quantize_lm_params(params)
    assert qparams["wte_q"].dtype == jnp.int8
    assert qparams["wte_scale"].shape == (cfg.in_size,)

    out_q = qm.apply({"params": qparams}, tok)
    out_fp = fp.apply({"params": _dequantize(qparams)}, tok)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_fp),
                               atol=1e-5, rtol=1e-5)

    # and the serving path runs on it
    run = jax.jit(lambda p, key: generate(qm, p, tok[:, :4], 6, rng=key,
                                          temperature=0.0))
    assert run(qparams, jax.random.PRNGKey(0)).shape == (2, 10)


@pytest.mark.slow  # composition variant: quant solo exactness and
# the jitted quantized decode stay fast; the export cross re-exports
# a full artifact set
def test_quantized_export_roundtrip(tmp_path):
    """int8 weights survive the StableHLO serving export: the exported
    greedy decode equals the live quantized generate, and the artifact
    records the quantize mode."""
    from tempo_tpu.infer.export_lm import (export_lm, greedy_decode_exported,
                                           load_exported_lm)

    fp, qm = _models()
    params, _ = _init(fp, seed=7)
    qparams = quantize_lm_params(params)

    out = export_lm(qparams, qm.config, tmp_path / "lm_int8")
    _, _, meta = load_exported_lm(out)
    assert meta["quantize"] == "int8"

    prompt = jnp.asarray(np.random.default_rng(8).integers(
        0, CFG.in_size, (3, 5), dtype=np.int32))
    got = greedy_decode_exported(out, prompt, 6)
    ref = np.asarray(generate(qm, qparams, prompt, 6,
                              rng=jax.random.PRNGKey(9), temperature=0.0))
    np.testing.assert_array_equal(got, ref)


def test_generate_cache_dtype_lever():
    """The serving KV cache can run reduced-precision: generate with a
    bfloat16 cache decodes the same shape jitted, and the buffers really
    are bfloat16 (the other first-order HBM term besides the weights)."""
    from tempo_tpu.nn.transformer import init_cache

    fp, _ = _models()
    params, _ = _init(fp, seed=13)
    prompt = jnp.asarray(np.random.default_rng(13).integers(
        0, CFG.in_size, (2, 6), dtype=np.int32))

    cache = init_cache(CFG, 2, dtype=jnp.bfloat16)
    assert all(k.dtype == jnp.bfloat16 and v.dtype == jnp.bfloat16
               for k, v in cache)

    run = jax.jit(lambda key: generate(fp, params, prompt, 10, rng=key,
                                       temperature=0.0,
                                       cache_dtype=jnp.bfloat16))
    out = run(jax.random.PRNGKey(0))
    assert out.shape == (2, 16)
    # prompt tokens pass through untouched regardless of cache precision
    np.testing.assert_array_equal(np.asarray(out[:, :6]),
                                  np.asarray(prompt))


@pytest.mark.slow  # composition variant: dense-quant exactness has
# fast coverage above; the MoE cross is the heavy sibling
def test_quantized_moe_exact_on_dequantized_weights():
    """MoE expert kernels quantize too (per-expert, per-out-channel
    scales): exact against the float model on dequantized weights, with
    the router left in float32."""
    cfg = dataclasses.replace(CFG, n_experts=2)
    fp = Transformer(cfg)
    qm = Transformer(dataclasses.replace(cfg, quantize="int8"))
    tok = jnp.asarray(np.random.default_rng(17).integers(
        0, cfg.in_size, (2, 12), dtype=np.int32))
    params = jax.jit(lambda k, x: fp.init(k, x)["params"])(
        jax.random.PRNGKey(17), tok)
    qparams = quantize_lm_params(params)

    moe0 = qparams["h_0"]["moe"]
    assert moe0["w1_q"].dtype == jnp.int8 and moe0["w2_q"].dtype == jnp.int8
    assert moe0["w1_scale"].shape == (2, int(cfg.rmlp * cfg.n_embd))
    assert "kernel" in moe0["router"]  # router stays float32

    def deq(tree):
        if isinstance(tree, dict):
            if "w1_q" in tree:
                out = {k: v for k, v in tree.items()
                       if not k.startswith(("w1_", "w2_"))}
                out["w1"] = (tree["w1_q"].astype(jnp.float32)
                             * tree["w1_scale"][:, None, :])
                out["w2"] = (tree["w2_q"].astype(jnp.float32)
                             * tree["w2_scale"][:, None, :])
                return out
            return {k: deq(v) for k, v in tree.items()}
        return tree

    out_q = qm.apply({"params": qparams}, tok, mutable=["losses"])[0]
    out_fp = fp.apply({"params": deq(_dequantize(qparams))}, tok,
                      mutable=["losses"])[0]
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_fp),
                               atol=1e-5, rtol=1e-5)

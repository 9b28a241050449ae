"""AOT serving export: the serialized StableHLO codec must reproduce the
live model exactly and serve any batch size from one artifact."""

import jax
import jax.numpy as jnp
import numpy as np

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

"""Model-level tests: the flagship parameter count (27,289,893 — the
reference baseline, BASELINE.md), shapes at the default architecture, loss
reduction semantics, and the L2 variant's masked losses."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.models.vae import AutoencoderKL, VAEConfig, build_vae, vae_loss
from tempo_tpu.models.vae_l2 import (
    L2_PRODUCTS,
    VAEWithL2Head,
    avg_pool_4x_nan,
    masked_mse,
)
from tempo_tpu.nn.distributions import DiagonalGaussian


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


TINY = VAEConfig(shape=(12, 16, 16), chs=(16, 12, 8), z_channels=4,
                 embed_dim=4, n_attention_heads=2, norm_groups=4,
                 compute_dtype="float32")


@pytest.mark.slow
def test_flagship_param_count():
    """Exact parity with the reference's 27,289,893 parameters
    (docs/logs/2025-09-17/03-12_vae_implementation_cleanup.md:27)."""
    model = AutoencoderKL(VAEConfig(compute_dtype="float32"))
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1028), jnp.float32),
                           rng=jax.random.PRNGKey(1)))
    assert count_params(params) == 27_289_893


def test_tiny_shapes_and_loss():
    model = AutoencoderKL(TINY)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 16, 12), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))
    recon, posterior = model.apply(params, x, rng=jax.random.PRNGKey(2))
    assert recon.shape == x.shape
    # latent grid = input / 2^(levels-1) = 16/4 = 4
    assert posterior.mean.shape == (2, 4, 4, 4)

    loss, metrics = model.apply(params, x, jax.random.PRNGKey(3),
                                method=AutoencoderKL.get_loss)
    assert np.isfinite(float(loss))
    assert set(metrics) == {"loss", "nll_loss", "kl_loss", "pixel_mse"}


def test_fresh_model_decodes_zero():
    """Zero-init output convs mean a fresh model reconstructs exactly 0, so
    the initial nll is sum(|x|/e^6 + 6)/B — a strong init-parity check."""
    model = AutoencoderKL(TINY)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 16, 16, 12), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))
    recon, _ = model.apply(params, x, rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(recon), 0.0)

    loss, metrics = model.apply(params, x, jax.random.PRNGKey(2),
                                method=AutoencoderKL.get_loss)
    b = x.shape[0]
    expected_nll = float(jnp.sum(jnp.abs(x) / jnp.exp(6.0) + 6.0) / b)
    assert abs(float(metrics["nll_loss"]) - expected_nll) < 1e-2
    # quant_conv has a torch-init bias, so the posterior is NOT standard
    # normal even at init (same as the reference); KL is small but nonzero.
    assert float(metrics["kl_loss"]) > 0.0


def test_loss_sum_reduction_semantics():
    """nll = sum(err/exp(lv) + lv)/B with a learned scalar lv (reference
    src/model.py:662-666)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 4, 4, 5), dtype=np.float32))
    r = jnp.asarray(rng.standard_normal((3, 4, 4, 5), dtype=np.float32))
    mean = jnp.asarray(rng.standard_normal((3, 2, 2, 2), dtype=np.float32))
    logvar = jnp.asarray(rng.standard_normal((3, 2, 2, 2), dtype=np.float32))
    post = DiagonalGaussian(mean=mean, logvar=logvar)
    lv = jnp.asarray(1.5, jnp.float32)
    cfg = VAEConfig(kl_weight=1e-6, nll_loss_type="l1")

    loss, metrics = vae_loss(x, r, post, lv, cfg)
    want_nll = np.sum(np.abs(np.asarray(x - r)) / np.exp(1.5) + 1.5) / 3
    want_kl = 1e-6 * np.sum(0.5 * (np.asarray(mean) ** 2 + np.exp(np.asarray(logvar))
                                   - 1 - np.asarray(logvar))) / 3
    np.testing.assert_allclose(float(metrics["nll_loss"]), want_nll, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["kl_loss"]), want_kl, rtol=1e-4)
    np.testing.assert_allclose(float(loss), want_nll + want_kl, rtol=1e-5)


def test_logvar_clamp():
    params = jnp.concatenate([
        jnp.zeros((1, 2, 2, 3)),
        jnp.full((1, 2, 2, 3), 100.0),
    ], axis=-1)
    post = DiagonalGaussian.from_params(params)
    assert float(jnp.max(post.logvar)) == 20.0
    params = params.at[..., 3:].set(-100.0)
    post = DiagonalGaussian.from_params(params)
    assert float(jnp.min(post.logvar)) == -30.0


def test_avg_pool_nan_propagates():
    x = np.ones((1, 8, 8), dtype=np.float32)
    x[0, 0, 0] = np.nan
    pooled = np.asarray(avg_pool_4x_nan(jnp.asarray(x)))
    assert pooled.shape == (1, 2, 2)
    assert np.isnan(pooled[0, 0, 0])       # block containing the NaN
    assert np.isfinite(pooled[0, 1, 1])


def test_masked_mse():
    target = jnp.asarray([[1.0, jnp.nan], [3.0, jnp.nan]])
    pred = jnp.asarray([[2.0, 100.0], [3.0, -100.0]])
    got = float(masked_mse(pred, target))
    assert abs(got - 0.5) < 1e-6  # mean of (1, 0) over the 2 valid cells

    all_nan = jnp.full((2, 2), jnp.nan)
    assert float(masked_mse(pred, all_nan)) == 0.0


def test_l2_model_loss():
    model = VAEWithL2Head(TINY, mlp_hidden=(16, 16))
    rng = np.random.default_rng(3)
    batch = {"spectral": jnp.asarray(rng.standard_normal(
        (2, 16, 16, 12), dtype=np.float32))}
    for p in L2_PRODUCTS:
        field = rng.standard_normal((2, 16, 16)).astype(np.float32)
        field[0, :4, :4] = np.nan
        batch[p] = jnp.asarray(field)

    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                        method=VAEWithL2Head.compute_loss)
    loss, metrics = model.apply(params, batch, jax.random.PRNGKey(2),
                                method=VAEWithL2Head.compute_loss)
    assert np.isfinite(float(loss))
    for p in L2_PRODUCTS:
        assert np.isfinite(float(metrics[f"{p}_loss"]))
    # total = nll + kl + 0.1 * sum(product losses)
    expected = (float(metrics["nll_loss"]) + float(metrics["kl_loss"])
                + 0.1 * sum(float(metrics[f"{p}_loss"]) for p in L2_PRODUCTS))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_build_vae_from_config_dict():
    model, cfg = build_vae({
        "shape": [12, 16, 16],
        "chs": [16, 12, 8],
        "z_channels": 4,
        "embed_dim": 4,
        "n_attention_heads": 2,
        "norm_groups": 4,
        "kl_weight": 1e-5,
        "nll_loss_type": "l2",
        "unknown_key_is_ignored": True,
    }, compute_dtype="float32")
    assert cfg.kl_weight == 1e-5
    assert cfg.nll_loss_type == "l2"
    assert cfg.chs == (16, 12, 8)


def test_ms_mse_loss_option():
    """FFT-space multiscale MSE (mltools ancestor capability): finite,
    differentiable, zero at perfect reconstruction."""
    from tempo_tpu.ops.losses import multiscale_mse

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    err = multiscale_mse(x, x)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-10)

    r = x + 0.1
    err = multiscale_mse(x, r)
    assert np.isfinite(np.asarray(err)).all()
    assert float(jnp.sum(err)) > 0



@pytest.mark.slow  # heavier sibling: the functional multiscale_mse
# checks above stay fast; the VAE-integration grad traces a full model
def test_ms_mse_loss_in_vae():
    import dataclasses

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    cfg = dataclasses.replace(TINY, nll_loss_type="ms_mse",
                              shape=(3, 8, 8), chs=(8, 8, 8), norm_groups=4)
    model = AutoencoderKL(cfg)
    params = model.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))

    def loss_fn(p):
        loss, _ = model.apply(p, x, jax.random.PRNGKey(2),
                              method=AutoencoderKL.get_loss)
        return loss

    jax.grad(loss_fn)(params)  # differentiable through the fft
    assert np.isfinite(float(loss_fn(params)))


@pytest.mark.slow  # the transformer remat grad-parity pin stays
# fast (test_transformer.py); the VAE remat option is non-default and
# measured slower in production (DESIGN.md)
def test_remat_matches_no_remat():
    """remat=True must not change numerics — only the backward's memory."""
    import dataclasses

    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (2, 16, 16, 12), dtype=np.float32))
    base = AutoencoderKL(TINY)
    params = base.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))
    remat = AutoencoderKL(dataclasses.replace(TINY, remat=True))

    def loss(model, p):
        l, _ = model.apply(p, x, jax.random.PRNGKey(2),
                           method=AutoencoderKL.get_loss)
        return l

    l_base = float(loss(base, params))
    l_remat = float(loss(remat, params))
    np.testing.assert_allclose(l_remat, l_base, rtol=1e-6)

    g_base = jax.grad(lambda p: loss(base, p))(params)
    g_remat = jax.grad(lambda p: loss(remat, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_base),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_padded_boundary_matches_unpadded():
    """The permanently lane-padded boundary-conv parameterization
    (VAEConfig.pad_boundary / boundary_pad) must be a pure performance
    reparameterization: identical parameter tree, bit-identical loss (the
    error maps are sliced to the logical width before the reductions), and
    gradients equal up to conv reassociation. Uses a ragged channel count
    (260 -> pads to 384) large enough to activate padding."""
    import dataclasses

    cfg_pad = VAEConfig(shape=(260, 8, 8), chs=(16, 12, 8), z_channels=4,
                        embed_dim=4, n_attention_heads=2, norm_groups=4,
                        compute_dtype="float32", pad_boundary=True)
    cfg_raw = dataclasses.replace(cfg_pad, pad_boundary=False)
    assert cfg_pad.boundary_pad == 384
    # tiny/aligned configs never pad
    assert TINY.boundary_pad is None
    assert VAEConfig(shape=(256, 16, 16)).boundary_pad is None
    # the flagship spectral width pads to the next lane multiple
    assert VAEConfig().boundary_pad == 1152

    m_pad, m_raw = AutoencoderKL(cfg_pad), AutoencoderKL(cfg_raw)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 260),
                          jnp.float32)
    rng = jax.random.PRNGKey(7)
    params = m_pad.init(jax.random.PRNGKey(0), x, rng=rng)["params"]
    # same (logical-shape) parameter tree drives both models
    chex.assert_trees_all_equal_shapes(
        params, m_raw.init(jax.random.PRNGKey(0), x, rng=rng)["params"])

    def loss(model, p):
        return model.apply({"params": p}, x, rng,
                           method=AutoencoderKL.get_loss)

    (lp, mp), (lr, mr) = loss(m_pad, params), loss(m_raw, params)
    assert float(lp) == float(lr)  # bit-identical reductions
    np.testing.assert_allclose(float(mp["pixel_mse"]),
                               float(mr["pixel_mse"]), rtol=0)

    g_pad = jax.grad(lambda p: loss(m_pad, p)[0])(params)
    g_raw = jax.grad(lambda p: loss(m_raw, p)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pad),
                    jax.tree_util.tree_leaves(g_raw)):
        scale = float(np.max(np.abs(np.asarray(b)))) + 1e-30
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-5)

    # public API stays at the logical width
    recon, _ = m_pad.apply({"params": params}, x, rng)
    assert recon.shape == x.shape

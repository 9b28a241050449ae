"""Analysis tests: PCA equivalence with sklearn, probe training recovers a
linear relationship, R^2 matches sklearn, and the checkpoint sweep produces
the reference's metric schema."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.analysis.pca import PCAResult, fit_pca, pca_rgb
from tempo_tpu.analysis.probes import r2_score, train_probe
from tempo_tpu.infer.granule_codec import GranuleCodec, crop_to_multiple
from tempo_tpu.infer.sweep import compute_metrics, evaluate_checkpoint
from tempo_tpu.models.vae import AutoencoderKL, VAEConfig

TINY = VAEConfig(shape=(8, 16, 16), chs=(12, 8, 8), z_channels=4,
                 embed_dim=4, n_attention_heads=2, norm_groups=4,
                 compute_dtype="float32")


def test_pca_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.decomposition")
    x = rng.standard_normal((200, 12)).astype(np.float64)
    x[:, 3] += 5 * x[:, 0]

    ours = fit_pca(x, n_components=3)
    ref = sklearn.PCA(n_components=3).fit(x)

    np.testing.assert_allclose(ours.mean, ref.mean_, atol=1e-5)
    np.testing.assert_allclose(ours.components, ref.components_, atol=1e-4)
    np.testing.assert_allclose(ours.explained_variance_ratio,
                               ref.explained_variance_ratio_, atol=1e-5)
    np.testing.assert_allclose(ours.transform(x[:10]), ref.transform(x[:10]),
                               atol=1e-4)


def test_pca_save_load(tmp_path, rng):
    x = rng.standard_normal((50, 6))
    pca = fit_pca(x, 3)
    pca.save(tmp_path / "pca.npz")
    loaded = PCAResult.load(tmp_path / "pca.npz")
    np.testing.assert_array_equal(loaded.components, pca.components)


def test_pca_rgb_range(rng):
    x = rng.standard_normal((16, 16, 6)).astype(np.float32)
    pca = fit_pca(x.reshape(-1, 6), 3)
    img = pca_rgb(x, pca)
    assert img.shape == (16, 16, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_r2_matches_sklearn(rng):
    metrics = pytest.importorskip("sklearn.metrics")
    y = rng.standard_normal(100)
    pred = y + 0.3 * rng.standard_normal(100)
    np.testing.assert_allclose(r2_score(y, pred),
                               metrics.r2_score(y, pred), atol=1e-8)


def test_linear_probe_recovers_linear_map(rng):
    w_true = rng.standard_normal(8).astype(np.float32)
    X = rng.standard_normal((2000, 8)).astype(np.float32)
    y = X @ w_true + 0.01 * rng.standard_normal(2000).astype(np.float32)

    result = train_probe(X[:1600], y[:1600], X[1600:], y[1600:], {
        "architecture": "linear", "learning_rate": 1e-2,
        "weight_decay": 0.0, "batch_size": 256, "max_epochs": 200,
    })
    pred = result.predict(X[1600:])
    assert r2_score(y[1600:], pred) > 0.98
    assert len(result.train_losses) == 200
    assert result.best_val_loss <= result.val_losses[0]


def test_mlp_probe_learns_nonlinear(rng):
    X = rng.standard_normal((2000, 4)).astype(np.float32)
    y = np.sin(X[:, 0]) + X[:, 1] ** 2

    result = train_probe(X[:1600], y[:1600], X[1600:], y[1600:], {
        "architecture": "mlp", "hidden_dims": [64, 64], "dropout": 0.0,
        "activation": "relu", "learning_rate": 3e-3, "weight_decay": 0.0,
        "batch_size": 256, "max_epochs": 300,
    })
    pred = result.predict(X[1600:])
    assert r2_score(y[1600:], pred) > 0.9


def test_compute_metrics_schema(rng):
    gt = rng.standard_normal((4, 8, 8, 3))
    recon = gt + 0.1
    m = compute_metrics(gt, recon, ["mse", "mae", "psnr"])
    np.testing.assert_allclose(m["mse"], 0.01, rtol=1e-5)
    np.testing.assert_allclose(m["mae"], 0.1, rtol=1e-5)
    np.testing.assert_allclose(m["psnr"], 10 * np.log10(400 / (0.01 + 1e-10)),
                               rtol=1e-5)


def test_crop_to_multiple(rng):
    arr = rng.standard_normal((131, 200, 5))
    out = crop_to_multiple(arr, 64)
    assert out.shape == (128, 192, 5)


def test_granule_codec_and_sweep(tmp_path, rng):
    model = AutoencoderKL(TINY)
    x0 = jnp.zeros((1, 16, 16, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0,
                        rng=jax.random.PRNGKey(1))["params"]

    mean = np.full(8, 25.0, np.float32)
    std = np.full(8, 1.0, np.float32)
    codec = GranuleCodec(model, params, mean, std, multiple=16)

    rad = rng.gamma(2.0, 5e10, size=(35, 40, 8)).astype(np.float32)
    gt, recon = codec.reconstruct_raw(rad)
    assert gt.shape == (32, 32, 8)
    assert recon.shape == gt.shape
    np.testing.assert_array_equal(recon, 0.0)  # zero-init fresh model

    latent = codec.encode(gt)
    assert latent.shape == (8, 8, 4)  # 4x spatial, z_channels=4
    decoded = codec.decode(latent)
    assert decoded.shape == gt.shape

    # sweep on a fresh "checkpoint"
    tiles = rng.standard_normal((5, 16, 16, 8)).astype(np.float32)
    metrics = evaluate_checkpoint(model, params, tiles, batch_size=2)
    assert set(metrics) == {"mse", "mae", "psnr"}
    np.testing.assert_allclose(metrics["mse"], np.mean(tiles ** 2), rtol=1e-4)


def test_evaluate_checkpoint_pk_err_metric():
    """'pk_err' sweep option: mean |log10| radial power-spectrum ratio.
    A zero-init model reconstructs 0, so pk_recon is ~0 and the |log|
    ratio is large; a perfect reconstruction gives exactly 0."""
    import jax

    from tempo_tpu.models.vae import AutoencoderKL

    model = AutoencoderKL(TINY)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((2, 16, 16, 8), np.float32),
                        rng=jax.random.PRNGKey(1))["params"]
    rng = np.random.default_rng(11)
    tiles = rng.standard_normal((4, 16, 16, 8)).astype(np.float32)
    metrics = evaluate_checkpoint(model, params, tiles, batch_size=2,
                                  metrics_list=("mse", "pk_err"))
    assert set(metrics) == {"mse", "pk_err"}
    assert metrics["pk_err"] > 1.0  # zero recon: spectra differ by >>10x

    # identity sanity directly on the metric math
    from tempo_tpu.analysis.spectrum import get_pk, pk_op

    op = pk_op(16, 2)
    pk = get_pk(np.asarray(tiles), op)
    ratio = np.log10((np.asarray(pk) + 1e-12) / (np.asarray(pk) + 1e-12))
    assert float(np.abs(ratio).max()) == 0.0

"""Golden numerics parity against the reference PyTorch implementation.

Loads the reference model (mounted read-only at /root/reference) as a test
oracle, converts its randomly-initialized weights through the checkpoint
interop (tempo_tpu.interop), and checks encode / decode / loss agree to
float32 tolerance on the same inputs. Skipped when the reference tree or
torch is unavailable.
"""

import importlib.util
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import serialization

from tempo_tpu.interop.torch_ckpt import params_from_torch_state_dict
from tempo_tpu.models.vae import AutoencoderKL, VAEConfig, vae_loss

torch = pytest.importorskip("torch")

REF_MODEL = Path("/root/reference/src/model.py")
pytestmark = pytest.mark.skipif(not REF_MODEL.exists(),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_model_module():
    spec = importlib.util.spec_from_file_location("ref_model", REF_MODEL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_model"] = mod
    spec.loader.exec_module(mod)
    return mod


CFG = dict(shape=(12, 16, 16), chs=(16, 12, 8), z_channels=4, embed_dim=4,
           n_attention_heads=2, norm_groups=4)


@pytest.fixture(scope="module")
def models(ref_model_module):
    torch.manual_seed(0)
    enc_dec_params = dict(
        shape=CFG["shape"], chs=list(CFG["chs"]), attn_sizes=[],
        mid_attn=True, num_res_blocks=1, dropout_prob=0.0,
        z_channels=CFG["z_channels"], double_z=True,
        n_attention_heads=CFG["n_attention_heads"],
        norm_groups=CFG["norm_groups"], norm_eps=1e-6, norm_affine=True,
        act="gelu", conv_kernel_size=3, conv_padding_mode="zeros")
    ref = ref_model_module.AutoencoderKL(
        enc_dec_params=enc_dec_params, embed_dim=CFG["embed_dim"],
        nll_loss_type="l1", kl_weight=1e-6)
    ref.eval()

    ours_cfg = VAEConfig(shape=CFG["shape"], chs=CFG["chs"],
                         z_channels=CFG["z_channels"],
                         embed_dim=CFG["embed_dim"],
                         n_attention_heads=CFG["n_attention_heads"],
                         norm_groups=CFG["norm_groups"],
                         compute_dtype="float32")
    ours = AutoencoderKL(ours_cfg)
    x0 = jnp.zeros((1, 16, 16, 12), jnp.float32)
    template = ours.init(jax.random.PRNGKey(0), x0,
                         rng=jax.random.PRNGKey(1))["params"]

    # 'vae.' prefix tolerance is exercised by passing the bare state_dict
    converted = params_from_torch_state_dict(ref.state_dict(), n_levels=3,
                                             num_res_blocks=1)
    params = serialization.from_state_dict(template, converted)
    return ref, ours, ours_cfg, params


def _to_nchw(x_nhwc: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _to_nhwc(x_nchw: "torch.Tensor") -> np.ndarray:
    return x_nchw.detach().permute(0, 2, 3, 1).numpy()


def test_param_count_matches(models):
    ref, _, _, params = models
    n_ref = sum(p.numel() for p in ref.parameters())
    n_ours = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(params))
    assert n_ref == n_ours


def test_encode_parity(models, rng):
    ref, ours, _, params = models
    x = rng.standard_normal((2, 16, 16, 12)).astype(np.float32)

    with torch.no_grad():
        post_ref = ref.encode(_to_nchw(x))
    mean_ref = _to_nhwc(post_ref.mean)
    logvar_ref = _to_nhwc(post_ref.logvar)

    post = ours.apply({"params": params}, jnp.asarray(x),
                      method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(post.mean), mean_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(post.logvar), logvar_ref, atol=2e-4)


def test_decode_parity(models, rng):
    ref, ours, _, params = models
    z = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)

    with torch.no_grad():
        dec_ref = _to_nhwc(ref.decode(_to_nchw(z)))
    dec = ours.apply({"params": params}, jnp.asarray(z),
                     method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec), dec_ref, atol=2e-4)


def test_deterministic_loss_parity(models, rng):
    """Full forward with the posterior MODE (no sampling) so both sides see
    identical latents; reconstruct + the exact nll/kl formulas must agree."""
    ref, ours, ours_cfg, params = models
    x = rng.standard_normal((2, 16, 16, 12)).astype(np.float32)

    with torch.no_grad():
        tx = _to_nchw(x)
        recon_ref, post_ref = ref(tx, sample_posterior=False)
        rec_err = torch.nn.functional.l1_loss(tx, recon_ref, reduction="none")
        nll_ref = torch.sum(rec_err / torch.exp(ref.logvar) + ref.logvar) / 2
        kl_ref = 1e-6 * torch.sum(post_ref.kl()) / 2

    recon, posterior = ours.apply({"params": params}, jnp.asarray(x),
                                  sample_posterior=False)
    logvar = params["logvar"]
    _, metrics = vae_loss(jnp.asarray(x), recon, posterior, logvar, ours_cfg)

    np.testing.assert_allclose(float(metrics["nll_loss"]), float(nll_ref),
                               rtol=1e-5)
    np.testing.assert_allclose(float(metrics["kl_loss"]), float(kl_ref),
                               rtol=1e-3, atol=1e-10)


def test_full_granule_shape_parity(models, rng):
    """Arbitrary /16 input sizes produce matching latent grids (the
    full-granule inference contract, reference analyze_reconstruction)."""
    ref, ours, _, params = models
    x = rng.standard_normal((1, 32, 48, 12)).astype(np.float32)
    with torch.no_grad():
        post_ref = ref.encode(_to_nchw(x))
    post = ours.apply({"params": params}, jnp.asarray(x),
                      method=AutoencoderKL.encode)
    assert post.mean.shape == (1, 8, 12, 4)
    np.testing.assert_allclose(np.asarray(post.mean),
                               _to_nhwc(post_ref.mean), atol=3e-4)


def test_sweep_consumes_reference_pt_checkpoints(models, tmp_path, rng):
    """The checkpoint sweep enumerates reference torch ckpt_step=*.pt files
    directly (converted through interop on the fly), matching the reference
    analysis contract (src/scripts/evaluate_reconstruction.py:145-149)."""
    from tempo_tpu.infer.sweep import evaluate_checkpoints

    ref, ours, ours_cfg, params = models
    ckpt_dir = tmp_path / "checkpoints"
    ckpt_dir.mkdir()
    for step in (5, 10):
        torch.save({"step": step, "model_state_dict": ref.state_dict()},
                   ckpt_dir / f"ckpt_step={step:06d}.pt")

    # an L2-supervised checkpoint in the same directory: the sweep must
    # evaluate its vae.* subtree (same weights => same reconstruction)
    spec = importlib.util.spec_from_file_location(
        "ref_model_l2_sweep", "/root/reference/src/model_with_l2.py")
    ref_l2_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_l2_mod)
    ref_l2 = ref_l2_mod.VAEWithL2Supervision(ref, latent_channels=4,
                                             mlp_hidden=[8])
    torch.save({"step": 15, "model_state_dict": ref_l2.state_dict()},
               ckpt_dir / "ckpt_step=000015.pt")

    val_tiles = rng.standard_normal((6, 16, 16, 12)).astype(np.float32)
    results = evaluate_checkpoints(ours, params, ckpt_dir, val_tiles,
                                   batch_size=4, verbose=False)
    assert [r["step"] for r in results] == [5, 10, 15]
    for r in results:
        assert np.isfinite(r["mse"]) and np.isfinite(r["psnr"])
    # all three .pt checkpoints hold the same VAE weights => identical
    # metrics, and they must match the converted-params model directly
    assert results[0]["mse"] == pytest.approx(results[1]["mse"])
    assert results[0]["mse"] == pytest.approx(results[2]["mse"])

    from tempo_tpu.infer.sweep import evaluate_checkpoint
    direct = evaluate_checkpoint(ours, params, val_tiles, batch_size=4)
    assert results[0]["mse"] == pytest.approx(direct["mse"], rel=1e-5)


def test_l2_checkpoint_import_parity(ref_model_module, models, rng, tmp_path):
    """A trained reference L2-supervised checkpoint (vae + l2_head) imports
    through interop and reproduces the reference head's predictions
    (reference: src/model_with_l2.py:11-59)."""
    from tempo_tpu.interop.torch_ckpt import load_torch_l2_checkpoint
    from tempo_tpu.models.vae_l2 import VAEWithL2Head

    ref_vae, _, ours_cfg, _ = models
    spec = importlib.util.spec_from_file_location(
        "ref_model_l2", "/root/reference/src/model_with_l2.py")
    ref_l2_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_l2_mod)

    torch.manual_seed(7)
    mlp_hidden = [24, 24]
    ref_l2 = ref_l2_mod.VAEWithL2Supervision(
        ref_vae, latent_channels=CFG["embed_dim"], mlp_hidden=mlp_hidden)
    ref_l2.eval()

    # through the trainer checkpoint schema, as the reference writes it
    ckpt_path = tmp_path / "ckpt_step=000001.pt"
    torch.save({"model_state_dict": ref_l2.state_dict(), "step": 1},
               ckpt_path)
    converted = load_torch_l2_checkpoint(ckpt_path,
                                         mlp_hidden=tuple(mlp_hidden))

    ours = VAEWithL2Head(ours_cfg, mlp_hidden=tuple(mlp_hidden))
    sample = {"spectral": jnp.zeros((1, 16, 16, 12), jnp.float32),
              "NO2": jnp.zeros((1, 16, 16), jnp.float32),
              "O3TOT": jnp.zeros((1, 16, 16), jnp.float32),
              "HCHO": jnp.zeros((1, 16, 16), jnp.float32),
              "CLDO4": jnp.zeros((1, 16, 16), jnp.float32)}
    template = ours.init(jax.random.PRNGKey(0), sample, jax.random.PRNGKey(1),
                         method=VAEWithL2Head.compute_loss)["params"]
    params = serialization.from_state_dict(template, converted)

    n_ref = sum(p.numel() for p in ref_l2.parameters())
    n_ours = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(params))
    assert n_ref == n_ours

    # head-level parity on a fixed latent
    z = rng.standard_normal((2, 4, 4, CFG["embed_dim"])).astype(np.float32)
    with torch.no_grad():
        pred_ref = _to_nhwc(ref_l2.l2_head(_to_nchw(z)))
    pred_ours = ours.apply({"params": params}, jnp.asarray(z),
                           method=lambda m, zz: m.l2_head(zz))
    np.testing.assert_allclose(np.asarray(pred_ours), pred_ref, atol=2e-5)


def test_load_params_accepts_pt_for_l2_template(ref_model_module, models,
                                                tmp_path, rng):
    """train.checkpoint.load_params converts reference .pt checkpoints for
    BOTH template shapes: an L2-head template gets the full vae+head tree,
    with architecture/head widths inferred from the template."""
    from tempo_tpu.models.vae_l2 import VAEWithL2Head
    from tempo_tpu.train.checkpoint import load_params

    ref_vae, _, ours_cfg, base_params = models
    spec = importlib.util.spec_from_file_location(
        "ref_model_l2_lp", "/root/reference/src/model_with_l2.py")
    ref_l2_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_l2_mod)
    ref_l2 = ref_l2_mod.VAEWithL2Supervision(ref_vae, latent_channels=4,
                                             mlp_hidden=[24, 24])
    ckpt = tmp_path / "ckpt_step=000002.pt"
    torch.save({"model_state_dict": ref_l2.state_dict(), "step": 2}, ckpt)

    ours = VAEWithL2Head(ours_cfg, mlp_hidden=(24, 24))
    sample = {"spectral": jnp.zeros((1, 16, 16, 12), jnp.float32)}
    for prod in ("NO2", "O3TOT", "HCHO", "CLDO4"):
        sample[prod] = jnp.zeros((1, 16, 16), jnp.float32)
    template = ours.init(jax.random.PRNGKey(0), sample, jax.random.PRNGKey(1),
                         method=VAEWithL2Head.compute_loss)["params"]

    params = load_params(ckpt, template)
    z = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = _to_nhwc(ref_l2.l2_head(_to_nchw(z)))
    got = ours.apply({"params": params}, jnp.asarray(z),
                     method=lambda m, zz: m.l2_head(zz))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # base template <- the SAME L2 checkpoint: vae subtree extracted
    base_from_l2 = load_params(ckpt, base_params)
    for a, b in zip(jax.tree_util.tree_leaves(base_from_l2),
                    jax.tree_util.tree_leaves(base_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # a base-VAE .pt into an L2 template must fail loudly
    base_ckpt = tmp_path / "ckpt_step=000003.pt"
    torch.save({"model_state_dict": ref_vae.state_dict()}, base_ckpt)
    with pytest.raises(ValueError, match="base-VAE checkpoint"):
        load_params(base_ckpt, template)

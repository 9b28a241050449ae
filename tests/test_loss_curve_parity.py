"""Loss-TRAJECTORY parity with the reference: starting from identical weights
(via the checkpoint converter), feeding identical batches, and using the
posterior mode (so no RNG enters), ten full optimization steps of
[forward -> L1+KL loss -> backward -> global-norm clip(1.0) -> AdamW] must
track the reference's torch implementation to <1e-3 relative — the
BASELINE.md north-star parity criterion, checked end-to-end through model,
gradients, clipping, and optimizer."""

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
from tempo_tpu.train.state import create_train_state, make_optimizer
from tempo_tpu.train.step import make_train_step

torch = pytest.importorskip("torch")

REF_MODEL = Path("/root/reference/src/model.py")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF_MODEL.exists(),
                       reason="reference tree not mounted"),
]

N_STEPS = 10
LR, BETAS, WD = 1e-3, (0.9, 0.95), 0.05


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_model_lc", REF_MODEL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_model_lc"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_ten_step_loss_trajectory_matches_torch(rng):
    ref_mod = _load_ref()
    torch.manual_seed(0)
    enc_dec_params = dict(
        shape=(12, 16, 16), chs=[16, 12, 8], attn_sizes=[], mid_attn=True,
        num_res_blocks=1, dropout_prob=0.0, z_channels=4, double_z=True,
        n_attention_heads=2, norm_groups=4, norm_eps=1e-6, norm_affine=True,
        act="gelu", conv_kernel_size=3, conv_padding_mode="zeros")
    ref = ref_mod.AutoencoderKL(enc_dec_params=enc_dec_params, embed_dim=4,
                                nll_loss_type="l1", kl_weight=1e-6)
    ref.train()
    opt = torch.optim.AdamW(ref.parameters(), lr=LR, betas=BETAS, eps=1e-8,
                            weight_decay=WD)

    cfg = VAEConfig(shape=(12, 16, 16), chs=(16, 12, 8), z_channels=4,
                    embed_dim=4, n_attention_heads=2, norm_groups=4,
                    compute_dtype="float32")
    ours = AutoencoderKL(cfg)
    x0 = jnp.zeros((1, 16, 16, 12), jnp.float32)
    template = ours.init(jax.random.PRNGKey(0), x0,
                         rng=jax.random.PRNGKey(1))["params"]
    params = serialization.from_state_dict(
        template, params_from_torch_state_dict(ref.state_dict()))

    def loss_fn(params, batch, rng_unused):
        recon, posterior = ours.apply({"params": params}, batch,
                                      sample_posterior=False)
        return vae_loss(batch, recon, posterior, params["logvar"], cfg)

    tx = make_optimizer(lr=LR, betas=BETAS, weight_decay=WD)
    state = create_train_state(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(loss_fn, tx, donate=False)

    batches = [rng.standard_normal((4, 16, 16, 12)).astype(np.float32)
               for _ in range(N_STEPS)]

    ref_losses, our_losses = [], []
    for batch in batches:
        # --- torch side: reference trainer semantics, posterior mode
        tb = torch.from_numpy(np.transpose(batch, (0, 3, 1, 2)).copy())
        recon, post = ref(tb, sample_posterior=False)
        rec_err = torch.nn.functional.l1_loss(tb, recon, reduction="none")
        nll = torch.sum(rec_err / torch.exp(ref.logvar) + ref.logvar) / 4
        kl = 1e-6 * torch.sum(post.kl()) / 4
        loss_t = nll + kl
        opt.zero_grad()
        loss_t.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=1.0)
        opt.step()
        ref_losses.append(float(loss_t))

        # --- ours: one fused jitted step
        state, metrics = step(state, jnp.asarray(batch))
        our_losses.append(float(metrics["loss"]))

    ref_losses = np.asarray(ref_losses)
    our_losses = np.asarray(our_losses)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-3)
    # and the trajectory must actually move (optimizer really stepped)
    assert ref_losses[-1] != ref_losses[0]


def test_flagship_parity_artifacts_beat_north_star():
    """The measured flagship-scale (27.3M-param, 1028-ch) parity artifacts
    — produced on real TPU hardware by tools/parity_flagship.py against the
    torch oracle — must beat the <1e-3 loss-curve north-star in every
    recorded configuration (fp32 + shipped bf16, reference + perturbed
    init)."""
    import json

    art_dir = Path(__file__).parent.parent / "artifacts" / "parity"
    runs = sorted(art_dir.glob("jax_*.json"))
    assert len(runs) >= 4, "flagship parity artifacts missing"
    for path in runs:
        data = json.loads(path.read_text())
        assert data["n_steps"] >= 50
        assert data["rel_err_max"] < 1e-3, (path.name, data["rel_err_max"])


def test_flagship_parity_artifacts_are_fresh():
    """Freshness guard for the archived flagship parity artifacts: the
    oracle's initial weights are DETERMINISTIC (torch.manual_seed(0) +
    generator-seeded perturbation, tools/parity_flagship.py), so the
    CURRENT code's step-0 flagship loss can be recomputed live and compared
    against the archived oracle trajectory. If the model/loss code drifts
    after the artifacts were captured, this fails even though the archived
    jax_*.json files still 'beat' the target."""
    import json

    art_dir = Path(__file__).parent.parent / "artifacts" / "parity"
    oracle = json.loads((art_dir / "oracle_perturbed.json").read_text())

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    try:
        import parity_flagship as pf
    finally:
        sys.path.pop(0)

    # reconstruct the oracle's exact perturbed init (deterministic seeds)
    ref_mod = _load_ref()
    torch.manual_seed(0)
    enc_dec_params = dict(
        shape=pf.FLAGSHIP["shape"], chs=list(pf.FLAGSHIP["chs"]),
        attn_sizes=[], mid_attn=True, num_res_blocks=1, dropout_prob=0.0,
        z_channels=pf.FLAGSHIP["z_channels"], double_z=True,
        n_attention_heads=pf.FLAGSHIP["n_attention_heads"],
        norm_groups=pf.FLAGSHIP["norm_groups"], norm_eps=1e-6,
        norm_affine=True, act="gelu", conv_kernel_size=3,
        conv_padding_mode="zeros")
    ref = ref_mod.AutoencoderKL(enc_dec_params=enc_dec_params,
                                embed_dim=pf.FLAGSHIP["embed_dim"],
                                nll_loss_type="l1", kl_weight=1e-6)
    assert sum(p.numel() for p in ref.parameters()) == oracle["n_params"]
    pf.perturb_zero_params(ref, torch)

    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        cfg = VAEConfig(shape=pf.FLAGSHIP["shape"], chs=pf.FLAGSHIP["chs"],
                        z_channels=pf.FLAGSHIP["z_channels"],
                        embed_dim=pf.FLAGSHIP["embed_dim"],
                        n_attention_heads=pf.FLAGSHIP["n_attention_heads"],
                        norm_groups=pf.FLAGSHIP["norm_groups"],
                        compute_dtype="float32")
        model = AutoencoderKL(cfg)
        template = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, pf.TILE, pf.TILE, pf.N_SPECTRAL), jnp.float32),
                rng=jax.random.PRNGKey(1))["params"])
        params = serialization.from_state_dict(
            jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype),
                                   template),
            params_from_torch_state_dict(ref.state_dict()))

        batch = pf.make_batches()[0]

        @jax.jit
        def step0_metrics(params, batch):
            recon, posterior = model.apply({"params": params}, batch,
                                           sample_posterior=False)
            _, metrics = vae_loss(batch, recon, posterior, params["logvar"],
                                  cfg)
            return metrics

        metrics = jax.device_get(step0_metrics(params, jnp.asarray(batch)))
    finally:
        jax.config.update("jax_default_matmul_precision", None)

    rel = abs(float(metrics["loss"]) - oracle["loss"][0]) / abs(
        oracle["loss"][0])
    rel_nll = abs(float(metrics["nll_loss"]) - oracle["nll"][0]) / abs(
        oracle["nll"][0])
    assert rel < 1e-3 and rel_nll < 1e-3, (
        f"live step-0 flagship loss drifted from the archived oracle: "
        f"rel={rel:.2e} rel_nll={rel_nll:.2e} — regenerate artifacts/parity "
        f"with tools/parity_flagship.py")

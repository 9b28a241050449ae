"""VDM diffusion + noise-schedule + SFM parity vs the reference toolkit.

Oracle: /root/reference/src/mltools/models/{vdm_model,sfm_model,
model_tools}.py imported live (with a minimal LightningModule shim — the
reference only subclasses it). Stochastic inputs are pinned on both sides:
explicit tensors here, monkeypatched torch globals there.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.models.diffusion import (
    VDM,
    FixedLinearSchedule,
    LearnedLinearSchedule,
    NNSchedule,
    SigmoidSchedule,
    kl_std_normal,
    sample,
)
from tempo_tpu.models.flow import SFM, predict, sde_integrate
from tempo_tpu.nn.unet import CUNet

torch = pytest.importorskip("torch")

REF_SRC = Path("/root/reference/src")
pytestmark = pytest.mark.skipif(not REF_SRC.exists(),
                                reason="reference tree not mounted")
if str(REF_SRC) not in sys.path:
    sys.path.insert(0, str(REF_SRC))

# the reference diffusion models only *subclass* LightningModule; a stub
# keeps the oracle importable without the lightning package
if "lightning" not in sys.modules:
    lightning = types.ModuleType("lightning")
    lightning.pytorch = types.ModuleType("lightning.pytorch")
    lightning.pytorch.LightningModule = torch.nn.Module
    sys.modules["lightning"] = lightning
    sys.modules["lightning.pytorch"] = lightning.pytorch


SCORE_KW = dict(chs=[8, 12], norm_groups=4, n_attention_heads=2,
                dropout_prob=0.0, t_conditioning=True, t_embedding_dim=8,
                mid_attn=True)
SHAPE_CHW = (3, 8, 8)


def _vdm_pair(**vdm_kw):
    from mltools.models.vdm_model import VDM as TorchVDM
    from mltools.networks.networks import CUNet as TorchCUNet

    from tempo_tpu.interop.unet_ckpt import params_from_torch_vdm

    torch.manual_seed(0)
    t_score = TorchCUNet(shape=SHAPE_CHW, **SCORE_KW)
    tm = TorchVDM(t_score, **vdm_kw).eval()
    c, h, w = SHAPE_CHW
    j_score = CUNet(shape=(h, w, c), chs=tuple(SCORE_KW["chs"]),
                    norm_groups=4, n_attention_heads=2, dropout_prob=0.0,
                    t_conditioning=True, t_embedding_dim=8)
    jm = VDM(j_score, **vdm_kw)
    params = params_from_torch_vdm(tm.state_dict(), n_levels=2)
    return tm, jm, params


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_schedule_parity():
    import mltools.models.model_tools as ref_tools

    t = np.linspace(0.0, 1.0, 9).astype(np.float32)
    tt, tj = torch.from_numpy(t), jnp.asarray(t)

    ref = ref_tools.FixedLinearSchedule(-13.3, 5.0)(tt).numpy()
    out = FixedLinearSchedule(-13.3, 5.0).apply({}, tj)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)

    ref = ref_tools.SigmoidSchedule(-13.3, 5.0)(tt).numpy()
    out = SigmoidSchedule(-13.3, 5.0).apply({}, tj)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)

    torch.manual_seed(0)
    ref_m = ref_tools.LearnedLinearSchedule(-13.3, 5.0)
    with torch.no_grad():
        ref_m.w += 1.0  # move off the init point
    params = {"b": np.float32(ref_m.b.item()),
              "w": np.float32(ref_m.w.item())}
    ref = ref_m(tt).detach().numpy()
    out = LearnedLinearSchedule(-13.3, 5.0).apply({"params": params}, tj)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)

    torch.manual_seed(1)
    ref_nn = ref_tools.NNSchedule(-13.3, 5.0, mid_dim=32)
    params = {
        "l1": {"kernel": ref_nn.l1.weight.detach().numpy().T,
               "bias": ref_nn.l1.bias.detach().numpy()},
        "l2": {"kernel": ref_nn.l2.weight.detach().numpy().T,
               "bias": ref_nn.l2.bias.detach().numpy()},
        "l3": {"kernel": ref_nn.l3.weight.detach().numpy().T},
    }
    ref = ref_nn(tt).detach().numpy()
    out = NNSchedule(-13.3, 5.0, mid_dim=32).apply({"params": params}, tj)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)

    # monotonicity of the learned-NN schedule, by construction
    dense = np.asarray(NNSchedule(-13.3, 5.0, mid_dim=32).apply(
        {"params": params}, jnp.linspace(0.0, 1.0, 101)))
    assert np.all(np.diff(dense) > 0)


def test_gamma_grad_matches_autograd():
    """jax.jvp of the schedule == the reference's autograd.grad trick
    (vdm_model.py:288-295), including for the learned-NN schedule."""
    import mltools.models.model_tools as ref_tools

    torch.manual_seed(2)
    ref_nn = ref_tools.NNSchedule(-4.0, 2.0, mid_dim=16)
    params = {
        "l1": {"kernel": ref_nn.l1.weight.detach().numpy().T,
               "bias": ref_nn.l1.bias.detach().numpy()},
        "l2": {"kernel": ref_nn.l2.weight.detach().numpy().T,
               "bias": ref_nn.l2.bias.detach().numpy()},
        "l3": {"kernel": ref_nn.l3.weight.detach().numpy().T},
    }
    t = np.linspace(0.05, 0.95, 7).astype(np.float32)
    tt = torch.from_numpy(t).requires_grad_(True)
    g = ref_nn(tt)
    ref_grad = torch.autograd.grad(g, tt, torch.ones_like(g))[0].numpy()

    sched = NNSchedule(-4.0, 2.0, mid_dim=16)
    _, jvp_grad = jax.jvp(
        lambda x: sched.apply({"params": params}, x),
        (jnp.asarray(t),), (jnp.ones_like(jnp.asarray(t)),))
    np.testing.assert_allclose(np.asarray(jvp_grad), ref_grad, atol=1e-4,
                               rtol=1e-4)


def test_vdm_loss_parity(monkeypatch):
    """Full ELBO parity (diffusion + latent + reconstruction terms,
    vdm_model.py:206-285) with pinned times/noise on both sides."""
    tm, jm, params = _vdm_pair(noise_schedule="fixed_linear")
    rng = np.random.default_rng(5)
    b = 4
    x = rng.standard_normal((b, *SHAPE_CHW)).astype(np.float32)
    noise = rng.standard_normal(x.shape).astype(np.float32)
    noise_0 = rng.standard_normal(x.shape).astype(np.float32)
    t0 = 0.0123

    monkeypatch.setattr(np.random, "uniform", lambda *a, **k: t0)
    monkeypatch.setattr(
        torch, "randn_like", lambda v, **k: torch.from_numpy(noise_0))
    loss_ref, metrics_ref = tm.get_loss(torch.from_numpy(x),
                                        noise=torch.from_numpy(noise))
    times = (t0 + np.arange(b) / b).astype(np.float32)

    loss, metrics = jm.apply(
        {"params": params}, jnp.asarray(_nhwc(x)),
        noise=jnp.asarray(_nhwc(noise)), times=jnp.asarray(times),
        noise_0=jnp.asarray(_nhwc(noise_0)), method=VDM.get_loss)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-4)
    for k in ("elbo", "diffusion_loss", "latent_loss",
              "reconstruction_loss"):
        np.testing.assert_allclose(float(metrics[k]),
                                   float(metrics_ref[k]), rtol=2e-4,
                                   err_msg=k)


@pytest.mark.slow
def test_vdm_learned_schedule_loss_differentiable():
    """The learned-NN schedule trains jointly: grads flow through the jvp
    into the schedule params."""
    tm, jm, params = _vdm_pair(noise_schedule="learned_nn")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 8, 3)).astype(np.float32))

    def loss_fn(p):
        loss, _ = jm.apply({"params": p}, x, rng=jax.random.PRNGKey(0),
                           method=VDM.get_loss)
        return loss

    grads = jax.grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))
    g_sched = jax.tree_util.tree_leaves(grads["gamma"])
    assert any(float(jnp.abs(g).max()) > 0 for g in g_sched)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in g_sched)


def test_vdm_ancestral_step_parity(monkeypatch):
    """One p(z_s | z_t) step (Eq. 34, vdm_model.py:346-394) with zero
    sampling noise, plus the DDNM decomposition."""
    tm, jm, params = _vdm_pair()
    rng = np.random.default_rng(6)
    zt = rng.standard_normal((2, *SHAPE_CHW)).astype(np.float32)

    monkeypatch.setattr(
        torch, "randn_like", lambda v, **k: torch.zeros_like(v))
    with torch.no_grad():
        ref = tm.sample_zs_given_zt(torch.from_numpy(zt),
                                    torch.tensor(0.8),
                                    torch.tensor(0.6)).numpy()
    out = jm.apply({"params": params}, jnp.asarray(_nhwc(zt)),
                   jnp.float32(0.8), jnp.float32(0.6),
                   noise=jnp.zeros((2, 8, 8, 3)),
                   method=VDM.sample_zs_given_zt)
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=5e-5,
                               rtol=1e-4)

    with torch.no_grad():
        ref_ddnm = tm.sample_zs_given_zt(
            torch.from_numpy(zt), torch.tensor(0.8), torch.tensor(0.6),
            return_ddnm=True)
    w_z, w_x0, x_0t, scale = jm.apply(
        {"params": params}, jnp.asarray(_nhwc(zt)), jnp.float32(0.8),
        jnp.float32(0.6), return_ddnm=True, method=VDM.sample_zs_given_zt)
    np.testing.assert_allclose(float(w_z), float(ref_ddnm[0]), rtol=1e-5)
    np.testing.assert_allclose(float(w_x0), float(ref_ddnm[1]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x_0t), _nhwc(ref_ddnm[2].numpy()),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(float(scale), float(ref_ddnm[3]), rtol=1e-5)


def test_vdm_sample_scan_runs():
    _, jm, params = _vdm_pair()
    out = sample(jm, params, jax.random.PRNGKey(0), batch_size=2,
                 n_sampling_steps=5, sample_shape=(8, 8, 3))
    assert out.shape == (2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    all_steps = sample(jm, params, jax.random.PRNGKey(0), batch_size=2,
                       n_sampling_steps=5, sample_shape=(8, 8, 3),
                       return_all=True)
    assert all_steps.shape == (5, 2, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(all_steps[-1]),
                                  np.asarray(out))


@pytest.mark.slow
def test_vdm_cfg_guided_prediction():
    """w_cfg guidance: eps_u + w (eps_c - eps_u) (vdm_model.py:308-345);
    w_cfg=1 must equal the plain conditional prediction."""
    from mltools.networks.networks import CUNet as TorchCUNet  # noqa: F401

    from tempo_tpu.interop.unet_ckpt import params_from_torch_cunet

    c, h, w = SHAPE_CHW
    kw = dict(SCORE_KW, v_conditioning_dims=[4], v_embedding_dim=8)
    torch.manual_seed(3)
    from mltools.networks.networks import CUNet as TC
    t_score = TC(shape=SHAPE_CHW, **kw).eval()
    score = CUNet(shape=(h, w, c), chs=tuple(kw["chs"]), norm_groups=4,
                  n_attention_heads=2, dropout_prob=0.0,
                  t_conditioning=True, t_embedding_dim=8,
                  v_conditioning_dims=(4,), v_embedding_dim=8)
    score_params = params_from_torch_cunet(t_score.state_dict(), n_levels=2)
    # at init every residual branch ends in a zero conv, so conditioning
    # cannot reach the output and eps_c == eps_u trivially; perturb off the
    # init point to make guidance observable
    perturb = jax.random.split(jax.random.PRNGKey(7),
                               len(jax.tree_util.tree_leaves(score_params)))
    score_params = jax.tree_util.tree_map(
        lambda p, k: p + 0.1 * jax.random.normal(k, jnp.shape(p),
                                                 jnp.float32),
        score_params,
        jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(score_params), list(perturb)))

    zt = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 8, 8, 3)).astype(np.float32))
    v = [jnp.ones((2, 4))]

    jm1 = VDM(score, w_cfg=1.0)
    guided = jm1.apply({"params": {"score_model": score_params}}, zt,
                       jnp.full((2,), 0.5), guided=True, v_conditionings=v,
                       method=VDM.get_pred_noise)
    plain = jm1.apply({"params": {"score_model": score_params}}, zt,
                      jnp.full((2,), 0.5), v_conditionings=v,
                      method=VDM.get_pred_noise)
    np.testing.assert_allclose(np.asarray(guided), np.asarray(plain),
                               atol=1e-5)

    jm3 = VDM(score, w_cfg=3.0)
    amped = jm3.apply({"params": {"score_model": score_params}}, zt,
                      jnp.full((2,), 0.5), guided=True, v_conditionings=v,
                      method=VDM.get_pred_noise)
    assert np.abs(np.asarray(amped) - np.asarray(plain)).max() > 1e-6


def test_vdm_cfg_dropout_masks_conditioning():
    """p_cfg conditioning dropout sets masked v rows to -1
    (vdm_model.py:224-232) — with p_cfg=1 every row is masked, so the loss
    must equal the explicitly-unconditioned loss."""
    c, h, w = SHAPE_CHW
    kw = dict(SCORE_KW, v_conditioning_dims=[4], v_embedding_dim=8,
              v_conditioning_type="common_linear")
    score = CUNet(shape=(h, w, c), chs=tuple(kw["chs"]), norm_groups=4,
                  n_attention_heads=2, dropout_prob=0.0,
                  t_conditioning=True, t_embedding_dim=8,
                  v_conditioning_dims=(4,), v_embedding_dim=8,
                  v_conditioning_type="common_linear")
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 8, 8, 3)).astype(np.float32))
    v = [jnp.ones((2, 4))]
    jm = VDM(score, p_cfg=1.0)
    params = jm.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1),
                     v_conditionings=v)["params"]
    noise = jnp.asarray(np.random.default_rng(3).standard_normal(
        x.shape).astype(np.float32))
    times = jnp.asarray([0.3, 0.7])
    loss_dropped, _ = jm.apply({"params": params}, x,
                               rng=jax.random.PRNGKey(2), noise=noise,
                               times=times, noise_0=noise,
                               v_conditionings=v, method=VDM.get_loss)
    jm_plain = VDM(score)
    loss_uncond, _ = jm_plain.apply(
        {"params": params}, x, noise=noise, times=times, noise_0=noise,
        v_conditionings=[jnp.full_like(v[0], -1.0)], method=VDM.get_loss)
    np.testing.assert_allclose(float(loss_dropped), float(loss_uncond),
                               rtol=1e-6)


def test_kl_std_normal_parity():
    import mltools.models.model_tools as ref_tools

    m2 = np.abs(np.random.default_rng(0).standard_normal(10)).astype(
        np.float32)
    var = np.abs(np.random.default_rng(1).standard_normal(10)).astype(
        np.float32) + 0.1
    ref = ref_tools.kl_std_normal(torch.from_numpy(m2),
                                  torch.from_numpy(var)).numpy()
    out = kl_std_normal(jnp.asarray(m2), jnp.asarray(var))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


# ---------------- stochastic flow matching ----------------


def _sfm_pair():
    from mltools.models.sfm_model import SFM as TorchSFM
    from mltools.networks.networks import CUNet as TorchCUNet

    from tempo_tpu.interop.unet_ckpt import params_from_torch_cunet

    c, h, w = SHAPE_CHW
    kw = dict(SCORE_KW, s_conditioning_channels=c)
    torch.manual_seed(4)
    t_vel = TorchCUNet(shape=SHAPE_CHW, **kw).eval()
    tm = TorchSFM(t_vel).eval()
    vel = CUNet(shape=(h, w, c), chs=tuple(kw["chs"]), norm_groups=4,
                n_attention_heads=2, dropout_prob=0.0, t_conditioning=True,
                t_embedding_dim=8, s_conditioning_channels=c)
    jm = SFM(vel)
    params = {"velocity_model": params_from_torch_cunet(
        t_vel.state_dict(), n_levels=2)}
    return tm, jm, params


def test_sfm_interpolant_and_loss_parity(monkeypatch):
    """x_t / r_t interpolant and the drift-matching MSE
    (sfm_model.py:86-137) with pinned t and eps."""
    tm, jm, params = _sfm_pair()
    rng = np.random.default_rng(7)
    x0 = rng.standard_normal((2, *SHAPE_CHW)).astype(np.float32)
    x1 = rng.standard_normal((2, *SHAPE_CHW)).astype(np.float32)
    eps = rng.standard_normal((2, *SHAPE_CHW)).astype(np.float32)
    t = np.asarray([0.25, 0.75], np.float32)

    xt_ref = tm.get_xt(torch.from_numpy(x0), torch.from_numpy(x1),
                       torch.from_numpy(t), torch.from_numpy(eps)).numpy()
    rt_ref = tm.get_rt(torch.from_numpy(x0), torch.from_numpy(x1),
                       torch.from_numpy(t), torch.from_numpy(eps)).numpy()
    xt = jm.apply({"params": params}, jnp.asarray(_nhwc(x0)),
                  jnp.asarray(_nhwc(x1)), jnp.asarray(t),
                  jnp.asarray(_nhwc(eps)), method=SFM.get_xt)
    rt = jm.apply({"params": params}, jnp.asarray(_nhwc(x0)),
                  jnp.asarray(_nhwc(x1)), jnp.asarray(t),
                  jnp.asarray(_nhwc(eps)), method=SFM.get_rt)
    np.testing.assert_allclose(np.asarray(xt), _nhwc(xt_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rt), _nhwc(rt_ref), atol=1e-6)

    monkeypatch.setattr(
        torch, "randn_like", lambda v, **k: torch.from_numpy(eps))
    with torch.no_grad():
        loss_ref = tm.compute_loss(torch.from_numpy(x0),
                                   torch.from_numpy(x1),
                                   t=torch.from_numpy(t))
    loss = jm.apply({"params": params}, jnp.asarray(_nhwc(x0)),
                    jnp.asarray(_nhwc(x1)), t=jnp.asarray(t),
                    epsilon=jnp.asarray(_nhwc(eps)),
                    method=SFM.compute_loss)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-4)


def test_sde_integrators_ode_parity():
    """With sigma=0 both steppers reduce to Euler ODE steps — pin the
    trajectory against the torch integrators (sfm_model.py:21-71)."""
    from mltools.models import sfm_model as ref_sfm

    x0 = np.random.default_rng(8).standard_normal((4, 3)).astype(np.float32)
    n = 16

    def drift_np(t, x, x0_):
        return -x + 0.5 * x0_

    for ref_cls, method in ((ref_sfm.EulerSDE, "euler"),
                            (ref_sfm.LeimkuhlerMatthewsSDE, "lm")):
        ref_int = ref_cls(
            drift_func=lambda t, x, x0_: -x + 0.5 * x0_,
            sigma=lambda t: torch.tensor(0.0),
            delta_t=torch.tensor(1.0 / n))
        ref = ref_int.integrate(torch.from_numpy(x0.copy())).numpy()
        out = sde_integrate(drift_np, lambda t: 0.0, jnp.asarray(x0), n,
                            jax.random.PRNGKey(0), method=method)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5,
                                   rtol=1e-5, err_msg=method)


def test_lm_integrator_halves_noise_variance():
    """Leimkuhler-Matthews uses dW/sqrt(2) (sfm_model.py:54-63): with zero
    drift and sigma=1 the terminal variance is half Euler's."""
    x0 = jnp.zeros((4096, 1))
    n = 8

    def zero_drift(t, x, x0_):
        return jnp.zeros_like(x)

    var = {}
    for method in ("euler", "lm"):
        out = sde_integrate(zero_drift, lambda t: 1.0, x0, n,
                            jax.random.PRNGKey(1), method=method)
        var[method] = float(jnp.var(out))
    assert var["euler"] / var["lm"] == pytest.approx(2.0, rel=0.15)


def test_sfm_predict_runs():
    _, jm, params = _sfm_pair()
    x0 = jnp.asarray(np.random.default_rng(9).standard_normal(
        (2, 8, 8, 3)).astype(np.float32))
    out = predict(jm, params, x0, jax.random.PRNGKey(0),
                  n_sampling_steps=4)
    assert out.shape == x0.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_eta1_matches_ancestral_step():
    """In the variance-preserving process, the eta=1 DDIM step IS the
    ancestral posterior step — pinned exactly with shared explicit noise
    (the identity the fast sampler's correctness rests on)."""
    _, jm, params = _vdm_pair()
    rng = np.random.default_rng(5)
    zt = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    t, s = jnp.float32(0.8), jnp.float32(0.55)
    anc = jm.apply({"params": params}, zt, t, s, noise=noise,
                   method=VDM.sample_zs_given_zt)
    ddim = jm.apply({"params": params}, zt, t, s, eta=1.0, noise=noise,
                    method=VDM.sample_zs_given_zt_ddim)
    np.testing.assert_allclose(np.asarray(ddim), np.asarray(anc),
                               rtol=1e-5, atol=1e-5)


def test_ddim_deterministic_sampling():
    """eta=0 DDIM is the deterministic probability-flow corner: from the
    same initial z, different scan rngs must give the SAME samples; and
    the scanned driver composes with return_all like the ancestral one."""
    _, jm, params = _vdm_pair()
    z0 = jnp.asarray(np.random.default_rng(6).standard_normal(
        (2, 8, 8, 3)), jnp.float32)
    a = sample(jm, params, jax.random.PRNGKey(0), batch_size=2,
               n_sampling_steps=5, sample_shape=(8, 8, 3), z=z0,
               method="ddim", eta=0.0)
    b = sample(jm, params, jax.random.PRNGKey(99), batch_size=2,
               n_sampling_steps=5, sample_shape=(8, 8, 3), z=z0,
               method="ddim", eta=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(a)))
    with pytest.raises(ValueError):
        sample(jm, params, jax.random.PRNGKey(0), batch_size=2,
               n_sampling_steps=5, sample_shape=(8, 8, 3), method="dpm")

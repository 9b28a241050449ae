"""CUNet / CMLP parity vs the reference toolkit's torch implementations.

Oracle: /root/reference/src/mltools/networks/networks.py (CUNet 13-294,
CMLP 296-403) imported live; weights mapped NCHW->NHWC through
tempo_tpu.interop.unet_ckpt and forward outputs pinned in float32.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.interop.unet_ckpt import (
    params_from_torch_cmlp,
    params_from_torch_cunet,
)
from tempo_tpu.nn.unet import CMLP, CUNet, scale_params, timestep_embedding

torch = pytest.importorskip("torch")

REF_SRC = Path("/root/reference/src")
pytestmark = pytest.mark.skipif(not REF_SRC.exists(),
                                reason="reference tree not mounted")
if str(REF_SRC) not in sys.path:
    sys.path.insert(0, str(REF_SRC))


def _nhwc(x: np.ndarray) -> np.ndarray:
    """Channel-first -> channel-last, any spatial rank (NCHW -> NHWC,
    NCDHW -> NDHWC)."""
    return np.moveaxis(x, 1, -1)


BASE = dict(chs=[8, 12, 16], norm_groups=4, n_attention_heads=2,
            dropout_prob=0.0, num_res_blocks=1)


def _cunet_pair(shape_chw=(3, 16, 16), **overrides):
    from mltools.networks.networks import CUNet as TorchCUNet

    kw = dict(BASE, **overrides)
    torch.manual_seed(0)
    tm = TorchCUNet(shape=shape_chw, **kw).eval()
    c = shape_chw[0]
    jm = CUNet(shape=(*shape_chw[1:], c),
               chs=tuple(kw["chs"]),
               out_channels=kw.get("out_channels"),
               s_conditioning_channels=kw.get("s_conditioning_channels", 0),
               v_conditioning_dims=tuple(kw.get("v_conditioning_dims", ())),
               v_conditioning_type=kw.get("v_conditioning_type",
                                          "common_zerolinear"),
               v_embedding_dim=kw.get("v_embedding_dim", 64),
               v_embed_no_s_gelu=kw.get("v_embed_no_s_gelu", False),
               t_conditioning=kw.get("t_conditioning", False),
               t_embedding_dim=kw.get("t_embedding_dim", 64),
               num_res_blocks=kw["num_res_blocks"],
               norm_groups=kw["norm_groups"],
               mid_attn=kw.get("mid_attn", True),
               n_attention_heads=kw["n_attention_heads"],
               dropout_prob=kw["dropout_prob"])
    params = params_from_torch_cunet(tm.state_dict(), n_levels=len(kw["chs"]),
                                     num_res_blocks=kw["num_res_blocks"])
    return tm, jm, params


def _compare(tm, jm, params, shape_chw=(3, 16, 16), t=None, s_ch=0,
             v_dims=(), atol=3e-5):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *shape_chw)).astype(np.float32)
    kwargs_t, kwargs_j = {}, {}
    if t is not None:
        kwargs_t["t"] = torch.tensor(t)
        kwargs_j["t"] = jnp.asarray(t)
    if s_ch:
        s = rng.standard_normal((2, s_ch, *shape_chw[1:])).astype(np.float32)
        kwargs_t["s_conditioning"] = torch.from_numpy(s)
        kwargs_j["s_conditioning"] = jnp.asarray(_nhwc(s))
    if v_dims:
        vs = [rng.standard_normal((2, d)).astype(np.float32) for d in v_dims]
        kwargs_t["v_conditionings"] = [torch.from_numpy(v) for v in vs]
        kwargs_j["v_conditionings"] = [jnp.asarray(v) for v in vs]
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), **kwargs_t).numpy()
    out = np.asarray(jm.apply({"params": params}, jnp.asarray(_nhwc(x)),
                              **kwargs_j))
    np.testing.assert_allclose(out, _nhwc(ref), atol=atol, rtol=1e-4)
    return out


def test_cunet_unconditional_parity():
    tm, jm, params = _cunet_pair()
    _compare(tm, jm, params)


def test_cunet_t_and_v_conditioning_parity():
    """Timestep + common-zerolinear vector conditioning
    (networks.py:60-97, 210-247)."""
    tm, jm, params = _cunet_pair(t_conditioning=True,
                                 v_conditioning_dims=[5],
                                 v_embedding_dim=16, t_embedding_dim=8)
    _compare(tm, jm, params, t=0.3, v_dims=(5,))
    _compare(tm, jm, params, t=0.9, v_dims=(5,))


def test_cunet_s_conditioning_and_residual_out_parity():
    """Spatial conditioning concat + channel-changing zero-init residual
    output conv (networks.py:193-208, 283-293)."""
    tm, jm, params = _cunet_pair(s_conditioning_channels=2, out_channels=5)
    _compare(tm, jm, params, s_ch=2)


def test_cunet_mlp_cond_proj_and_no_s_gelu_parity():
    """'common_mlp' conditioning projections + v_embed_no_s_gelu
    (blocks.py:108-118, networks.py:85-97)."""
    tm, jm, params = _cunet_pair(t_conditioning=True,
                                 v_conditioning_dims=[3, 4],
                                 v_conditioning_type="common_mlp",
                                 v_embed_no_s_gelu=True,
                                 v_embedding_dim=8, t_embedding_dim=8)
    _compare(tm, jm, params, t=0.5, v_dims=(3, 4))


def test_cunet_noncommon_conditioning_parity():
    """Non-'common' types feed raw v vectors to every block
    (networks.py:98-101)."""
    tm, jm, params = _cunet_pair(v_conditioning_dims=[6],
                                 v_conditioning_type="separate_linear")
    _compare(tm, jm, params, v_dims=(6,))


def test_cunet_deeper_with_dropout_modules_parity():
    """num_res_blocks=2 and dropout>0 shift the reference's Sequential
    indices (net2.3 vs net2.2) — the importer must still land every
    kernel; eval mode keeps numerics deterministic."""
    tm, jm, params = _cunet_pair(num_res_blocks=2, dropout_prob=0.1)
    _compare(tm, jm, params)


def test_cunet_identity_at_scaled_init():
    """With out_channels == in_channels the zero-init output conv makes the
    net exactly the identity at init (networks.py:283-293), and
    scale_params reproduces the global init_scale."""
    jm = CUNet(shape=(8, 8, 3), chs=(4, 6), norm_groups=2, mid_attn=False,
               dropout_prob=0.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 8, 3)).astype(np.float32))
    params = scale_params(jm.init(jax.random.PRNGKey(0), x)["params"])
    out = jm.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


@pytest.mark.slow
def test_cunet_v_augment_runs():
    """Reparameterized conditioning augmentation (networks.py:85-97,
    248-254) draws through the 'v_augment' rng stream."""
    jm = CUNet(shape=(8, 8, 3), chs=(4, 6), norm_groups=2, mid_attn=False,
               v_conditioning_dims=(5,), v_embedding_dim=4, v_augment=True,
               v_conditioning_type="common_linear", dropout_prob=0.0)
    x = jnp.ones((2, 8, 8, 3))
    v = [jnp.ones((2, 5))]
    params = jm.init({"params": jax.random.PRNGKey(0),
                      "v_augment": jax.random.PRNGKey(1)}, x,
                     v_conditionings=v)["params"]
    # at init every residual branch ends in a zero conv (identity net), so
    # nudge all params to let the augmentation noise reach the output
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(leaves, keys)])
    out1 = jm.apply({"params": params}, x, v_conditionings=v,
                    rngs={"v_augment": jax.random.PRNGKey(2)})
    out2 = jm.apply({"params": params}, x, v_conditionings=v,
                    rngs={"v_augment": jax.random.PRNGKey(3)})
    assert out1.shape == (2, 8, 8, 3)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_cunet_3d_parity():
    """The volumetric dim=3 path (networks.py:43 `self.dim=len(shape)-1`;
    only mid-attn asserts against 3-D, :65-66): 3x3x3 convs, kernel-2
    stride-2 volumetric resamples, conditioning broadcast over three
    spatial axes (blocks.py:143-144)."""
    shape = (3, 8, 8, 8)  # torch (C, D, H, W)
    tm, jm, params = _cunet_pair(shape_chw=shape, chs=[8, 12],
                                 mid_attn=False, t_conditioning=True,
                                 v_conditioning_dims=[5],
                                 v_embedding_dim=8, t_embedding_dim=8)
    _compare(tm, jm, params, shape_chw=shape, t=0.4, v_dims=(5,))


def test_cunet_3d_s_conditioning_and_residual_out_parity():
    shape = (2, 8, 8, 8)
    tm, jm, params = _cunet_pair(shape_chw=shape, chs=[8, 12],
                                 mid_attn=False,
                                 s_conditioning_channels=2, out_channels=4)
    _compare(tm, jm, params, shape_chw=shape, s_ch=2)


def test_cunet_3d_mid_attn_refused():
    """Both implementations refuse 3-D mid-attention (networks.py:65-66)."""
    from mltools.networks.networks import CUNet as TorchCUNet

    with pytest.raises(ValueError, match="3D attention"):
        TorchCUNet(shape=(3, 8, 8, 8), chs=[8, 12], mid_attn=True)
    jm = CUNet(shape=(8, 8, 8, 3), chs=(8, 12), norm_groups=4,
               mid_attn=True, dropout_prob=0.0)
    with pytest.raises(ValueError, match="3D attention"):
        jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 3)))


def test_timestep_embedding_parity():
    from mltools.networks.network_tools import get_timestep_embedding

    t = np.linspace(0.0, 1.0, 7).astype(np.float32)
    ref = get_timestep_embedding(torch.from_numpy(t), 16).numpy()
    out = np.asarray(timestep_embedding(jnp.asarray(t), 16))
    # sin/cos of arguments up to t*T*timescale differ by ~1 ulp-of-arg
    # between the two float32 libm implementations
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-5)


def test_cmlp_parity():
    from mltools.networks.networks import CMLP as TorchCMLP

    torch.manual_seed(0)
    tm = TorchCMLP(in_dim=7, out_dim=3, h_dims=[16, 16],
                   v_conditioning_dims=[4], t_conditioning=True,
                   t_embedding_dim=8).eval()
    jm = CMLP(in_dim=7, out_dim=3, h_dims=(16, 16),
              v_conditioning_dims=(4,), t_conditioning=True,
              t_embedding_dim=8)
    params = params_from_torch_cmlp(tm.state_dict())
    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, 7)).astype(np.float32)
    v = rng.standard_normal((5, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), t=torch.tensor(0.4),
                 v_conditionings=[torch.from_numpy(v)]).numpy()
    out = np.asarray(jm.apply({"params": params}, jnp.asarray(x),
                              t=jnp.asarray(0.4),
                              v_conditionings=[jnp.asarray(v)]))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

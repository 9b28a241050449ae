"""Pallas fused GroupNorm+GELU kernel: numerics vs the plain implementation
(interpret mode on CPU) for forward and gradients, plus the shape gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.ops.norms import gelu_exact, group_norm
from tempo_tpu.ops.pallas_gn import fused_group_norm_act, pallas_gn_supported


@pytest.mark.parametrize("act", ["gelu", "relu", None])
def test_kernel_matches_reference_forward(rng, act):
    x = rng.standard_normal((2, 8, 8, 128)).astype(np.float32)
    scale = rng.standard_normal(128).astype(np.float32)
    bias = rng.standard_normal(128).astype(np.float32)

    got = fused_group_norm_act(jnp.asarray(x), jnp.asarray(scale),
                               jnp.asarray(bias), 8, 1e-6, act,
                               interpret=True)
    act_fn = {"gelu": gelu_exact, "relu": jax.nn.relu, None: None}[act]
    want = group_norm(jnp.asarray(x), 8, jnp.asarray(scale),
                      jnp.asarray(bias), 1e-6, act=act_fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kernel_bfloat16_io(rng):
    x = rng.standard_normal((2, 4, 4, 128)).astype(np.float32)
    scale = np.ones(128, np.float32)
    bias = np.zeros(128, np.float32)
    got = fused_group_norm_act(jnp.asarray(x, jnp.bfloat16),
                               jnp.asarray(scale), jnp.asarray(bias),
                               4, 1e-6, "gelu", interpret=True)
    assert got.dtype == jnp.bfloat16
    want = group_norm(jnp.asarray(x), 4, jnp.asarray(scale),
                      jnp.asarray(bias), 1e-6, act=gelu_exact)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), atol=0.05)


def test_kernel_gradients_match(rng):
    x = rng.standard_normal((1, 4, 4, 128)).astype(np.float32)
    scale = rng.standard_normal(128).astype(np.float32)
    bias = rng.standard_normal(128).astype(np.float32)

    def loss_fused(x, s, b):
        return jnp.sum(jnp.square(
            fused_group_norm_act(x, s, b, 8, 1e-6, "gelu", True)))

    def loss_ref(x, s, b):
        return jnp.sum(jnp.square(
            group_norm(x, 8, s, b, 1e-6, act=gelu_exact)))

    args = (jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_shape_gate():
    assert pallas_gn_supported((8, 64, 64, 512), jnp.bfloat16)
    assert not pallas_gn_supported((8, 64, 64, 512), jnp.float32)  # bf16 only
    assert not pallas_gn_supported((8, 64, 64, 100), jnp.bfloat16)  # lanes
    assert not pallas_gn_supported((1, 2048, 2048, 512), jnp.bfloat16)  # VMEM
    assert not pallas_gn_supported((8, 64, 512), jnp.bfloat16)  # rank


def test_fused_gn_act_conv_matches_reference():
    """Rung-2 kernel (GN+GELU+3x3 conv, ops/pallas_gn_conv.py) numerics in
    interpret mode: must match the XLA chain to bf16 tolerance, including
    the SAME zero-padding halo semantics at the image top/bottom, and be
    differentiable (rematerialized XLA backward)."""
    import numpy as np
    from tempo_tpu.ops.pallas_gn_conv import _reference_chain, fused_gn_act_conv

    rng = np.random.default_rng(0)
    b, h, w, c, f = 2, 16, 16, 256, 128
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    kern = jnp.asarray((rng.standard_normal((3, 3, c, f)) * 0.02
                        ).astype(np.float32))
    cb = jnp.asarray(0.01 * rng.standard_normal(f).astype(np.float32))

    got = fused_gn_act_conv(x, scale, bias, kern, cb, 8, 1e-6, "gelu", True)
    want = _reference_chain(x, scale, bias, kern, cb, 8, 1e-6, "gelu")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=2e-2)

    g = jax.grad(lambda kk: jnp.sum(fused_gn_act_conv(
        x, scale, bias, kk, cb, 8, 1e-6, "gelu", True).astype(jnp.float32))
    )(kern)
    assert g.shape == kern.shape
    assert bool(jnp.all(jnp.isfinite(g)))

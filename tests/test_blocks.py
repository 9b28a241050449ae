"""Unit tests for the core blocks: shapes, GroupNorm/GELU semantics vs torch,
space-to-depth conv equivalence, and the channel-major attention golden test
(SURVEY.md 'hard parts': src/model.py:129-137 is easy to get silently wrong).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.nn.blocks import AttnBlock, Downsample2x, ResNetBlock, Upsample2x
from tempo_tpu.ops.convs import conv2d_nhwc, dense, depth_to_space_2x, space_to_depth_2x
from tempo_tpu.ops.norms import gelu_exact, group_norm

torch = pytest.importorskip("torch")


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 16), dtype=np.float32)
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)

    got = group_norm(jnp.asarray(x), 4, jnp.asarray(scale), jnp.asarray(bias),
                     eps=1e-6)

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    gn = torch.nn.GroupNorm(4, 16, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        want = gn(tx).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gelu_exact_matches_torch(rng):
    x = rng.standard_normal(256).astype(np.float32)
    got = np.asarray(gelu_exact(jnp.asarray(x)))
    want = torch.nn.GELU()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 5), dtype=np.float32)
    w = rng.standard_normal((3, 3, 5, 7)).astype(np.float32) * 0.1
    b = rng.standard_normal(7).astype(np.float32)

    got = conv2d_nhwc(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), padding=1)

    tw = torch.from_numpy(w).permute(3, 2, 0, 1)  # OIHW
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.functional.conv2d(tx, tw, torch.from_numpy(b), padding=1)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_conv2d_lane_split_matches_unsplit(rng, monkeypatch):
    """Ragged channel counts (e.g. the 1028-channel spectral boundary) are
    decomposed into a 128-lane-aligned conv plus a small tail for MXU tiling
    (ops/convs.py:_conv_lane_split); forward and gradients must agree with
    the plain conv to fp32 summation-order tolerance."""
    x = rng.standard_normal((2, 8, 8, 260), dtype=np.float32)  # 2*128 + 4
    w = rng.standard_normal((3, 3, 260, 300)).astype(np.float32) * 0.05
    b = rng.standard_normal(300).astype(np.float32)
    xj, wj, bj = jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)

    def fwd_and_grads():
        y = conv2d_nhwc(xj, wj, bj, padding=1)
        gw, gx = jax.grad(
            lambda ww, xx: jnp.sum(jnp.tanh(conv2d_nhwc(xx, ww, bj,
                                                        padding=1))),
            argnums=(0, 1))(wj, xj)
        return np.asarray(y), np.asarray(gw), np.asarray(gx)

    monkeypatch.setenv("TEMPO_TPU_SPLIT_RAGGED_CONV", "1")
    y1, gw1, gx1 = fwd_and_grads()
    monkeypatch.setenv("TEMPO_TPU_SPLIT_RAGGED_CONV", "0")
    y0, gw0, gx0 = fwd_and_grads()

    np.testing.assert_allclose(y1, y0, atol=1e-4)
    np.testing.assert_allclose(gw1, gw0, atol=1e-3)
    np.testing.assert_allclose(gx1, gx0, atol=1e-3)


def test_space_to_depth_matmul_equals_stride2_conv(rng):
    """Downsample2x must be algebraically identical to a k=2 s=2 conv."""
    x = rng.standard_normal((2, 8, 8, 6), dtype=np.float32)
    w = rng.standard_normal((2, 2, 6, 4)).astype(np.float32) * 0.2
    b = rng.standard_normal(4).astype(np.float32)

    flat_w = w.reshape(4 * 6, 4)  # (kh,kw,cin) flattened
    h = space_to_depth_2x(jnp.asarray(x))
    got = np.asarray(dense(h, jnp.asarray(flat_w), jnp.asarray(b)))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    tw = torch.from_numpy(w).permute(3, 2, 0, 1)
    want = torch.nn.functional.conv2d(tx, tw, torch.from_numpy(b), stride=2)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_depth_to_space_matmul_equals_conv_transpose(rng):
    """Upsample2x must be algebraically identical to ConvTranspose2d(k=2,s=2)."""
    x = rng.standard_normal((2, 4, 4, 6), dtype=np.float32)
    # torch ConvTranspose2d weight: [cin, cout, kh, kw]
    wt = rng.standard_normal((6, 5, 2, 2)).astype(np.float32) * 0.2
    b = rng.standard_normal(5).astype(np.float32)

    # our kernel: [cin, (di, dj, cout)]
    ours = wt.transpose(0, 2, 3, 1).reshape(6, 4 * 5)
    h = dense(jnp.asarray(x), jnp.asarray(ours))
    got = np.asarray(depth_to_space_2x(h) + jnp.asarray(b))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.functional.conv_transpose2d(
        tx, torch.from_numpy(wt), torch.from_numpy(b), stride=2)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def _torch_channel_major_attention(x_nchw, wq, bq, wk, bk, wv, bv, wp, bp,
                                   gn_w, gn_b, n_heads):
    """Independent torch emulation of the reference attention math
    (src/model.py:120-139) used as the golden oracle."""
    h_ = torch.nn.functional.group_norm(x_nchw, 8, gn_w, gn_b, eps=1e-6)
    conv = torch.nn.functional.conv2d
    q = conv(h_, wq, bq)
    k = conv(h_, wk, bk)
    v = conv(h_, wv, bv)
    b, c, hh, ww = q.shape
    c_ = c // n_heads
    q = q.reshape(b, c_, n_heads, hh * ww)
    k = k.reshape(b, c_, n_heads, hh * ww)
    w_ = torch.einsum("bcnq,bcnk->bqkn", q, k) * (int(c_) ** (-0.5))
    w_ = torch.nn.functional.softmax(w_, dim=2)
    v = v.reshape(b, c_, n_heads, hh * ww)
    out = torch.einsum("bcnd,bqdn->bcnq", v, w_)
    out = out.reshape(b, c, hh, ww)
    out = conv(out, wp, bp)
    return x_nchw + out


def test_attention_channel_major_golden(rng):
    n_heads, c = 4, 16
    x = rng.standard_normal((2, 4, 4, c), dtype=np.float32)

    attn = AttnBlock(n_heads=n_heads, num_groups=8, dtype=jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(attn.apply(params, jnp.asarray(x)))

    p = params["params"]

    def dense_to_conv(name):
        kern = np.asarray(p[name]["kernel"])  # [cin, cout]
        w = torch.from_numpy(kern.T.copy()).reshape(c, c, 1, 1)
        b = torch.from_numpy(np.asarray(p[name]["bias"]).copy())
        return w, b

    wq, bq = dense_to_conv("q")
    wk, bk = dense_to_conv("k")
    wv, bv = dense_to_conv("v")
    wp, bp = dense_to_conv("proj_out")
    gn_w = torch.from_numpy(np.asarray(p["norm"]["scale"]).copy())
    gn_b = torch.from_numpy(np.asarray(p["norm"]["bias"]).copy())

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = _torch_channel_major_attention(
        tx, wq, bq, wk, bk, wv, bv, wp, bp, gn_w, gn_b, n_heads)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_resnet_block_shapes():
    x = jnp.ones((2, 8, 8, 16))
    block = ResNetBlock(features=24, dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x)
    y = block.apply(params, x)
    assert y.shape == (2, 8, 8, 24)


def test_zero_init_conv_outputs_input_residual():
    """A fresh ResNetBlock with matching channels must be identity + skip-free
    (its second conv is zero-init, so h ends at 0 only if conv1 output maps to
    zero through conv2 — conv2 zero-init means h == 0)."""
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 4, 8),
                                                             dtype=np.float32))
    block = ResNetBlock(features=8, dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x)
    y = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_down_up_module_shapes():
    x = jnp.ones((2, 8, 8, 6))
    down = Downsample2x(features=12, dtype=jnp.float32)
    dp = down.init(jax.random.PRNGKey(0), x)
    y = down.apply(dp, x)
    assert y.shape == (2, 4, 4, 12)

    up = Upsample2x(features=3, dtype=jnp.float32)
    upp = up.init(jax.random.PRNGKey(0), y)
    z = up.apply(upp, y)
    assert z.shape == (2, 8, 8, 3)

"""Pallas TPU kernel, rung 2: fused GroupNorm + GELU + 3x3 conv.

The GN -> GELU -> conv3x3 chain is the body of every ResNet block
(reference pattern: src/model.py:178-181). Rung 1 (ops/pallas_gn.py) fused
only the prologue and lost in-step because the custom call broke XLA's
conv fusions; this kernel swallows the conv itself, so there is no fusion
boundary left to break: one read of x (plus a tiny stats pass), one write
of the conv output.

Design (TPU-first):
- Layout [B, H, W, C]: C on lanes, W on sublanes; the 3x3 conv is NINE
  shifted matmuls [rows*W, C] x [C, F] accumulated in fp32 on the MXU —
  the classic im2col-free formulation that keeps the MXU fed without
  materializing patches.
- Grid (B, H/rows): each program owns `rows` output rows. The +-1 row
  halo comes from passing x three times with shifted block index maps
  (prev/cur/next row-block); the halo rows are re-normalized on the fly
  (VPU work, recompute factor ~2/rows).
- Per-channel GN statistics come from the rung-1 stats kernel ([B, 2, C]
  mean/rstd), already measured MXU-friendly.
- W-axis shifts are sublane slices of a zero-padded [rows+?, W+2, C]
  block; boundary masking for the first/last row-block zeroes the missing
  halo contribution.

Backward: rematerialized XLA VJP (like rung 1). The forward is where the
fusion-boundary experiment lives; a hand-written backward only pays off if
the forward wins in-step (see docs/DESIGN.md "The Pallas kernel").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tempo_tpu.ops.pallas_gn import _ACTS, _gn_act_pallas, _stats_kernel


def _norm_act_rows(x, stats_ref, scale, bias, act):
    """Normalize + affine + activation for a [R, W, C] fp32 row group."""
    mean_c = stats_ref[0, 0:1, :][None]   # [1, 1, C]
    rstd_c = stats_ref[0, 1:2, :][None]
    y = (x - mean_c) * rstd_c
    y = y * scale + bias
    act_fn = _ACTS[act]
    return act_fn(y) if act_fn is not None else y


def _gn_conv_kernel(xprev_ref, xcur_ref, xnext_ref, stats_ref, scale_ref,
                    bias_ref, w_ref, cb_ref, out_ref, *, act: Optional[str],
                    rows: int, n_row_blocks: int):
    """One program: `rows` output rows of GELU(GN(x)) * W (3x3 SAME)."""
    _, _, _, w, c = xcur_ref.shape
    f = w_ref.shape[-1]
    i = pl.program_id(1)

    scale = scale_ref[:].astype(jnp.float32)[None, None, :]
    bias = bias_ref[:].astype(jnp.float32)[None, None, :]

    # Assemble the [rows+2, W, C] normalized slab: prev block's last row,
    # the current block, next block's first row. Missing halos (image
    # top/bottom) are zeroed — SAME zero padding of the *normalized*
    # activation matches the reference conv padding semantics.
    top = _norm_act_rows(xprev_ref[0, 0, rows - 1:rows].astype(jnp.float32),
                         stats_ref, scale, bias, act)
    top = jnp.where(i > 0, top, 0.0)
    mid = _norm_act_rows(xcur_ref[0, 0].astype(jnp.float32),
                         stats_ref, scale, bias, act)
    bot = _norm_act_rows(xnext_ref[0, 0, 0:1].astype(jnp.float32),
                         stats_ref, scale, bias, act)
    bot = jnp.where(i < n_row_blocks - 1, bot, 0.0)
    slab = jnp.concatenate([top, mid, bot], axis=0)      # [rows+2, W, C]
    # zero-pad W for the dj shifts
    slab = jnp.pad(slab, ((0, 0), (1, 1), (0, 0)))       # [rows+2, W+2, C]
    slab = slab.astype(jnp.bfloat16)

    acc = jnp.zeros((rows * w, f), jnp.float32)
    for di in range(3):
        for dj in range(3):
            window = slab[di:di + rows, dj:dj + w, :]    # [rows, W, C]
            lhs = window.reshape(rows * w, c)
            acc += jax.lax.dot_general(
                lhs, w_ref[di, dj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc += cb_ref[:].astype(jnp.float32)[None, :]
    out_ref[0, 0] = acc.reshape(rows, w, f).astype(out_ref.dtype)


def _gn_conv_pallas(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    kernel: jax.Array, conv_bias: jax.Array,
                    num_groups: int, eps: float, act: Optional[str],
                    rows: int = 8, interpret: bool = False) -> jax.Array:
    """x: [B, H, W, C]; kernel: [3, 3, C, F] -> [B, H, W, F]."""
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    assert h % rows == 0, (h, rows)
    n_row_blocks = h // rows

    x3d = x.reshape(b, h * w, c)
    stats = pl.pallas_call(
        functools.partial(_stats_kernel, num_groups=num_groups, eps=eps),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(x3d)

    xb = x.reshape(b, n_row_blocks, rows, w, c)

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    row_spec = lambda off: pl.BlockSpec(
        (1, 1, rows, w, c),
        lambda i, j, off=off: (i, clamp(j + off, 0, n_row_blocks - 1),
                               0, 0, 0),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_gn_conv_kernel, act=act, rows=rows,
                          n_row_blocks=n_row_blocks),
        grid=(b, n_row_blocks),
        in_specs=[
            row_spec(-1), row_spec(0), row_spec(+1),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, f), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, w, f),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_row_blocks, rows, w, f),
                                       x.dtype),
        interpret=interpret,
    )(xb, xb, xb, stats, scale, bias, kernel.astype(jnp.bfloat16), conv_bias)
    return out.reshape(b, h, w, f)


def _reference_chain(x, scale, bias, kernel, conv_bias, num_groups, eps, act):
    from tempo_tpu.ops.convs import conv2d_nhwc
    from tempo_tpu.ops.norms import group_norm_act

    h = group_norm_act(x, num_groups, scale, bias, eps, act_name=act)
    return conv2d_nhwc(h.astype(x.dtype), kernel, conv_bias, padding=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_gn_act_conv(x, scale, bias, kernel, conv_bias, num_groups: int,
                      eps: float = 1e-6, act: Optional[str] = "gelu",
                      interpret: bool = False):
    """Fused GroupNorm+act+3x3 conv; Pallas forward, XLA backward."""
    return _gn_conv_pallas(x, scale, bias, kernel, conv_bias, num_groups,
                           eps, act, interpret=interpret)


def _fwd(x, scale, bias, kernel, conv_bias, num_groups, eps, act, interpret):
    out = fused_gn_act_conv(x, scale, bias, kernel, conv_bias, num_groups,
                            eps, act, interpret)
    return out, (x, scale, bias, kernel, conv_bias)


def _bwd(num_groups, eps, act, interpret, residuals, g):
    x, scale, bias, kernel, conv_bias = residuals
    _, vjp = jax.vjp(
        lambda xx, ss, bb, kk, cc: _reference_chain(
            xx, ss, bb, kk, cc, num_groups, eps, act),
        x, scale, bias, kernel, conv_bias)
    return vjp(g)


fused_gn_act_conv.defvjp(_fwd, _bwd)

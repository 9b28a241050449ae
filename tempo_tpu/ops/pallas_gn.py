"""Pallas TPU kernel: fused GroupNorm + activation.

The GN->GELU prologue runs before every conv in the network (reference
pattern: src/model.py:178-181 — GN, GELU, conv). Unfused, XLA materializes
an fp32 normalized intermediate between the reduction and the elementwise
tail; this kernel keeps the whole (stats -> normalize -> affine -> GELU)
chain in VMEM per sample and emits the conv-ready tensor in the compute
dtype, saving HBM round-trips on the hot 64x64x512 activations.

Layout: x [B, HW, C] with C on the lane axis. Grid is (B,); each program
owns one sample's [HW, C] block in VMEM (4 MB at the flagship level-0
shape), accumulates per-group sums in fp32, then normalizes + activates.

The backward pass recomputes through the plain-JAX reference implementation
(rematerialized custom VJP) — the forward is the bandwidth-bound direction;
the backward fuses fine under XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tempo_tpu.ops.norms import group_norm

def _erf_approx(x: jax.Array) -> jax.Array:
    """Abramowitz & Stegun 7.1.26 rational erf approximation (max abs error
    1.5e-7 — far below bfloat16 resolution). Mosaic implements neither erf
    nor erfc as primitives, so the exact-GELU path is built from exp."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf(x: jax.Array) -> jax.Array:
    """GELU via the erf approximation (matches exact GELU to ~1e-7)."""
    return 0.5 * x * (1.0 + _erf_approx(x * (2.0 ** -0.5)))


_ACTS = {"gelu": _gelu_erf, "relu": jax.nn.relu, "silu": jax.nn.silu,
         None: None}

# Whole-sample VMEM budget for the stats pass (double-buffered across grid
# steps, so the limit is ~half of the 16 MB VMEM); larger inputs fall back
# to the XLA implementation (e.g. full-granule inference activations).
_MAX_SAMPLE_BYTES = 4 * 1024 * 1024


def _chunk_rows(hw: int, c: int) -> int:
    """Largest row chunk keeping the fp32 working set ~<=1 MB."""
    target = max(8, (1 << 20) // (4 * c))
    chunk = hw
    while chunk > target and chunk % 2 == 0:
        chunk //= 2
    return chunk


def _stats_kernel(x_ref, stats_ref, *, num_groups: int, eps: float):
    """Per-sample per-channel (mean, rstd) -> stats block [1, 2, C]."""
    _, hw, c = x_ref.shape
    cg = c // num_groups
    chunk = _chunk_rows(hw, c)
    n_chunks = hw // chunk

    # Group reductions as matmuls: Mosaic cannot reshape-split the lane
    # (channel) axis, but channel->group aggregation is a [1,C]x[C,G] matmul
    # with a one-hot membership matrix, and the broadcast back is its
    # transpose — both ride the MXU.
    chan = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (chan // cg == grp).astype(jnp.float32)   # [C, G]

    def accumulate(i, carry):
        s, sq = carry
        xb = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return (s + jnp.sum(xb, axis=0, keepdims=True),
                sq + jnp.sum(xb * xb, axis=0, keepdims=True))

    zeros = jnp.zeros((1, c), jnp.float32)
    colsum, colsumsq = jax.lax.fori_loop(0, n_chunks, accumulate,
                                         (zeros, zeros))

    denom = float(hw * cg)
    mean_g = jnp.dot(colsum, onehot,
                     preferred_element_type=jnp.float32) / denom    # [1, G]
    meansq_g = jnp.dot(colsumsq, onehot,
                       preferred_element_type=jnp.float32) / denom  # [1, G]
    var_g = meansq_g - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)

    stats_ref[0, 0:1, :] = jnp.dot(mean_g, onehot.T,
                                   preferred_element_type=jnp.float32)
    stats_ref[0, 1:2, :] = jnp.dot(rstd_g, onehot.T,
                                   preferred_element_type=jnp.float32)


def _apply_kernel(x_ref, stats_ref, scale_ref, bias_ref, out_ref, *,
                  act: Optional[str]):
    """Normalize + affine + activation on a row tile."""
    x = x_ref[0].astype(jnp.float32)            # [R, C]
    mean_c = stats_ref[0, 0:1, :]
    rstd_c = stats_ref[0, 1:2, :]
    y = (x - mean_c) * rstd_c
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    act_fn = _ACTS[act]
    if act_fn is not None:
        y = act_fn(y)
    out_ref[0] = y.astype(out_ref.dtype)


def _gn_act_pallas(x: jax.Array, scale: jax.Array, bias: jax.Array,
                   num_groups: int, eps: float, act: Optional[str],
                   interpret: bool = False) -> jax.Array:
    """x: [B, HW, C] -> same shape/dtype. Two passes: a per-sample stats
    kernel, then a row-tiled apply kernel — same HBM traffic as a fused XLA
    GN (two reads + one write) with no fp32 intermediate materialized."""
    b, hw, c = x.shape

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, num_groups=num_groups, eps=eps),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(x)

    rows = _chunk_rows(hw, c)
    return pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=(b, hw // rows),
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, stats, scale, bias)


def _reference_gn_act(x4d, scale, bias, num_groups, eps, act):
    act_fn = _ACTS[act]
    return group_norm(x4d, num_groups, scale, bias, eps, act=act_fn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm_act(x4d: jax.Array, scale: jax.Array, bias: jax.Array,
                         num_groups: int, eps: float = 1e-6,
                         act: Optional[str] = "gelu",
                         interpret: bool = False) -> jax.Array:
    """x4d: [B, H, W, C]; Pallas forward, rematerialized XLA backward."""
    b, h, w, c = x4d.shape
    x3d = x4d.reshape(b, h * w, c)
    out = _gn_act_pallas(x3d, scale, bias, num_groups, eps, act, interpret)
    return out.reshape(b, h, w, c)


def _fwd(x4d, scale, bias, num_groups, eps, act, interpret):
    out = fused_group_norm_act(x4d, scale, bias, num_groups, eps, act,
                               interpret)
    return out, (x4d, scale, bias)


def _bwd(num_groups, eps, act, interpret, residuals, g):
    x4d, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _reference_gn_act(xx, ss, bb, num_groups, eps, act),
        x4d, scale, bias)
    return vjp(g)


fused_group_norm_act.defvjp(_fwd, _bwd)


def pallas_gn_supported(shape, dtype) -> bool:
    """Whole-sample kernel feasibility check (VMEM budget + lane alignment).
    bfloat16 only: float32 runs are parity runs and stay on the XLA path
    (whose GELU is the exact erf form)."""
    if len(shape) != 4 or jnp.dtype(dtype) != jnp.bfloat16:
        return False
    _, h, w, c = shape
    sample_bytes = h * w * c * jnp.dtype(dtype).itemsize
    return c % 128 == 0 and sample_bytes <= _MAX_SAMPLE_BYTES

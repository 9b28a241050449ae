"""Active-length Pallas decode attention: read only the live cache prefix.

Single-token KV-cache decode is pure HBM streaming, and with a static
[b, S, kv, hd] cache the XLA path reads ALL S slots every step — masked
slots included — because shapes are static (docs/DESIGN.md
"Serving-decode roofline": 0.71 ms/step floor at 1024 slots vs 0.40 at
request-sized). This kernel closes that gap without changing the cache
layout: the sequence axis is tiled into blocks and the block index_map
clamps every block PAST the row's active length to the last live block —
Mosaic elides the DMA when consecutive grid steps map to the same block,
so dead slots are never fetched from HBM. A `pl.when` guard skips their
compute, and within the last live block an absolute-position mask drops
the tail, so the result is exactly softmax(q.K^T/sqrt(hd)).V over
kv_idx <= pos — bit-comparable to the XLA formulation up to fp32
reassociation of the online softmax.

Per-row positions (continuous batching) come for free: the active length
is a scalar-prefetched [b] vector and the grid's batch dimension selects
the row's own clamp.

GQA: the cache keeps kv < n heads and is streamed as-is; q is viewed as
[kv, g, hd] and each kv head's [g, blk] score tile rides its own small
MXU matmul (decode is bandwidth-bound; arithmetic efficiency of the tiny
matmuls is irrelevant next to the bytes saved).

No reference counterpart (the reference re-runs eager torch per token,
networks.py:727-754); this is rung 4 of the serving-decode ladder after
cache dtype, request-sized buffers, and int8 weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                   acc_ref, *, blk: int, kv: int, g: int, scale: float):
    i_b = pl.program_id(0)
    i_s = pl.program_id(1)
    n_blocks = pl.num_programs(1)

    @pl.when(i_s == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    active = pos_ref[i_b] + 1
    start = i_s * blk

    @pl.when(start < active)
    def _block():
        qv = q_ref[0].astype(jnp.float32) * scale      # [n, hd]
        k_blk = k_ref[...].astype(jnp.float32)         # [blk, kv, hd]
        v_blk = v_ref[...].astype(jnp.float32)
        # per-kv-head score tiles; q head order is kv-major (the GQA
        # reshape [b, t, kv, g, hd] of nn/transformer.py)
        rows = []
        for h in range(kv):
            # static python slices: Mosaic TC has no dynamic_slice lowering
            q_h = qv[h * g:(h + 1) * g]
            rows.append(jax.lax.dot_general(
                q_h, k_blk[:, h, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))   # [g, blk]
        s = jnp.concatenate(rows, axis=0) if kv > 1 else rows[0]  # [n, blk]
        idx = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(idx < active, s, -jnp.inf)

        m_prev = m_ref[...]                            # [n, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                         # masked -> exp(-inf)=0
        l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1, keepdims=True)
        pv_rows = []
        for h in range(kv):
            p_h = p[h * g:(h + 1) * g]
            pv_rows.append(jax.lax.dot_general(
                p_h, v_blk[:, h, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))   # [g, hd]
        pv = jnp.concatenate(pv_rows, axis=0) if kv > 1 else pv_rows[0]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = m_new

    @pl.when(i_s == n_blocks - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def _paged_kernel(pos_ref, table_ref, *rest, **kw):
    # the block-table indirection lives entirely in the index maps;
    # the flash-accumulator body is the dense kernel's
    del table_ref
    _decode_kernel(pos_ref, *rest, **kw)


def paged_decode_attention(q: jax.Array, pk: jax.Array, pv: jax.Array,
                           table: jax.Array, pos, *,
                           interpret: bool = False) -> jax.Array:
    """Active-length decode attention over a PAGED cache: softmax(
    q.K^T/sqrt(hd)).V over logical positions kv_idx <= pos, where row r's
    logical page j lives at pool page table[r, j].

    q: [b, 1, n, hd]; pk/pv: [n_pages, page, kv, hd] shared pools;
    table: [b, max_pages] int32; pos: scalar or [b]. Returns
    [b, 1, n, hd] in q's dtype.

    The grid walks (row, logical page); the K/V index maps dereference
    the block table (scalar-prefetched) so each step DMAs one POOL page —
    the gathered dense view of the XLA path is never materialized — and
    clamp dead logical pages to the row's last live one, so Mosaic elides
    their DMA exactly like the dense active-length kernel: HBM reads
    scale with pos, not with the table width."""
    b, t, n, hd = q.shape
    assert t == 1, f"paged decode is the single-token path, got t={t}"
    n_pages, pg, kv, hd_k = pk.shape
    assert hd_k == hd and pk.shape == pv.shape
    assert n % kv == 0, (n, kv)
    g = n // kv
    mp = table.shape[1]
    assert table.shape == (b, mp), (table.shape, b)
    pos_rows = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32).reshape(-1), (b,))

    kernel = functools.partial(_paged_kernel, blk=pg, kv=kv, g=g,
                               scale=1.0 / float(hd) ** 0.5)

    def kv_index(i_b, i_s, pos_ref, table_ref):
        last = pos_ref[i_b] // pg
        return (table_ref[i_b, jnp.minimum(i_s, last)], 0, 0, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, mp),
            in_specs=[
                pl.BlockSpec((None, 1, n, hd),
                             lambda i_b, i_s, pos_ref, table_ref:
                             (i_b, 0, 0, 0)),
                pl.BlockSpec((None, pg, kv, hd), kv_index),
                pl.BlockSpec((None, pg, kv, hd), kv_index),
            ],
            out_specs=pl.BlockSpec(
                (None, 1, n, hd),
                lambda i_b, i_s, pos_ref, table_ref: (i_b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((n, 1), jnp.float32),
                pltpu.VMEM((n, 1), jnp.float32),
                pltpu.VMEM((n, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, n, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(pos_rows, jnp.asarray(table, jnp.int32), q, pk, pv)
    return out


def decode_attention(q: jax.Array, ck: jax.Array, cv: jax.Array,
                     pos, *, block_k: int = 256,
                     interpret: bool = False) -> jax.Array:
    """softmax(q.K^T/sqrt(hd)).V over the cache prefix kv_idx <= pos.

    q: [b, 1, n, hd] (single decode token); ck/cv: [b, S, kv, hd] static
    cache buffers; pos: scalar or [b] absolute position(s). Returns
    [b, 1, n, hd] in q's dtype. HBM reads scale with pos, not S (block
    clamp + Mosaic DMA elision) — the fetch floor for a row at position p
    is ceil((p+1)/block_k) blocks instead of S/block_k.
    """
    b, t, n, hd = q.shape
    assert t == 1, f"decode_attention is the single-token path, got t={t}"
    _, s_len, kv, hd_k = ck.shape
    assert hd_k == hd and ck.shape == cv.shape and ck.shape[0] == b
    assert n % kv == 0, (n, kv)
    g = n // kv
    blk = min(block_k, s_len)
    assert s_len % blk == 0, (
        f"cache length {s_len} must divide by block_k {blk}")
    pos_rows = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32).reshape(-1), (b,))

    kernel = functools.partial(_decode_kernel, blk=blk, kv=kv, g=g,
                               scale=1.0 / float(hd) ** 0.5)

    def kv_index(i_b, i_s, pos_ref):
        # clamp dead blocks to the last live one: the repeated index makes
        # Mosaic skip the DMA, so slots past `pos` are never read
        last = pos_ref[i_b] // blk
        return (i_b, jnp.minimum(i_s, last), 0, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, s_len // blk),
            in_specs=[
                pl.BlockSpec((None, 1, n, hd),
                             lambda i_b, i_s, pos_ref: (i_b, 0, 0, 0)),
                pl.BlockSpec((None, blk, kv, hd), kv_index),
                pl.BlockSpec((None, blk, kv, hd), kv_index),
            ],
            out_specs=pl.BlockSpec(
                (None, 1, n, hd),
                lambda i_b, i_s, pos_ref: (i_b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((n, 1), jnp.float32),    # running max
                pltpu.VMEM((n, 1), jnp.float32),    # running denominator
                pltpu.VMEM((n, hd), jnp.float32),   # running numerator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, n, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # the sequence axis accumulates into scratch: strictly serial
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(pos_rows, q, ck, cv)
    return out

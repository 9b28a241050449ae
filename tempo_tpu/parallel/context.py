"""Context (sequence-axis) parallelism: ring attention over a 'seq' mesh
axis for the transformer family.

The reference is single-GPU with no parallelism (SURVEY.md §2.4); its
longest attention span is 256 tokens. This is the framework's sixth
scaling axis — alongside data (parallel/mesh.py), tensor
(parallel/tensor.py), pipeline (parallel/pipeline.py), expert
(parallel/expert.py) and spatial (parallel/spatial.py) — and it targets
the dimension none of those touch: contexts whose KV activations exceed
one chip's HBM (reference counterpart: the attention at
src/mltools/networks/blocks.py:219-410, which materializes full [T, T]
scores).

Design — causal ring attention (the standard TPU recipe):

- Hidden states, Q, K and V are sharded on the SEQUENCE axis: each of the
  S devices holds a [B, T/S, n_head, head_dim] shard. Q never moves.
- K/V shards rotate around the ring with one `lax.ppermute` per step
  (S steps total, each a single neighbor hop over ICI). Each step
  accumulates its block's contribution with an online-softmax update
  (running max m, normalizer l, weighted accumulator) — numerically the
  flash-attention recurrence, so the result is exact, not approximate.
- Causality is an ABSOLUTE-position mask computed from `lax.axis_index`:
  query global position idx*T/S + i vs the rotating block's origin
  device. Fully-masked blocks contribute exactly zero (the mask
  multiplies the exp'd scores, so no -inf arithmetic and no NaNs).
- The whole loop is a differentiable `lax.scan`: the transpose of
  `ppermute` is the reverse-ring `ppermute`, so `jax.grad` through the
  scan IS backward ring attention — dK/dV flow around the ring in the
  opposite direction with no hand-written backward pass.
- Everything outside attention (LayerNorm, MLP, embeddings, the LM loss)
  is position-local, so the rest of the transformer runs unmodified on
  sequence shards; the cross-entropy just psums its sum/count over 'seq'.

Cost note: plain rotation (ring_attention) has each device compute all S
blocks of scores, including the ~S/2 fully-masked ones — SPMD-uniform
programs cannot skip per-device work when the needed work is non-uniform.
ring_attention_zigzag rebalances with the standard zigzag chunk layout
(shard d holds chunks d and 2S-1-d of 2S) so the needed work IS uniform
and the program computes only ~(2S+1)/4S of the chunk pairs — the causal
factor-2 at scale. Both are pinned equal to the unsharded model to
float32 tolerance (tests/test_context.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tempo_tpu.parallel.mesh import DATA_AXIS
from tempo_tpu.parallel.pipeline import shard_map

SEQ_AXIS = "seq"


def create_cp_mesh(n_seq: int,
                   devices: Optional[Sequence[jax.Device]] = None,
                   n_data: int = 1) -> Mesh:
    """('seq',) mesh, or ('data','seq') with n_data > 1. 'seq' is the FAST
    (innermost) axis so each ring hop is one neighboring ICI link."""
    devices = list(devices) if devices is not None else jax.devices()
    need = n_seq * n_data
    assert len(devices) >= need, (
        f"need {need} devices for {n_data}x{n_seq} (data,seq), "
        f"have {len(devices)}")
    if n_data == 1:
        return Mesh(np.asarray(devices[:n_seq]), (SEQ_AXIS,))
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_seq),
                (DATA_AXIS, SEQ_AXIS))


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   axis_name: str = SEQ_AXIS, causal: bool = True,
                   sm_scale: Optional[float] = None) -> jax.Array:
    """Exact multi-head attention over sequence-sharded q/k/v.

    Call INSIDE a shard_map over `axis_name`. q, k, v: local shards
    [B, T_local, n_head, head_dim]; every device must hold the same
    T_local (global T = S * T_local, shard d owning positions
    [d*T_local, (d+1)*T_local)). Returns the local output shard, equal to
    the corresponding slice of full softmax(QK^T)V. Differentiable.
    """
    b, t, n, hd = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(hd)
    s = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    qf = q.astype(jnp.float32) * sm_scale
    q_pos = idx * t + jnp.arange(t)                      # [t] global

    # running accumulators (flash recurrence), all float32
    m0 = jnp.full((b, n, t), -1e30, jnp.float32)
    l0 = jnp.zeros((b, n, t), jnp.float32)
    acc0 = jnp.zeros((b, n, t, hd), jnp.float32)
    ring = [(i, (i + 1) % s) for i in range(s)]

    def step(carry, _):
        k_blk, v_blk, src, m, l, acc = carry
        scores = jnp.einsum("bqnh,bknh->bnqk", qf,
                            k_blk.astype(jnp.float32))   # [b,n,t,t]
        if causal:
            k_pos = src * t + jnp.arange(t)              # [t] global
            keep = (k_pos[None, :] <= q_pos[:, None]).astype(jnp.float32)
        else:
            keep = jnp.ones((t, t), jnp.float32)
        # masked positions contribute exp(...)*0 — no -inf arithmetic
        blk_max = jnp.max(jnp.where(keep[None, None] > 0, scores, -1e30),
                          axis=-1)                       # [b,n,t]
        new_m = jnp.maximum(m, blk_max)
        p = jnp.exp(scores - new_m[..., None]) * keep[None, None]
        scale = jnp.exp(m - new_m)
        l = l * scale + jnp.sum(p, axis=-1)
        acc = (acc * scale[..., None]
               + jnp.einsum("bnqk,bknh->bnqh", p,
                            v_blk.astype(jnp.float32)))
        m = new_m
        k_blk = jax.lax.ppermute(k_blk, axis_name, ring)
        v_blk = jax.lax.ppermute(v_blk, axis_name, ring)
        src = (src - 1) % s   # after the hop we hold the previous device's
        return (k_blk, v_blk, src, m, l, acc), None

    (_, _, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, idx, m0, l0, acc0), None, length=s)
    # with causal masking every query row sees at least its own position,
    # so l > 0 everywhere; non-causal trivially so
    out = acc / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)     # [b,t,n,hd]


def zigzag_permutation(t_global: int, n_seq: int) -> np.ndarray:
    """Host-side token permutation for the zigzag layout: shard d holds
    chunks (d, 2S-1-d) of the 2S equal chunks, so every shard owns one
    early and one late span and the causal work per ring step is uniform
    across devices. Apply to tokens AND targets before shard_tokens_cp."""
    assert t_global % (2 * n_seq) == 0, (t_global, n_seq)
    c = t_global // (2 * n_seq)
    idx = []
    for d in range(n_seq):
        idx.append(np.arange(d * c, (d + 1) * c))
        idx.append(np.arange((2 * n_seq - 1 - d) * c,
                             (2 * n_seq - d) * c))
    return np.concatenate(idx)


def zigzag_positions(t_local, axis_name: str = SEQ_AXIS) -> jax.Array:
    """[t_local] global positions of this shard's tokens under the zigzag
    layout (call inside the shard_map)."""
    c = t_local // 2
    d = jax.lax.axis_index(axis_name)
    s = jax.lax.psum(1, axis_name)
    ar = jnp.arange(c)
    return jnp.concatenate([d * c + ar, (2 * s - 1 - d) * c + ar])


def ring_attention_zigzag(q: jax.Array, k: jax.Array, v: jax.Array,
                          axis_name: str = SEQ_AXIS,
                          sm_scale: Optional[float] = None) -> jax.Array:
    """Causal ring attention over ZIGZAG-sharded q/k/v — the load-balanced
    schedule that computes only the causally-needed chunk pairs.

    Plain rotation (ring_attention) computes every block of scores and
    multiplies ~half by a zero mask: causal attention needs T^2/2 work but
    the SPMD program does T^2, because with contiguous shards the needed
    work per (device, step) is wildly non-uniform (device 0 needs almost
    nothing, device S-1 everything) and a uniform program must cover the
    worst case. The zigzag layout (shard d = chunks d and 2S-1-d of 2S)
    makes the needed work UNIFORM — at every ring step each device needs
    exactly 2 of the 4 chunk pairs, and both are fully unmasked:

      q_high x k_low   always   (positions (2S-1-d)c.. > src.c+c-1 always)
      q_low  x k_low   iff src < d   (then d.c > src.c+c-1: unmasked)
      q_high x k_high  iff src > d   (then (2S-1-d)c > (2S-1-src)c+c-1)

    so the program computes q_high x k_low plus ONE same-shape pair
    selected by sign(d - src) — 2 c x c chunk pairs per step vs the plain
    rotation's 4 — and only the step-0 local diagonals carry a mask.
    Total: (2S+1) chunk pairs vs 4S, ~the causal factor-2 at large S.
    Exact (same online-softmax recurrence) and differentiable (ppermute
    transposes to the reverse ring); pinned equal to full attention in
    tests/test_context.py.

    q, k, v: [B, t_local, n_head, hd] zigzag shards (t_local even);
    returns the local output shard in the same zigzag layout.
    """
    b, t, n, hd = q.shape
    assert t % 2 == 0, f"zigzag needs an even local length, got {t}"
    c = t // 2
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(hd)
    s = jax.lax.psum(1, axis_name)
    d = jax.lax.axis_index(axis_name)

    qf = q.astype(jnp.float32) * sm_scale
    # chunk-major accumulators: [2, b, n, c(, hd)]
    m = jnp.full((2, b, n, c), -1e30, jnp.float32)
    l = jnp.zeros((2, b, n, c), jnp.float32)
    acc = jnp.zeros((2, b, n, c, hd), jnp.float32)
    q0, q1 = qf[:, :c], qf[:, c:]
    # K/V chunks ride the ring in their ORIGINAL dtype (half the ICI bytes
    # in bfloat16); the update casts to float32 at use
    k0, k1 = k[:, :c], k[:, c:]
    v0, v1 = v[:, :c], v[:, c:]

    def upd(m_c, l_c, acc_c, q_c, k_c, v_c, keep=None):
        # one online-softmax chunk update: q_c,k_c,v_c [b, c, n, hd|..],
        # accumulators for q_c's rows [b, n, c(, hd)]
        k_c = k_c.astype(jnp.float32)
        v_c = v_c.astype(jnp.float32)
        scores = jnp.einsum("bqnh,bknh->bnqk", q_c, k_c)
        if keep is not None:
            blk_max = jnp.max(jnp.where(keep[None, None] > 0, scores, -1e30),
                              axis=-1)
        else:
            blk_max = jnp.max(scores, axis=-1)
        new_m = jnp.maximum(m_c, blk_max)
        p = jnp.exp(scores - new_m[..., None])
        if keep is not None:
            p = p * keep[None, None]
        scale = jnp.exp(m_c - new_m)
        l_c = l_c * scale + jnp.sum(p, axis=-1)
        acc_c = (acc_c * scale[..., None]
                 + jnp.einsum("bnqk,bknh->bnqh", p, v_c))
        return new_m, l_c, acc_c

    # step 0: the local diagonals (the only masked chunk pairs in the
    # whole schedule) + the always-unmasked local q_high x k_low
    tril = jnp.tril(jnp.ones((c, c), jnp.float32))
    m0, l0, a0 = upd(m[0], l[0], acc[0], q0, k0, v0, keep=tril)
    m1, l1, a1 = upd(m[1], l[1], acc[1], q1, k1, v1, keep=tril)
    m1, l1, a1 = upd(m1, l1, a1, q1, k0, v0)
    m = jnp.stack([m0, m1])
    l = jnp.stack([l0, l1])
    acc = jnp.stack([a0, a1])

    ring = [(i, (i + 1) % s) for i in range(s)]

    def step(carry, _):
        k0b, k1b, v0b, v1b, src, m, l, acc = carry
        k0b = jax.lax.ppermute(k0b, axis_name, ring)
        k1b = jax.lax.ppermute(k1b, axis_name, ring)
        v0b = jax.lax.ppermute(v0b, axis_name, ring)
        v1b = jax.lax.ppermute(v1b, axis_name, ring)
        src = (src - 1) % s

        # q_high x k_low: always needed, always unmasked
        m1, l1, a1 = upd(m[1], l[1], acc[1], q1, k0b, v0b)
        m = m.at[1].set(m1)
        l = l.at[1].set(l1)
        acc = acc.at[1].set(a1)

        # the sign(d - src) pair: q_low x k_low when src < d (this shard's
        # early chunk is later than theirs), else q_high x k_high; the
        # chunk index ci = 0/1 selects q, k, v AND the accumulator rows
        sel = src < d
        ci = jnp.where(sel, 0, 1).astype(jnp.int32)
        q_c = jnp.where(sel, q0, q1)
        k_c = jnp.where(sel, k0b, k1b)
        v_c = jnp.where(sel, v0b, v1b)
        m_c = jax.lax.dynamic_index_in_dim(m, ci, 0, keepdims=False)
        l_c = jax.lax.dynamic_index_in_dim(l, ci, 0, keepdims=False)
        a_c = jax.lax.dynamic_index_in_dim(acc, ci, 0, keepdims=False)
        m_c, l_c, a_c = upd(m_c, l_c, a_c, q_c, k_c, v_c)
        m = jax.lax.dynamic_update_index_in_dim(m, m_c, ci, 0)
        l = jax.lax.dynamic_update_index_in_dim(l, l_c, ci, 0)
        acc = jax.lax.dynamic_update_index_in_dim(acc, a_c, ci, 0)
        return (k0b, k1b, v0b, v1b, src, m, l, acc), None

    (_, _, _, _, _, m, l, acc), _ = jax.lax.scan(
        step, (k0, k1, v0, v1, d, m, l, acc), None, length=s - 1)
    out = acc / l[..., None]                         # [2, b, n, c, hd]
    out = jnp.concatenate([out[0], out[1]], axis=2)  # [b, n, t, hd]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def cp_loss_fn(model, mesh: Mesh):
    """loss(params, tokens, targets) with the sequence axis sharded over
    the mesh's 'seq' axis (and the batch over 'data' if present).

    `model` must be a Transformer whose config carries
    seq_axis=SEQ_AXIS (see make_cp_model). tokens/targets: [B, T] with
    T divisible by the 'seq' axis size; for a zigzag model, already
    permuted by zigzag_permutation (shard_tokens_cp does both). The
    per-shard mean NLL is combined with a psum-weighted mean so the
    result equals the unsharded `lm_cross_entropy(logits, targets)`
    exactly (the mean is permutation-invariant).
    """
    from tempo_tpu.ops.losses import lm_cross_entropy

    has_data = DATA_AXIS in mesh.axis_names
    tok_spec = P(DATA_AXIS, SEQ_AXIS) if has_data else P(None, SEQ_AXIS)
    zigzag = bool(getattr(model.config, "seq_zigzag", False))

    def spmd(params, tokens, targets):
        t_local = tokens.shape[1]
        if zigzag:
            pos = zigzag_positions(t_local)[None].astype(jnp.int32)
        else:
            pos = jnp.int32(jax.lax.axis_index(SEQ_AXIS) * t_local)
        logits = model.apply({"params": params}, tokens, input_pos=pos)
        # every shard holds B x t_local positions -> plain psum-mean
        local = lm_cross_entropy(logits, targets)
        loss = jax.lax.pmean(local, SEQ_AXIS)
        if has_data:
            loss = jax.lax.pmean(loss, DATA_AXIS)
        return loss

    def loss_fn(params, tokens, targets):
        return shard_map(
            spmd, mesh=mesh,
            in_specs=(P(), tok_spec, tok_spec),
            out_specs=P(),
            check_rep=False)(params, tokens, targets)

    return loss_fn


def make_cp_model(config, mesh: Mesh, zigzag: bool = False):
    """A Transformer bound to ring attention over this mesh's 'seq' axis.

    The returned model's __call__ runs on sequence SHARDS (inside
    cp_loss_fn's shard_map); its params are identical in structure and
    numerics to the unsharded model's (attention is exact), so
    checkpoints move freely between the two. `zigzag` picks the
    load-balanced causal schedule (ring_attention_zigzag) — feed it
    through shard_tokens_cp(..., zigzag=True)."""
    from tempo_tpu.nn.transformer import Transformer

    assert SEQ_AXIS in mesh.axis_names, mesh.axis_names
    cfg = dataclasses.replace(config, seq_axis=SEQ_AXIS,
                              seq_zigzag=zigzag)
    return Transformer(cfg)


def shard_tokens_cp(tokens: jax.Array, mesh: Mesh,
                    zigzag: bool = False) -> jax.Array:
    """Place a [B, T] host batch with T sharded over 'seq' (and B over
    'data' when the mesh has it). With `zigzag`, apply the zigzag chunk
    permutation first so shard d receives chunks (d, 2S-1-d)."""
    has_data = DATA_AXIS in mesh.axis_names
    if zigzag:
        tokens = np.asarray(tokens)[
            :, zigzag_permutation(tokens.shape[1], mesh.shape[SEQ_AXIS])]
    spec = P(DATA_AXIS, SEQ_AXIS) if has_data else P(None, SEQ_AXIS)
    return jax.device_put(tokens, NamedSharding(mesh, spec))

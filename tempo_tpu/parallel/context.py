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

Cost note: each device computes all S blocks of scores, including the
~S/2 fully-masked ones — SPMD-uniform programs cannot skip per-device
work. Production long-context setups rebalance with a zigzag block
permutation; at the correctness scale this module is pinned at (tests/
test_context.py: equal to the unsharded model to float32 tolerance),
plain rotation keeps the schedule readable.
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


def cp_loss_fn(model, mesh: Mesh):
    """loss(params, tokens, targets) with the sequence axis sharded over
    the mesh's 'seq' axis (and the batch over 'data' if present).

    `model` must be a Transformer whose config carries
    seq_axis=SEQ_AXIS (see make_cp_model). tokens/targets: [B, T] with
    T divisible by the 'seq' axis size. The per-shard mean NLL is
    combined with a psum-weighted mean so the result equals the
    unsharded `lm_cross_entropy(logits, targets)` exactly.
    """
    from tempo_tpu.ops.losses import lm_cross_entropy

    has_data = DATA_AXIS in mesh.axis_names
    tok_spec = P(DATA_AXIS, SEQ_AXIS) if has_data else P(None, SEQ_AXIS)

    def spmd(params, tokens, targets):
        t_local = tokens.shape[1]
        pos0 = jax.lax.axis_index(SEQ_AXIS) * t_local
        logits = model.apply({"params": params}, tokens,
                             input_pos=jnp.int32(pos0))
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


def make_cp_model(config, mesh: Mesh):
    """A Transformer bound to ring attention over this mesh's 'seq' axis.

    The returned model's __call__ runs on sequence SHARDS (inside
    cp_loss_fn's shard_map); its params are identical in structure and
    numerics to the unsharded model's (attention is exact), so
    checkpoints move freely between the two."""
    from tempo_tpu.nn.transformer import Transformer

    assert SEQ_AXIS in mesh.axis_names, mesh.axis_names
    cfg = dataclasses.replace(config, seq_axis=SEQ_AXIS)
    return Transformer(cfg)


def shard_tokens_cp(tokens: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a [B, T] host batch with T sharded over 'seq' (and B over
    'data' when the mesh has it)."""
    has_data = DATA_AXIS in mesh.axis_names
    spec = P(DATA_AXIS, SEQ_AXIS) if has_data else P(None, SEQ_AXIS)
    return jax.device_put(tokens, NamedSharding(mesh, spec))

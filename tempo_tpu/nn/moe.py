"""Mixture-of-experts feed-forward for the transformer family.

No reference counterpart (the reference toolkit's GPT is dense,
`src/mltools/networks/networks.py:418-754`); this is a framework capability
beyond parity, and the model family behind the expert-parallel scaling axis
(parallel/expert.py).

Design is the TPU-canonical GShard/Switch formulation — everything static
shapes and einsums so it lands on the MXU and shards cleanly:

- Routing in float32: top-1 ("Switch", gate = the raw top prob) or top-2
  ("GShard", the two gates renormalized to sum to 1) by
  `config.expert_top_k`.
- Capacity-bounded dispatch: each expert processes at most
  C = ceil(k·tokens/E * capacity_factor) slots; overflow falls through
  the residual connection (that route's MoE output is zero), the classic
  token-dropping behavior, with rank-major priority (secondary routes
  overflow first). Position-in-expert comes from a cumsum over the
  one-hot assignments — no sorts, no dynamic shapes.
- One-hot dispatch [N,E,C] and combine (= dispatch * gate) tensors turn
  routing into three einsums: gather tokens per expert, run the stacked
  expert MLPs ([E,...] leading-axis weights, one batched matmul), scatter
  back. XLA tiles all of it onto the MXU; when the [E,...] weights are
  sharded over an 'expert' mesh axis, the SPMD partitioner inserts the
  all-to-all-shaped collectives over ICI.
- The Switch load-balancing auxiliary loss (E * sum_e fraction_e * prob_e)
  is sown into the 'losses' collection; training code adds
  `aux_weight * moe_aux` when it opts in.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from tempo_tpu.ops.norms import gelu_exact


def _linear_init(std: float = 0.02):
    return nn.initializers.normal(stddev=std)


def moe_lm_loss_fn(model, aux_weight: float = 0.01):
    """Cross-entropy LM loss + aux_weight * (mean Switch aux loss over MoE
    blocks). Returns loss_fn(params, tokens, targets, rng=None) ->
    (loss, metrics); the aux term is collected from the 'losses' collection
    the blocks sow into, so any stack depth works unchanged. With `rng`
    and a dropout-configured model, dropout is live."""
    dropout = model.config.dropout > 0.0

    def loss_fn(params, tokens, targets, rng=None):
        kwargs = {}
        if dropout and rng is not None:
            kwargs = {"deterministic": False, "rngs": {"dropout": rng}}
        logits, state = model.apply({"params": params}, tokens,
                                    mutable=["losses"], **kwargs)
        from tempo_tpu.ops.losses import lm_cross_entropy

        nll = lm_cross_entropy(logits, targets)
        aux_leaves = jax.tree_util.tree_leaves(state.get("losses", {}))
        n_blocks = max(len(aux_leaves), 1)
        aux = sum(aux_leaves) / n_blocks if aux_leaves else jnp.zeros(())
        return nll + aux_weight * aux, {"nll": nll, "moe_aux": aux}

    return loss_fn


class MoEBlock(nn.Module):
    """Drop-in for MLPBlock when config.n_experts > 0."""

    config: "TransformerConfig"  # noqa: F821 — avoid a circular import

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        e = cfg.n_experts
        k = cfg.expert_top_k
        assert 1 <= k <= e, f"expert_top_k={k} must be in [1, {e}]"
        d = cfg.n_embd
        d_hidden = int(cfg.rmlp * d)
        b, t = x.shape[0], x.shape[1]
        n = b * t
        # per-expert slots scale with k: every token occupies k slots total
        capacity = max(1, math.ceil(k * n / e * cfg.expert_capacity_factor))

        tokens = x.reshape(n, d)

        # --- routing (float32 for a stable softmax/top-k) ---
        router_logits = nn.Dense(e, use_bias=False, dtype=jnp.float32,
                                 kernel_init=_linear_init(),
                                 name="router")(tokens.astype(jnp.float32))
        probs = jax.nn.softmax(router_logits, axis=-1)           # [N,E]
        topk_probs, topk_idx = jax.lax.top_k(probs, k)           # [N,k]
        if k > 1:
            # GShard convention: the k gates renormalize to sum to 1
            gates = topk_probs / jnp.sum(topk_probs, -1, keepdims=True)
        else:
            gates = topk_probs  # Switch convention: the raw top-1 prob
        assign_k = jax.nn.one_hot(topk_idx, e, dtype=jnp.float32)  # [N,k,E]
        assign = assign_k[:, 0]                                  # rank-0 [N,E]

        # Switch aux loss on the PRIMARY assignment:
        # E * sum_e (token fraction)_e * (mean prob)_e
        aux = e * jnp.sum(jnp.mean(assign, axis=0) * jnp.mean(probs, axis=0))
        self.sow("losses", "moe_aux", aux,
                 init_fn=lambda: jnp.zeros((), jnp.float32),
                 reduce_fn=lambda acc, v: acc + v)

        # --- capacity-bounded position of each (token, rank) slot ---
        # rank-major ordering: every rank-0 choice outranks every rank-1
        # choice, so secondary routes are the first to overflow
        assign_flat = assign_k.transpose(1, 0, 2).reshape(k * n, e)
        pos_flat = jnp.cumsum(assign_flat, axis=0) * assign_flat - assign_flat
        pos = jnp.sum(pos_flat, axis=-1).astype(jnp.int32)       # [k*N]
        pos = pos.reshape(k, n).T                                # [N,k]
        keep = (pos < capacity).astype(jnp.float32) * gates      # [N,k]
        pos_hot = jax.nn.one_hot(pos, capacity, dtype=jnp.float32)  # [N,k,C]
        # one_hot of pos >= capacity is the all-zero row, which is exactly
        # the drop semantics; the explicit mask below keeps dispatch exact

        dispatch_k = assign_k[..., None] * pos_hot[:, :, None, :]  # [N,k,E,C]
        dispatch_k = dispatch_k * (pos < capacity)[:, :, None, None]
        dispatch = jnp.sum(dispatch_k, axis=1)                   # [N,E,C]
        combine = jnp.sum(dispatch_k * keep[:, :, None, None], axis=1)

        # --- stacked expert MLPs: one batched matmul per layer ---
        # int8 serving mode (nn/quant.py): the [E,...] kernels are stored
        # int8 with per-(expert, out-channel) scales applied AFTER each
        # einsum, so the expert weights stream from HBM at 1 byte/weight
        cd = cfg.dtype
        quant = cfg.quantize == "int8"
        if quant:
            w1 = self.param("w1_q", nn.initializers.zeros,
                            (e, d, d_hidden), jnp.int8)
            s1 = self.param("w1_scale", nn.initializers.ones,
                            (e, d_hidden), jnp.float32)
            w2 = self.param("w2_q", nn.initializers.zeros,
                            (e, d_hidden, d), jnp.int8)
            s2 = self.param("w2_scale", nn.initializers.ones,
                            (e, d), jnp.float32)
        else:
            w1 = self.param("w1", _linear_init(), (e, d, d_hidden))
            w2 = self.param("w2",
                            _linear_init(0.02 / math.sqrt(2 * cfg.n_layer)),
                            (e, d_hidden, d))
        b1 = self.param("b1", nn.initializers.zeros, (e, d_hidden))
        b2 = self.param("b2", nn.initializers.zeros, (e, d))

        expert_in = jnp.einsum("nec,nd->ecd", dispatch.astype(cd),
                               tokens.astype(cd))
        h = jnp.einsum("ecd,edh->ech", expert_in, w1.astype(cd))
        if quant:
            h = h * s1[:, None, :].astype(cd)
        h = gelu_exact(h + b1[:, None].astype(cd))
        if cfg.dropout > 0.0 and not deterministic:
            h = nn.Dropout(cfg.dropout)(h, deterministic=False)
        expert_out = jnp.einsum("ech,ehd->ecd", h, w2.astype(cd))
        if quant:
            expert_out = expert_out * s2[:, None, :].astype(cd)
        expert_out = expert_out + b2[:, None].astype(cd)
        y = jnp.einsum("nec,ecd->nd", combine.astype(cd), expert_out)
        return y.reshape(b, t, d)

"""LoRA (low-rank adaptation) fine-tuning for any param tree.

Parameter-efficient fine-tuning the reference toolkit lacks: freeze the
base weights, train only rank-r factor pairs (a, b) attached to the
matmul kernels, and serve either by merging (zero inference overhead) or
by keeping the adapters separate (many adapters over one shared base).

TPU-shaped by construction: `apply_lora` materializes W + s·(a@b) as a
plain tree-map BEFORE the forward pass — inside a jitted train step XLA
fuses the rank-r matmul and the add into the parameter read, so the model
code (nn/transformer.py etc.) needs no LoRA branches and every existing
kernel (flash attention, quantized serving export after `merge_lora`)
keeps working unchanged. Stacked parameterizations (pipeline stage-stacked
[S, in, out] kernels, MoE [E, d, f] expert matmuls) adapt with batched
factors via a leading-dims einsum.

No reference counterpart (closest surface: the fine-tuning entry points of
src/mltools/networks/networks.py:626-681, which re-train full weights).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

# leaf names eligible for adaptation: dense matmul kernels and stacked
# MoE expert matmuls. Embeddings/norms/biases are excluded on purpose
# (standard LoRA practice — and `wte` rides the tied head, where a
# low-rank delta would break the int8 token-table export).
DEFAULT_TARGETS: Tuple[str, ...] = ("kernel", "w1", "w2")


def _is_target(name: str, leaf, targets: Sequence[str]) -> bool:
    return name in targets and hasattr(leaf, "ndim") and leaf.ndim >= 2


def init_lora(params, rank: int, rng: jax.Array,
              targets: Sequence[str] = DEFAULT_TARGETS,
              stddev: float = 0.01) -> Dict:
    """Build the adapter tree: for every targeted [..., in, out] kernel,
    {'a': [..., in, r] ~ N(0, stddev^2), 'b': [..., r, out] = 0}.

    b=0 makes the adapted model EXACTLY the base model at step 0 (the
    standard LoRA init), so fine-tuning starts from the frozen behavior.
    The returned tree mirrors the param tree's structure with only the
    targeted leaves present — it IS the train state for fine-tuning.
    """
    if rank < 1:
        raise ValueError(f"FATAL: lora rank must be >= 1, got {rank}")
    count = 0

    def rec(node):
        nonlocal count
        out = {}
        for name, leaf in node.items():
            if isinstance(leaf, dict):
                sub = rec(leaf)
                if sub:
                    out[name] = sub
            elif _is_target(name, leaf, targets):
                lead = leaf.shape[:-2]
                key = jax.random.fold_in(rng, count)
                count += 1
                out[name] = {
                    "a": stddev * jax.random.normal(
                        key, lead + (leaf.shape[-2], rank), jnp.float32),
                    "b": jnp.zeros(lead + (rank, leaf.shape[-1]),
                                   jnp.float32),
                }
        return out

    lora = rec(params)
    if count == 0:
        raise ValueError(
            f"FATAL: no leaves named {tuple(targets)} with ndim>=2 found — "
            "nothing to adapt")
    return lora


def apply_lora(params, lora, scale: float = 1.0):
    """params with W := W + scale * a @ b on every adapted leaf.

    The contraction is over the last two axes only, so stacked kernels
    ([S, in, out] pipeline stages, [E, d, f] experts) get per-slice
    adapters for free. The delta is computed in float32 and cast to the
    kernel dtype at the add.
    """

    def rec(pnode, lnode):
        out = {}
        for name, leaf in pnode.items():
            lsub = lnode.get(name) if isinstance(lnode, dict) else None
            if isinstance(leaf, dict):
                out[name] = rec(leaf, lsub or {})
            elif isinstance(lsub, dict) and "a" in lsub and "b" in lsub:
                delta = scale * jnp.einsum(
                    "...ir,...ro->...io",
                    lsub["a"].astype(jnp.float32),
                    lsub["b"].astype(jnp.float32))
                out[name] = leaf + delta.astype(leaf.dtype)
            else:
                out[name] = leaf
        return out

    return rec(params, lora)


# merging is the same contraction — the name marks intent (one-time export
# to a plain checkpoint / quantization / serving artifact, after which the
# adapter tree is dead)
merge_lora = apply_lora


def lora_loss_fn(loss_fn, base_params, scale: float = 1.0):
    """Wrap a (params, *args) loss into a (lora, *args) loss over the
    frozen base. `jax.grad` of the result touches ONLY the adapters;
    under jit the base stays a constant (donated/resident), so optimizer
    state and gradient memory scale with rank, not model size."""

    def wrapped(lora, *args, **kwargs):
        return loss_fn(apply_lora(base_params, lora, scale), *args,
                       **kwargs)

    return wrapped


def num_lora_params(lora) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora))

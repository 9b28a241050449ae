"""Weight-only int8 quantization for the transformer serving path.

TPU-native serving optimization with no reference counterpart (the
reference toolkit serves its GPT in full precision,
src/mltools/networks/networks.py:727-754): single-token KV-cache decode
is HBM-bandwidth-bound — every step streams the full weight set through
the MXU at trivial arithmetic intensity — so storing the block matmul
kernels as int8 with a per-output-channel float scale halves the bytes
per token vs bfloat16 while keeping the matmul itself in the compute
dtype.

Design:
- `QuantDense` mirrors `nn.Dense`'s call contract but stores
  `kernel_q` (int8) + `scale` (float32 per output channel). The forward
  computes `x @ (kernel_q.astype(dtype) * scale)`; XLA fuses the
  convert+scale into the matmul's operand read, so the kernel lives in
  HBM as int8 end to end.
- `quantize_lm_params` converts a TRAINED float param tree into the
  quantized tree `Transformer(cfg with quantize='int8')` expects:
  symmetric per-output-channel rounding of every block Dense kernel
  (attention c_attn/c_proj, MLP c_fc/c_proj, untied lm_head), plus the
  token table `wte` per-row — with a tied head (GPT-2) the table is
  ~1/3 of the weights and is STREAMED by the `h @ wte.T` logit matmul
  every decode step, so it gets the same treatment (gather-then-dequant
  on the way in, scale-after-matmul on the way out) — and stacked MoE
  expert kernels per-(expert, out-channel) with the scale applied after
  the batched einsum (nn/moe.py; the tiny float32 router is untouched).
  The position table and LayerNorm/bias vectors stay float — O(d) reads
  per token, not matmul streams.

Inference-only: QuantDense params initialize to zeros/ones placeholders
(training a quantized model is not supported — convert after training).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

# block-level Dense kernels that dominate decode HBM traffic
_QUANT_KERNELS = ("c_attn", "c_proj", "c_fc", "lm_head")


class QuantDense(nn.Module):
    """Drop-in Dense with an int8 kernel and per-output-channel scale."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (x.shape[-1], self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        w = kernel_q.astype(self.dtype) * scale.astype(self.dtype)
        y = x.astype(self.dtype) @ w
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def quantize_kernel(kernel: jax.Array):
    """(kernel_q int8, scale f32[out]) with symmetric per-output-channel
    scales; exact for kernels whose columns are integer multiples of a
    single step (the round-trip property the tests pin)."""
    kernel = jnp.asarray(kernel, jnp.float32)
    absmax = jnp.max(jnp.abs(kernel), axis=0)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_expert_kernel(kernel: jax.Array):
    """Stacked [E, in, out] MoE expert kernels -> (int8 [E, in, out],
    f32 scale [E, out]): per-(expert, output-channel) symmetric scales,
    applied after the batched einsum (nn/moe.py)."""
    kernel = jnp.asarray(kernel, jnp.float32)
    absmax = jnp.max(jnp.abs(kernel), axis=1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(kernel / scale[:, None, :]),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_lm_params(params: Dict) -> Dict:
    """Float Transformer param tree -> the tree its `quantize='int8'`
    twin expects: block Dense kernels get per-output-channel int8, the
    token table `wte` gets per-row int8 (each embedding vector scaled
    independently — the same scale the tied head then applies per
    logit). Position table and LayerNorm/bias vectors stay float."""

    def rec(tree, name):
        if isinstance(tree, dict):
            if name in _QUANT_KERNELS and "kernel" in tree:
                q, scale = quantize_kernel(tree["kernel"])
                out = {"kernel_q": q, "scale": scale}
                if "bias" in tree:
                    out["bias"] = tree["bias"]
                return out
            if name == "moe" and "w1" in tree and "w2" in tree:
                out = {k: v for k, v in tree.items()
                       if k not in ("w1", "w2")}
                out["w1_q"], out["w1_scale"] = quantize_expert_kernel(
                    tree["w1"])
                out["w2_q"], out["w2_scale"] = quantize_expert_kernel(
                    tree["w2"])
                return out
            out = {}
            for k, v in tree.items():
                if k == "wte" and not isinstance(v, dict):
                    q_t, scale = quantize_kernel(jnp.asarray(v).T)
                    out["wte_q"] = q_t.T
                    out["wte_scale"] = scale
                else:
                    out[k] = rec(v, k)
            return out
        return tree

    return rec(params, "")

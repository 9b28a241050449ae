"""Torch -> flax parameter import for the Transformer.

Two source layouts:

- The reference toolkit's GPT (src/mltools/networks/networks.py:418-478):
  `transformer.wte/wpe/h.{i}.{ln_1,attn,ln_2,mlp}/ln_f` with torch
  nn.Linear kernels ([out, in] — transposed into flax's [in, out]).
- HuggingFace GPT2LMHeadModel (the reference's `from_pretrained` source,
  networks.py:626-681): same tree but Conv1D kernels already stored
  [in, out], so only the reference path transposes.

Import is by state_dict, so it works on live modules, `torch.save` files,
and HF models alike (no download needed — any GPT2LMHeadModel instance).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from tempo_tpu.nn.transformer import TransformerConfig


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(out: Dict, path: str, sd: Mapping[str, Any], key: str,
            transpose: bool) -> None:
    w = _np(sd[key + ".weight"])
    out[path] = {"kernel": w.T if transpose else w}
    if key + ".bias" in sd and sd[key + ".bias"] is not None:
        out[path]["bias"] = _np(sd[key + ".bias"])


def _ln(out: Dict, path: str, sd: Mapping[str, Any], key: str) -> None:
    entry = {"scale": _np(sd[key + ".weight"])}
    if key + ".bias" in sd and sd[key + ".bias"] is not None:
        entry["bias"] = _np(sd[key + ".bias"])
    out[path] = entry


def params_from_torch_transformer(state_dict: Mapping[str, Any],
                                  config: TransformerConfig,
                                  hf_layout: bool = False) -> Dict:
    """Build the flax params tree for `tempo_tpu.nn.transformer.Transformer`
    from a torch GPT state_dict. `hf_layout=True` for HuggingFace
    GPT2LMHeadModel ([in, out] Conv1D kernels, reference
    networks.py:661-664); False for the reference toolkit's own layout."""
    sd = {k: v for k, v in state_dict.items()}
    transpose = not hf_layout
    params: Dict = {}

    if config.tokenized:
        params["wte"] = _np(sd["transformer.wte.weight"])
    else:
        # TiedLinear stores nn.Linear(in, embd) -> weight [embd, in]
        params["wte"] = {"kernel": _np(sd["transformer.wte.lin.weight"]).T}
    if config.pos_embed:
        params["wpe"] = _np(sd["transformer.wpe.weight"])

    for i in range(config.n_layer):
        ref = f"transformer.h.{i}"
        blk: Dict = {}
        if config.ln:
            _ln(blk, "ln_1", sd, f"{ref}.ln_1")
        attn: Dict = {}
        _linear(attn, "c_attn", sd, f"{ref}.attn.c_attn", transpose)
        _linear(attn, "c_proj", sd, f"{ref}.attn.c_proj", transpose)
        blk["attn"] = attn
        if config.mlp:
            if config.ln:
                _ln(blk, "ln_2", sd, f"{ref}.ln_2")
            mlp: Dict = {}
            _linear(mlp, "c_fc", sd, f"{ref}.mlp.c_fc", transpose)
            _linear(mlp, "c_proj", sd, f"{ref}.mlp.c_proj", transpose)
            blk["mlp"] = mlp
        params[f"h_{i}"] = blk

    if config.ln:
        _ln(params, "ln_f", sd, "transformer.ln_f")
    if config.tokenized and not config.tie_emb:
        _linear(params, "lm_head", sd, "lm_head", transpose)
    return params


def params_from_hf_gpt2(model: Any) -> Dict:
    """Import any HuggingFace GPT2LMHeadModel (the reference's
    `from_pretrained` capability, networks.py:626-681) into
    (TransformerConfig, params). Works offline on locally constructed
    models; weight tying means lm_head is dropped."""
    hf_cfg = model.config
    config = TransformerConfig(
        in_size=hf_cfg.vocab_size, block_size=hf_cfg.n_positions,
        n_layer=hf_cfg.n_layer, n_head=hf_cfg.n_head, n_embd=hf_cfg.n_embd,
        bias=True, tokenized=True, tie_emb=True)
    sd = model.state_dict()
    return config, params_from_torch_transformer(sd, config, hf_layout=True)

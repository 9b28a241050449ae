"""Torch -> flax parameter import for CUNet / CMLP.

Maps the reference toolkit's conditional-UNet state_dict layout
(src/mltools/networks/networks.py:13-294 CUNet, 296-403 CMLP; blocks at
src/mltools/networks/blocks.py:74-206) onto tempo_tpu.nn.unet's param
tree. Layout conversions are shared with the VAE importer
(tempo_tpu/interop/torch_ckpt.py): Conv2d OIHW -> HWIO, 1x1 convs and
nn.Linear -> dense kernels [in, out], k2-s2 (transposed) convs -> the
space-to-depth / depth-to-space matmul kernels.

Name map: downs.{i}.resnet_blocks.{j} -> down{i}_res{j}, downs.{i}.down ->
down{i}_down, mid1/mid_attn1/mid2 -> mid1/mid_attn/mid2, ups.{i}.* ->
up{i}_*, embed(s)_[tv]_conditioning(s) -> embed_t / embed_v{i} (fc1/fc2),
cond_projs.{k} -> cond_proj{k}, layers.{i} -> layer{i} (CMLP),
embedders.{i}.{k} -> embed{i}_{k} (CMLP).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

from tempo_tpu.interop.torch_ckpt import (
    _attn_entries,
    _collect,
    _conv_kernel,
    _down_kernel,
    _resnet_entries,
    _set,
    _up_kernel,
)


def _lin(w: np.ndarray) -> np.ndarray:
    """nn.Linear [out, in] -> flax dense [in, out]."""
    return np.transpose(np.asarray(w), (1, 0))


def _embed_mlp(entries: Dict, prefix_ours: str,
               sub: Mapping[str, np.ndarray]) -> None:
    """Sequential [Linear, GELU, Linear, (GELU)] -> fc1/fc2."""
    entries[f"{prefix_ours}/fc1/kernel"] = _lin(sub["0.weight"])
    entries[f"{prefix_ours}/fc1/bias"] = np.asarray(sub["0.bias"])
    entries[f"{prefix_ours}/fc2/kernel"] = _lin(sub["2.weight"])
    entries[f"{prefix_ours}/fc2/bias"] = np.asarray(sub["2.bias"])


def _cond_resnet_entries(prefix_ours: str,
                         sub: Mapping[str, np.ndarray]) -> Dict:
    """ResNetBlock + its cond_projs (blocks.py:100-123)."""
    out = _resnet_entries(prefix_ours, sub)
    for k in sorted(sub):
        m = re.match(r"cond_projs\.(\d+)\.weight$", k)
        if m:  # zerolinear / linear: a single nn.Linear
            i = m.group(1)
            out[f"{prefix_ours}/cond_proj{i}/kernel"] = _lin(sub[k])
            out[f"{prefix_ours}/cond_proj{i}/bias"] = np.asarray(
                sub[f"cond_projs.{i}.bias"])
        m = re.match(r"cond_projs\.(\d+)\.0\.weight$", k)
        if m:  # mlp: Sequential [Linear, act, Linear, act]
            i = m.group(1)
            _embed_mlp(out, f"{prefix_ours}/cond_proj{i}",
                       _collect(sub, f"cond_projs.{i}."))
    return out


def params_from_torch_cunet(state_dict: Mapping[str, Any],
                            n_levels: int, num_res_blocks: int = 1) -> Dict:
    """Build the flax params tree for tempo_tpu.nn.unet.CUNet from the
    reference CUNet's state_dict (networks.py:13-294)."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}
    entries: Dict[str, np.ndarray] = {}

    entries["conv_in/kernel"] = _conv_kernel(sd["conv_in.weight"])
    entries["conv_in/bias"] = sd["conv_in.bias"]

    if "embed_t_conditioning.0.weight" in sd:
        _embed_mlp(entries, "embed_t", _collect(sd, "embed_t_conditioning."))
    for i in range(16):
        if f"embeds_v_conditionings.{i}.0.weight" not in sd:
            break
        _embed_mlp(entries, f"embed_v{i}",
                   _collect(sd, f"embeds_v_conditionings.{i}."))

    for i in range(n_levels):
        for j in range(num_res_blocks):
            entries.update(_cond_resnet_entries(
                f"down{i}_res{j}",
                _collect(sd, f"downs.{i}.resnet_blocks.{j}.")))
        if i != n_levels - 1:
            entries[f"down{i}_down/kernel"] = _down_kernel(
                sd[f"downs.{i}.down.weight"])
            entries[f"down{i}_down/bias"] = sd[f"downs.{i}.down.bias"]

    entries.update(_cond_resnet_entries("mid1", _collect(sd, "mid1.")))
    if "mid_attn1.norm.weight" in sd:
        entries.update(_attn_entries("mid_attn", _collect(sd, "mid_attn1.")))
    entries.update(_cond_resnet_entries("mid2", _collect(sd, "mid2.")))

    for i in range(n_levels):
        for j in range(num_res_blocks):
            entries.update(_cond_resnet_entries(
                f"up{i}_res{j}",
                _collect(sd, f"ups.{i}.resnet_blocks.{j}.")))
        if i != n_levels - 1:
            entries[f"up{i}_up/kernel"] = _up_kernel(sd[f"ups.{i}.up.weight"])
            entries[f"up{i}_up/bias"] = sd[f"ups.{i}.up.bias"]

    entries["norm_out/scale"] = sd["norm_out.weight"]
    entries["norm_out/bias"] = sd["norm_out.bias"]
    entries["conv_out/kernel"] = _conv_kernel(sd["conv_out.weight"])
    entries["conv_out/bias"] = sd["conv_out.bias"]
    if "conv_residual_out.weight" in sd:
        entries["conv_residual_out/kernel"] = _conv_kernel(
            sd["conv_residual_out.weight"])
        entries["conv_residual_out/bias"] = sd["conv_residual_out.bias"]

    params: Dict = {}
    for path, value in entries.items():
        _set(params, path, value)
    return params


def params_from_torch_vdm(state_dict: Mapping[str, Any],
                          score_kind: str = "cunet",
                          n_levels: int = 3,
                          num_res_blocks: int = 1) -> Dict:
    """Import a reference VDM checkpoint (score model + optionally learned
    noise schedule, src/mltools/models/vdm_model.py:20-71 /
    model_tools.py:33-110) into tempo_tpu.models.diffusion.VDM's tree."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}
    score_sd = {k[len("score_model."):]: v for k, v in sd.items()
                if k.startswith("score_model.")}
    if score_kind == "cunet":
        score = params_from_torch_cunet(score_sd, n_levels, num_res_blocks)
    elif score_kind == "cmlp":
        score = params_from_torch_cmlp(score_sd)
    else:
        raise ValueError(f"unknown score_kind {score_kind!r}")
    params: Dict = {"score_model": score}
    if "gamma.b" in sd:          # LearnedLinearSchedule
        params["gamma"] = {"b": sd["gamma.b"], "w": sd["gamma.w"]}
    elif "gamma.l1.weight" in sd:  # NNSchedule (MonotonicLinear stack)
        params["gamma"] = {
            "l1": {"kernel": _lin(sd["gamma.l1.weight"]),
                   "bias": sd["gamma.l1.bias"]},
            "l2": {"kernel": _lin(sd["gamma.l2.weight"]),
                   "bias": sd["gamma.l2.bias"]},
            "l3": {"kernel": _lin(sd["gamma.l3.weight"])},
        }
    return params


def params_from_torch_cmlp(state_dict: Mapping[str, Any]) -> Dict:
    """Build the flax params tree for tempo_tpu.nn.unet.CMLP from the
    reference CMLP's state_dict (networks.py:296-403)."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}
    entries: Dict[str, np.ndarray] = {}

    if "embed_t_conditioning.0.weight" in sd:
        _embed_mlp(entries, "embed_t", _collect(sd, "embed_t_conditioning."))
    for k in sd:
        m = re.match(r"layers\.(\d+)\.weight$", k)
        if m:
            i = m.group(1)
            entries[f"layer{i}/kernel"] = _lin(sd[k])
            entries[f"layer{i}/bias"] = sd[f"layers.{i}.bias"]
        m = re.match(r"embedders\.(\d+)\.(\d+)\.0\.weight$", k)
        if m:
            i, j = m.group(1), m.group(2)
            _embed_mlp(entries, f"embed{i}_{j}",
                       _collect(sd, f"embedders.{i}.{j}."))

    params: Dict = {}
    for path, value in entries.items():
        _set(params, path, value)
    return params

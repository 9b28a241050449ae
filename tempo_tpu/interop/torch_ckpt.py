"""Import reference PyTorch checkpoints into tempo_tpu parameter pytrees.

Lets users of the reference pipeline (cfpark00/TEMPO-VAE) carry their trained
weights over: maps the reference's state_dict layout (SpectralVAE wrapping
AutoencoderKL, src/model.py:579-705; checkpoint schema
src/train_utils.py:122-137) onto this framework's flax param tree, with the
layout conversions:

- Conv2d OIHW -> HWIO
- 1x1 convs -> dense kernels [in, out]
- kernel-2 stride-2 down conv [out,in,2,2] -> space-to-depth matmul kernel
  [(kh,kw,cin) x cout]
- ConvTranspose2d [in,out,2,2] -> depth-to-space matmul kernel
  [cin x (di,dj,cout)]
- GroupNorm weight/bias -> scale/bias

Module-name map (reference -> ours): downs.{i} -> down{i},
resnet_blocks.{j} -> res{j}, net1.0/net1.2/net2.0/net2.-1 ->
norm1/conv1/norm2/conv2, skip_conv -> skip, ups.{i} -> up{i},
attention q/k/v/proj_out/norm keep their names.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO (Conv3d OIDHW -> DHWIO for the volumetric CUNet)."""
    spatial = tuple(range(2, w.ndim))
    return np.transpose(w, spatial + (1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    """1x1[x1] conv OI11[1] -> [in, out]."""
    return np.transpose(w.reshape(w.shape[0], w.shape[1]), (1, 0))


def _down_kernel(w: np.ndarray) -> np.ndarray:
    """k2 s2 conv OI22[2] -> [((kd,)kh,kw,cin), cout]."""
    hwio = _conv_kernel(w)  # [2,2,(2,)in,out]
    return hwio.reshape(-1, hwio.shape[-1])


def _up_kernel(w: np.ndarray) -> np.ndarray:
    """ConvTranspose2d/3d [cin,cout,2,2(,2)] -> [cin, ((dd,)di,dj,cout)]."""
    cin, cout = w.shape[0], w.shape[1]
    spatial = tuple(range(2, w.ndim))
    blk = 2 ** len(spatial)
    return np.transpose(w, (0,) + spatial + (1,)).reshape(cin, blk * cout)


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value, dtype=np.float32)


def _resnet_entries(prefix_ours: str, sub: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Map one ResNetBlock's reference params. `sub` keys are relative
    (e.g. 'net1.0.weight'). net2's conv index depends on dropout presence, so
    we match the LAST conv layer index in net2."""
    out = {}
    out[f"{prefix_ours}/norm1/scale"] = sub["net1.0.weight"]
    out[f"{prefix_ours}/norm1/bias"] = sub["net1.0.bias"]
    out[f"{prefix_ours}/conv1/kernel"] = _conv_kernel(sub["net1.2.weight"])
    out[f"{prefix_ours}/conv1/bias"] = sub["net1.2.bias"]
    out[f"{prefix_ours}/norm2/scale"] = sub["net2.0.weight"]
    out[f"{prefix_ours}/norm2/bias"] = sub["net2.0.bias"]
    conv2_idx = max(int(m.group(1)) for k in sub
                    if (m := re.match(r"net2\.(\d+)\.weight$", k)))
    out[f"{prefix_ours}/conv2/kernel"] = _conv_kernel(sub[f"net2.{conv2_idx}.weight"])
    out[f"{prefix_ours}/conv2/bias"] = sub[f"net2.{conv2_idx}.bias"]
    if "skip_conv.weight" in sub:
        out[f"{prefix_ours}/skip/kernel"] = _dense_kernel(sub["skip_conv.weight"])
        out[f"{prefix_ours}/skip/bias"] = sub["skip_conv.bias"]
    return out


def _attn_entries(prefix_ours: str, sub: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    out[f"{prefix_ours}/norm/scale"] = sub["norm.weight"]
    out[f"{prefix_ours}/norm/bias"] = sub["norm.bias"]
    for name in ("q", "k", "v", "proj_out"):
        out[f"{prefix_ours}/{name}/kernel"] = _dense_kernel(sub[f"{name}.weight"])
        out[f"{prefix_ours}/{name}/bias"] = sub[f"{name}.bias"]
    return out


def _collect(state_dict: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    plen = len(prefix)
    return {k[plen:]: np.asarray(v) for k, v in state_dict.items()
            if k.startswith(prefix)}


def params_from_torch_state_dict(state_dict: Mapping[str, Any],
                                 n_levels: int = 3,
                                 num_res_blocks: int = 1) -> Dict:
    """Reference SpectralVAE state_dict -> AutoencoderKL param tree (plain
    nested dict, compatible with flax.serialization.from_state_dict)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v))
          for k, v in state_dict.items()}
    # tolerate both the SpectralVAE wrapper ('vae.encoder...') and a bare
    # AutoencoderKL ('encoder...')
    if not any(k.startswith("vae.") for k in sd):
        sd = {f"vae.{k}": v for k, v in sd.items()}

    entries: Dict[str, np.ndarray] = {}

    for coder, ours in (("encoder", "encoder"), ("decoder", "decoder")):
        base = f"vae.{coder}."
        entries[f"{ours}/conv_in/kernel"] = _conv_kernel(sd[base + "conv_in.weight"])
        entries[f"{ours}/conv_in/bias"] = sd[base + "conv_in.bias"]
        entries[f"{ours}/conv_out/kernel"] = _conv_kernel(sd[base + "conv_out.weight"])
        entries[f"{ours}/conv_out/bias"] = sd[base + "conv_out.bias"]
        entries[f"{ours}/norm_out/scale"] = sd[base + "norm_out.weight"]
        entries[f"{ours}/norm_out/bias"] = sd[base + "norm_out.bias"]
        for mid in ("mid1", "mid2"):
            entries.update(_resnet_entries(
                f"{ours}/{mid}", _collect(sd, base + f"{mid}.")))
        if base + "mid_attn1.norm.weight" in sd:
            entries.update(_attn_entries(
                f"{ours}/mid_attn1", _collect(sd, base + "mid_attn1.")))

    for i in range(n_levels):
        base = f"vae.encoder.downs.{i}."
        for j in range(num_res_blocks):
            entries.update(_resnet_entries(
                f"encoder/down{i}/res{j}",
                _collect(sd, base + f"resnet_blocks.{j}.")))
            attn = _collect(sd, base + f"attention_blocks.{j}.")
            if attn:
                entries.update(_attn_entries(f"encoder/down{i}/attn{j}", attn))
        entries[f"encoder/down{i}/down_kernel"] = _down_kernel(sd[base + "down.weight"])
        entries[f"encoder/down{i}/down_bias"] = sd[base + "down.bias"]

        base = f"vae.decoder.ups.{i}."
        for j in range(num_res_blocks):
            entries.update(_resnet_entries(
                f"decoder/up{i}/res{j}",
                _collect(sd, base + f"resnet_blocks.{j}.")))
            attn = _collect(sd, base + f"attention_blocks.{j}.")
            if attn:
                entries.update(_attn_entries(f"decoder/up{i}/attn{j}", attn))
        entries[f"decoder/up{i}/up_kernel"] = _up_kernel(sd[base + "up.weight"])
        entries[f"decoder/up{i}/up_bias"] = sd[base + "up.bias"]

    entries["quant_conv/kernel"] = _dense_kernel(sd["vae.quant_conv.weight"])
    entries["quant_conv/bias"] = sd["vae.quant_conv.bias"]
    entries["post_quant_conv/kernel"] = _dense_kernel(sd["vae.post_quant_conv.weight"])
    entries["post_quant_conv/bias"] = sd["vae.post_quant_conv.bias"]
    entries["logvar"] = sd["vae.logvar"]

    tree: Dict = {}
    for path, value in entries.items():
        _set(tree, path, value)
    return tree


def l2_params_from_torch_state_dict(state_dict: Mapping[str, Any],
                                    mlp_hidden=(512, 512),
                                    n_levels: int = 3,
                                    num_res_blocks: int = 1) -> Dict:
    """Reference VAEWithL2Supervision state_dict -> VAEWithL2Head param tree.

    Reference layout (src/model_with_l2.py:11-59): 'vae.*' is the base VAE;
    'l2_head.mlp.{i}.*' is a Sequential of [Conv2d(1x1, bias=False),
    GroupNorm(8), GELU] per hidden dim plus a final biased Conv2d(1x1)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v))
          for k, v in state_dict.items()}
    vae_sd = {k: v for k, v in sd.items() if k.startswith("vae.")}
    vae_tree = params_from_torch_state_dict(vae_sd, n_levels, num_res_blocks)

    head: Dict = {}
    idx = 0
    for i in range(len(mlp_hidden)):
        head[f"dense{i}_kernel"] = _dense_kernel(
            sd[f"l2_head.mlp.{idx}.weight"])
        head[f"norm{i}"] = {"scale": sd[f"l2_head.mlp.{idx + 1}.weight"],
                            "bias": sd[f"l2_head.mlp.{idx + 1}.bias"]}
        idx += 3  # conv, groupnorm, gelu
    head["out_kernel"] = _dense_kernel(sd[f"l2_head.mlp.{idx}.weight"])
    head["out_bias"] = sd[f"l2_head.mlp.{idx}.bias"]
    return {"vae": vae_tree, "l2_head": head}


def _state_dict_from_ckpt(path) -> Mapping[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) \
        else ckpt


def load_torch_checkpoint(path, n_levels: int = 3, num_res_blocks: int = 1
                          ) -> Dict:
    """Load a reference .pt checkpoint file (either a raw state_dict or the
    trainer schema with 'model_state_dict')."""
    return params_from_torch_state_dict(_state_dict_from_ckpt(path),
                                        n_levels, num_res_blocks)


def load_torch_l2_checkpoint(path, mlp_hidden=(512, 512), n_levels: int = 3,
                             num_res_blocks: int = 1) -> Dict:
    """Load a reference L2-supervised .pt checkpoint (vae + l2_head)."""
    return l2_params_from_torch_state_dict(_state_dict_from_ckpt(path),
                                           mlp_hidden, n_levels,
                                           num_res_blocks)


def _infer_arch(vae_template: Mapping) -> tuple:
    """(n_levels, num_res_blocks) read off a param-tree template."""
    enc = vae_template["encoder"]
    n_levels = sum(1 for k in enc if str(k).startswith("down"))
    nrb = sum(1 for k in enc["down0"] if str(k).startswith("res"))
    return n_levels, nrb


def params_for_template(path, params_template) -> Dict:
    """Convert a reference .pt checkpoint into whatever tree shape the
    caller's template has: base VAE template <- base or L2 checkpoint (vae
    subtree); VAEWithL2Head template <- L2 checkpoint. Architecture sizes
    (levels, res blocks, head widths) are inferred from the template, so
    every analysis/serving CLI can consume reference checkpoints without
    extra configuration."""
    from flax import serialization

    sd = _state_dict_from_ckpt(path)
    has_l2 = any(k.startswith("l2_head.") for k in sd)
    wants_l2 = "l2_head" in params_template

    if wants_l2:
        if not has_l2:
            raise ValueError(
                f"FATAL: {path} is a base-VAE checkpoint but the model "
                "expects an L2-supervised (vae + l2_head) tree")
        head = params_template["l2_head"]
        hidden = []
        i = 0
        while f"dense{i}_kernel" in head:
            hidden.append(int(head[f"dense{i}_kernel"].shape[1]))
            i += 1
        n_levels, nrb = _infer_arch(params_template["vae"])
        converted = l2_params_from_torch_state_dict(
            sd, tuple(hidden), n_levels, nrb)
    else:
        if has_l2:
            # base-VAE consumer of an L2-supervised run: use its vae.*
            sd = {k: v for k, v in sd.items() if k.startswith("vae.")}
        n_levels, nrb = _infer_arch(params_template)
        converted = params_from_torch_state_dict(sd, n_levels, nrb)
    return serialization.from_state_dict(params_template, converted)

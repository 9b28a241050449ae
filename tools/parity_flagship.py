#!/usr/bin/env python3
"""Flagship-scale loss-trajectory parity harness (the BASELINE.md
north-star: loss curves matching the reference PyTorch implementation to
<1e-3, demonstrated at the FULL 1028-channel / 27.3M-parameter config, in
both float32 and the shipped bfloat16 mode).

Two phases, run as separate processes (torch on the CPU host, jax on TPU):

  # 1. oracle (CPU, ~10 min): reference semantics from src/model.py:654-669
  #    + src/train_utils.py:149-183 (fwd -> L1+KL loss -> bwd -> global-norm
  #    clip(1.0) -> AdamW), posterior mode so no RNG enters.
  python tools/parity_flagship.py torch --out /tmp/parity

  # 2. ours (TPU): identical initial weights (via interop), identical
  #    batches, one fused jitted step; per-step relative error vs oracle.
  python tools/parity_flagship.py jax --out /tmp/parity --dtype float32
  python tools/parity_flagship.py jax --out /tmp/parity --dtype bfloat16

Outputs <out>/oracle.json, <out>/init_weights.pt, <out>/jax_<dtype>.json.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

N_STEPS = 60
BATCH = 2
TILE = 64
N_SPECTRAL = 1028
LR, BETAS, WD = 1e-4, (0.9, 0.95), 0.05
DATA_SEED = 1234

FLAGSHIP = dict(shape=(N_SPECTRAL, TILE, TILE), chs=(512, 256, 128),
                z_channels=32, embed_dim=32, n_attention_heads=4,
                norm_groups=8)


def make_batches() -> np.ndarray:
    """[steps, B, H, W, C] synthetic z-scored tiles, the training-data
    distribution after normalization (clip +-10 never binds at sigma=1)."""
    rng = np.random.default_rng(DATA_SEED)
    return rng.standard_normal(
        (N_STEPS, BATCH, TILE, TILE, N_SPECTRAL)).astype(np.float32)


def _suffix(perturb: bool) -> str:
    return "_perturbed" if perturb else ""


def perturb_zero_params(ref, torch) -> None:
    """Replace every all-zero weight tensor (the reference's zero-init final
    convs, src/model.py:13-17) with small N(0, 0.02) noise so the decode
    path contributes from step 0. Without this the early trajectory is
    dominated by the learned logvar scalar and |x| itself (recon starts at
    exactly 0), which makes the parity check insensitive to compute dtype;
    the perturbed run measures the real bfloat16 drift envelope."""
    gen = torch.Generator().manual_seed(99)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if p.ndim >= 2 and bool((p == 0).all()):
                p.copy_(torch.randn(p.shape, generator=gen) * 0.02)


def run_torch(out: Path, perturb: bool = False) -> None:
    import importlib.util
    import sys

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_model_parity", "/root/reference/src/model.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_model_parity"] = mod
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    enc_dec_params = dict(
        shape=FLAGSHIP["shape"], chs=list(FLAGSHIP["chs"]), attn_sizes=[],
        mid_attn=True, num_res_blocks=1, dropout_prob=0.0,
        z_channels=FLAGSHIP["z_channels"], double_z=True,
        n_attention_heads=FLAGSHIP["n_attention_heads"],
        norm_groups=FLAGSHIP["norm_groups"], norm_eps=1e-6, norm_affine=True,
        act="gelu", conv_kernel_size=3, conv_padding_mode="zeros")
    ref = mod.AutoencoderKL(enc_dec_params=enc_dec_params,
                            embed_dim=FLAGSHIP["embed_dim"],
                            nll_loss_type="l1", kl_weight=1e-6)
    ref.train()
    n_params = sum(p.numel() for p in ref.parameters())
    assert n_params == 27289893, n_params
    if perturb:
        perturb_zero_params(ref, torch)
    torch.save(ref.state_dict(), out / f"init_weights{_suffix(perturb)}.pt")

    opt = torch.optim.AdamW(ref.parameters(), lr=LR, betas=BETAS, eps=1e-8,
                            weight_decay=WD)
    batches = make_batches()
    losses, nlls, kls = [], [], []
    t0 = time.time()
    for step in range(N_STEPS):
        tb = torch.from_numpy(
            np.transpose(batches[step], (0, 3, 1, 2)).copy())
        recon, post = ref(tb, sample_posterior=False)
        rec_err = torch.nn.functional.l1_loss(tb, recon, reduction="none")
        nll = torch.sum(rec_err / torch.exp(ref.logvar) + ref.logvar) / BATCH
        kl = 1e-6 * torch.sum(post.kl()) / BATCH
        loss = nll + kl
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=1.0)
        opt.step()
        losses.append(float(loss.detach()))
        nlls.append(float(nll.detach()))
        kls.append(float(kl.detach()))
        print(f"torch step {step}: loss={losses[-1]:.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    (out / f"oracle{_suffix(perturb)}.json").write_text(json.dumps({
        "n_steps": N_STEPS, "batch": BATCH, "seed": DATA_SEED,
        "n_params": n_params, "perturbed": perturb,
        "loss": losses, "nll": nlls, "kl": kls,
        "elapsed_s": time.time() - t0,
    }))
    print(f"oracle written to {out / f'oracle{_suffix(perturb)}.json'}")


def run_jax(out: Path, dtype: str, perturb: bool = False) -> None:
    import jax

    if dtype == "float32":
        # full-precision contractions everywhere for the parity claim; the
        # conv/dense ops already request highest precision on f32 inputs.
        jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import torch
    from flax import serialization

    from tempo_tpu.interop.torch_ckpt import params_from_torch_state_dict
    from tempo_tpu.models.vae import AutoencoderKL, VAEConfig, vae_loss
    from tempo_tpu.train.state import create_train_state, make_optimizer
    from tempo_tpu.train.step import make_train_step

    oracle = json.loads((out / f"oracle{_suffix(perturb)}.json").read_text())
    cfg = VAEConfig(shape=FLAGSHIP["shape"], chs=FLAGSHIP["chs"],
                    z_channels=FLAGSHIP["z_channels"],
                    embed_dim=FLAGSHIP["embed_dim"],
                    n_attention_heads=FLAGSHIP["n_attention_heads"],
                    norm_groups=FLAGSHIP["norm_groups"],
                    compute_dtype=dtype)
    model = AutoencoderKL(cfg)
    x0 = jnp.zeros((1, TILE, TILE, N_SPECTRAL), jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x0,
                           rng=jax.random.PRNGKey(1))["params"])
    state_dict = torch.load(out / f"init_weights{_suffix(perturb)}.pt",
                            map_location="cpu", weights_only=True)
    params = serialization.from_state_dict(
        jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), template),
        params_from_torch_state_dict(state_dict))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def loss_fn(p, batch, rng_unused):
        recon, posterior = model.apply({"params": p}, batch,
                                       sample_posterior=False)
        return vae_loss(batch, recon, posterior, p["logvar"], cfg)

    tx = make_optimizer(lr=LR, betas=BETAS, weight_decay=WD)
    state = create_train_state(params, tx, jax.random.PRNGKey(0))
    step_fn = make_train_step(loss_fn, tx, donate=False)

    batches = make_batches()
    losses, nlls, kls = [], [], []
    t0 = time.time()
    for step in range(N_STEPS):
        state, metrics = step_fn(state, jnp.asarray(batches[step]))
        losses.append(float(metrics["loss"]))  # scalar fetch = true barrier
        nlls.append(float(metrics["nll_loss"]))
        kls.append(float(metrics["kl_loss"]))
        print(f"jax[{dtype}] step {step}: loss={losses[-1]:.3f} "
              f"(ref {oracle['loss'][step]:.3f}, {time.time() - t0:.0f}s)",
              flush=True)

    def rel_err(ours, ref, floor=0.0):
        ours, ref = np.asarray(ours), np.asarray(ref)
        # floor guards terms that start at exactly 0 (KL under zero-init)
        return np.abs(ours - ref) / np.maximum(np.abs(ref), floor if floor
                                               else np.abs(ref).min() + 1e-30)

    rel = rel_err(losses, oracle["loss"])
    # the total loss is dominated by the logvar*N constant; nll/kl expose
    # the reconstruction- and encoder-dependent numerics much more sharply
    rel_nll = rel_err(nlls, oracle["nll"])
    kl_floor = max(np.abs(oracle["kl"]).max() * 1e-3, 1e-12)
    rel_kl = rel_err(kls, oracle["kl"], floor=kl_floor)
    result = {
        "dtype": dtype, "n_steps": N_STEPS, "batch": BATCH,
        "perturbed": perturb,
        "device": str(jax.devices()[0]),
        "loss": losses, "nll": nlls, "kl": kls,
        "rel_err_per_step": rel.tolist(),
        "rel_err_max": float(rel.max()),
        "rel_err_mean": float(rel.mean()),
        "nll_rel_err_max": float(rel_nll.max()),
        "kl_rel_err_max": float(rel_kl.max()),
        "elapsed_s": time.time() - t0,
    }
    path = out / f"jax_{dtype}{_suffix(perturb)}.json"
    path.write_text(json.dumps(result))
    print(f"max rel err vs oracle: {rel.max():.3e}  (mean {rel.mean():.3e}); "
          f"nll {rel_nll.max():.3e}; kl {rel_kl.max():.3e}")
    print(f"written to {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["torch", "jax"])
    ap.add_argument("--out", default="/tmp/parity_flagship")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--perturb", action="store_true",
                    help="break the zero-init final convs (shared noise) so "
                         "the decode path is live from step 0")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    if args.phase == "torch":
        run_torch(out, perturb=args.perturb)
    else:
        run_jax(out, args.dtype, perturb=args.perturb)


if __name__ == "__main__":
    main()

"""Pipeline (stage-axis) parallelism for the transformer family.

The reference is single-GPU (SURVEY.md §2.4); this is the fourth scaling
axis of the framework, next to data (parallel/mesh.py), tensor
(parallel/tensor.py) and spatial (parallel/spatial.py) parallelism. It
targets the depth dimension the other axes don't touch: models with more
transformer blocks than fit one chip's HBM.

Design — the classic collective-permute pipeline (the "How to Scale Your
Model" recipe), written for the GPT of nn/transformer.py (reference
counterpart: `src/mltools/networks/networks.py:418-754`, which has no
parallelism at all):

- The `n_layer` homogeneous blocks are split into `n_stages` contiguous
  stages. Per-block param trees are STACKED: leading axis `n_stages`
  (sharded over the mesh's 'pipe' axis, so each device holds exactly its
  stage), second axis `layers_per_stage` (scanned on-device).
- The batch is split into `n_micro` microbatches. One `lax.scan` runs
  `n_micro + n_stages - 1` ticks; each tick every device applies its stage
  to its current activation and hands it to the next stage with a single
  `lax.ppermute` — the only inter-stage communication, one hop over ICI.
- Stage 0 injects a fresh microbatch each tick; the last stage banks its
  finished microbatch. Injection/extraction are `jnp.where` on the device's
  own `lax.axis_index`, so the program stays SPMD-uniform (no per-device
  control flow, one compiled program).
- Everything is inside one `shard_map`, and the whole thing is
  differentiable: the transpose of `ppermute` is the reverse `ppermute`,
  so `jax.grad` of the pipelined loss IS the reverse pipeline schedule —
  backward runs the bubble in the opposite direction with no hand-written
  backward pass.
- Embedding / final-LN / unembedding are computed replicated on every
  device (they are O(vocab·d), negligible next to the block stack this
  axis exists for); their gradient replication is handled by shard_map's
  transpose (psum of cotangents).

Bubble fraction is (n_stages-1)/(n_micro+n_stages-1): pick
n_micro >= 4*n_stages in production. Correctness here is pinned against
the unpipelined model on the CPU test mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8: keyword-only, check_rep renamed to check_vma
    from jax import shard_map as _shard_map_new

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True,
                  manual_axes=None):
        kw = {}
        if manual_axes is not None:
            # axes NOT listed stay automatic: GSPMD keeps partitioning
            # over them inside the manual region (tensor-parallel compose)
            kw["axis_names"] = frozenset(manual_axes)
        return _shard_map_new(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=check_rep,
                              **kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True,
                  manual_axes=None):
        kw = {}
        if manual_axes is not None:
            kw["auto"] = frozenset(mesh.axis_names) - frozenset(manual_axes)
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=check_rep,
                              **kw)

from tempo_tpu.nn.transformer import (LayerNorm, Transformer,
                                      TransformerBlock, TransformerConfig)
from tempo_tpu.parallel.mesh import DATA_AXIS
from tempo_tpu.parallel.tensor import MODEL_AXIS

PIPE_AXIS = "pipe"


def create_pp_mesh(n_pipe: int,
                   devices: Optional[Sequence[jax.Device]] = None,
                   n_data: int = 1, n_model: int = 1) -> Mesh:
    """('pipe',) mesh over the first n_pipe devices; with n_data > 1 a 2-D
    ('data','pipe') mesh composing data parallelism with the pipeline; with
    n_model > 1 additionally a 3-D ('data','pipe','model') mesh — the
    dp x pp x tp layout a real multi-pod run uses. Faster-varying axes are
    chattier: 'model' (per-layer TP collectives) is innermost so they ride
    neighboring ICI links, 'pipe' (one ppermute hop per microbatch tick)
    next, 'data' (one gradient all-reduce per step) outermost."""
    devices = list(devices) if devices is not None else jax.devices()
    need = n_pipe * n_data * n_model
    assert len(devices) >= need, (
        f"need {need} devices for {n_data}x{n_pipe}x{n_model} "
        f"(data,pipe,model), have {len(devices)}")
    if n_model > 1:
        return Mesh(
            np.asarray(devices[:need]).reshape(n_data, n_pipe, n_model),
            (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))
    if n_data == 1:
        return Mesh(np.asarray(devices[:n_pipe]), (PIPE_AXIS,))
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_pipe),
                (DATA_AXIS, PIPE_AXIS))


def split_pipeline_params(params: Dict, n_stages: int
                          ) -> Tuple[Dict, Any]:
    """Split a Transformer param tree into (rest, stage_stack).

    `stage_stack` stacks the h_0..h_{L-1} block subtrees into leaves of
    shape [n_stages, layers_per_stage, ...]; `rest` is everything else
    (wte/wpe/ln_f/lm_head), left replicated. Raises if n_layer does not
    divide evenly — ragged stages would force per-stage programs.
    """
    block_names = sorted((k for k in params if k.startswith("h_")),
                         key=lambda k: int(k.split("_")[1]))
    n_layer = len(block_names)
    assert n_layer and n_layer % n_stages == 0, (
        f"n_layer={n_layer} must be a positive multiple of "
        f"n_stages={n_stages}")
    per_stage = n_layer // n_stages

    blocks = [params[k] for k in block_names]
    layer_stack = jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)
    stage_stack = jax.tree.map(
        lambda l: l.reshape((n_stages, per_stage) + l.shape[1:]),
        layer_stack)
    rest = {k: v for k, v in params.items() if not k.startswith("h_")}
    return rest, stage_stack


def merge_pipeline_params(rest: Dict, stage_stack: Any) -> Dict:
    """Inverse of split_pipeline_params (for checkpoint export)."""
    shapes = jax.tree.leaves(stage_stack)[0].shape
    n_layer = shapes[0] * shapes[1]
    flat = jax.tree.map(
        lambda l: l.reshape((n_layer,) + l.shape[2:]), stage_stack)
    params = dict(rest)
    for i in range(n_layer):
        params[f"h_{i}"] = jax.tree.map(lambda l: l[i], flat)
    return params


def _is_fsdp_expert_leaf(path) -> bool:
    """Stacked MoE expert weights ([S, L/S, E, ...] after stacking): the
    leaves worth ZeRO-sharding — they carry the E× parameter blowup.
    Router weights stay replicated (they're O(d·E), negligible)."""
    names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    return "moe" in names and names[-1] in ("w1", "b1", "w2", "b2")


def pp_shardings(mesh: Mesh, rest: Dict, stage_stack: Any,
                 fsdp_experts: bool = False):
    """(rest_sharding, stack_sharding): stages sharded on their leading
    axis over 'pipe', everything else replicated. With `fsdp_experts` (and
    a 'data' axis in the mesh), stacked MoE expert weights additionally
    shard their expert axis over 'data' — ZeRO-style storage sharding,
    gathered on use inside the pipeline. On a 3-D ('data','pipe','model')
    mesh every float leaf additionally shards its LAST (output-channel)
    axis over 'model' when divisible — the same uniform rule as
    parallel/tensor.py; 'model' stays a GSPMD auto axis inside the
    pipeline's shard_map, so XLA inserts the per-layer TP collectives."""
    n_model = (mesh.shape[MODEL_AXIS]
               if MODEL_AXIS in mesh.axis_names else 1)

    def _tp_tail(leaf) -> bool:
        shape = getattr(leaf, "shape", ())
        dtype = getattr(leaf, "dtype", None)
        return (n_model > 1 and dtype is not None
                and jnp.issubdtype(dtype, jnp.floating) and len(shape) >= 1
                and shape[-1] >= n_model and shape[-1] % n_model == 0)

    def _with_tail(front, leaf):
        """Sharding with `front` spec entries, padded with Nones, plus the
        'model' tail on the last axis when the tensor rule applies."""
        ndim = len(getattr(leaf, "shape", ()))
        spec = list(front) + [None] * (ndim - len(front))
        if _tp_tail(leaf) and spec[-1] is None:
            spec[-1] = MODEL_AXIS
        while spec and spec[-1] is None:
            # trailing Nones are semantically inert; trimming keeps the
            # spec canonical (P('pipe',None,'data') not ...,None,None)
            spec.pop()
        return NamedSharding(mesh, P(*spec))

    use_fsdp = fsdp_experts and DATA_AXIS in mesh.axis_names
    stack_s = jax.tree_util.tree_map_with_path(
        lambda path, leaf: _with_tail(
            (PIPE_AXIS, None, DATA_AXIS)
            if use_fsdp and _is_fsdp_expert_leaf(path) else (PIPE_AXIS,),
            leaf),
        stage_stack)
    rest_s = jax.tree.map(lambda leaf: _with_tail((), leaf), rest)
    return rest_s, stack_s


def place_pipeline_params(mesh: Mesh, rest: Dict, stage_stack: Any,
                          fsdp_experts: bool = False):
    rest_s, stack_s = pp_shardings(mesh, rest, stage_stack, fsdp_experts)
    return (jax.tree.map(jax.device_put, rest, rest_s),
            jax.tree.map(jax.device_put, stage_stack, stack_s))


def make_pipelined_apply(config: TransformerConfig, n_stages: int,
                         n_micro: int, mesh: Mesh,
                         fsdp_experts: bool = False):
    """Returns apply(rest, stage_stack, tokens) -> logits, the pipelined
    forward of Transformer.__call__ (deterministic), jittable and
    differentiable. tokens: [B, T] ints (tokenized) or [B, T, in_size]
    floats; B must divide by n_micro.

    `fsdp_experts` (MoE models on a ('data','pipe') mesh): the stacked
    expert weights live sharded over 'data' (ZeRO-style — each data slice
    stores 1/D of every expert) and are all-gathered at stage entry; the
    transpose of that gather is a reduce-scatter, so gradient shards come
    back for free. Storage drops D-fold while the compute stays the
    plain data-parallel pipeline."""
    block = TransformerBlock(config)
    model = Transformer(config)

    def stage_apply(stage_params, h):
        # scan the stage's own layers; layer_new (KV cache) is None here
        def body(hh, layer_params):
            out, _ = block.apply({"params": layer_params}, hh)
            return out, None
        h, _ = jax.lax.scan(body, h, stage_params)
        return h

    cfg_embed = dataclasses.replace(config, n_layer=0, ln=False)
    embed_model = Transformer(cfg_embed)

    def embed(rest, tokens):
        """Everything before h_0 — reuse the real model code path by
        running it with zero layers (and tapping x_0) so numerics can't
        drift from Transformer.__call__."""
        _, hiddens = embed_model.apply(
            {"params": {k: v for k, v in rest.items() if k != "ln_f"}},
            tokens, capture=True, mutable=["hiddens"])
        return hiddens["hiddens"]["x_0"]

    def head(rest, h):
        if config.ln:
            h = LayerNorm(config.bias, config.dtype).apply(
                {"params": rest["ln_f"]}, h)
        if config.tokenized:
            if config.tie_emb:
                return h @ rest["wte"].T.astype(config.dtype)
            return h @ rest["lm_head"]["kernel"].astype(config.dtype)
        return h @ rest["wte"]["kernel"].T.astype(config.dtype)

    def pipelined(rest, stage_stack, tokens):
        # [B, ...] -> [n_micro, mb, ...]
        b = tokens.shape[0]
        assert b % n_micro == 0, f"batch {b} % n_micro {n_micro} != 0"
        micro = tokens.reshape((n_micro, b // n_micro) + tokens.shape[1:])

        use_fsdp = fsdp_experts and DATA_AXIS in mesh.axis_names
        if use_fsdp and config.n_experts:
            n_data = mesh.shape[DATA_AXIS]
            assert config.n_experts % n_data == 0, (
                f"FATAL: n_experts={config.n_experts} must be a positive "
                f"multiple of the mesh 'data' axis ({n_data}) for "
                f"fsdp_experts")

        def spmd(rest, stage, micro):
            stage = jax.tree.map(lambda l: l[0], stage)  # [1,L/S,..]->[L/S,..]
            if use_fsdp:
                # gather the 'data'-sharded expert axis (axis 1 of
                # [L/S, E/D, ...]) back to full E for compute
                stage = jax.tree_util.tree_map_with_path(
                    lambda path, l: jax.lax.all_gather(
                        l, DATA_AXIS, axis=1, tiled=True)
                    if _is_fsdp_expert_leaf(path) else l,
                    stage)
            idx = jax.lax.axis_index(PIPE_AXIS)
            h_in = jax.vmap(lambda t: embed(rest, t))(micro)  # [M, mb, T, D]
            state = jnp.zeros_like(h_in[0])
            banked = jnp.zeros_like(h_in)

            def tick(carry, t):
                state, banked = carry
                feed = h_in[jnp.minimum(t, n_micro - 1)]
                state = jnp.where(
                    jnp.logical_and(idx == 0, t < n_micro), feed, state)
                state = stage_apply(stage, state)
                done = t - (n_stages - 1)
                slot = jnp.clip(done, 0, n_micro - 1)
                bank = jnp.logical_and(idx == n_stages - 1, done >= 0)
                banked = jnp.where(
                    bank,
                    jax.lax.dynamic_update_index_in_dim(banked, state,
                                                        slot, 0),
                    banked)
                state = jax.lax.ppermute(
                    state, PIPE_AXIS,
                    [(i, (i + 1) % n_stages) for i in range(n_stages)])
                return (state, banked), None

            (_, banked), _ = jax.lax.scan(
                tick, (state, banked), jnp.arange(n_micro + n_stages - 1))
            # only the last stage holds real outputs; replicate them
            banked = jnp.where(idx == n_stages - 1, banked, 0.0)
            banked = jax.lax.psum(banked, PIPE_AXIS)
            # keep the [n_micro, mb_local, ...] structure: flattening
            # happens OUTSIDE the shard_map so the 'data'-axis concat puts
            # microbatches back in global order
            return jax.vmap(lambda h: head(rest, h))(banked)

        # with a ('data','pipe') mesh the per-microbatch batch dim is
        # additionally sharded over 'data'; each data slice runs its own
        # pipeline and the grads all-reduce over 'data' at the jit level
        has_data = DATA_AXIS in mesh.axis_names
        micro_spec = P(None, DATA_AXIS) if has_data else P()

        rest_s, stack_s = pp_shardings(mesh, rest, stage_stack,
                                       fsdp_experts=use_fsdp)
        # 3-D ('data','pipe','model') mesh: 'data' and 'pipe' are manual
        # (the hand-written schedule above), 'model' stays an AUTO axis —
        # in_specs may only name manual axes, and GSPMD keeps partitioning
        # the channel-sharded params (pp_shardings' 'model' tails) inside
        # the manual region, inserting the per-layer TP collectives.
        has_model = MODEL_AXIS in mesh.axis_names
        manual = ([a for a in mesh.axis_names if a != MODEL_AXIS]
                  if has_model else None)

        def _spec(s):
            if not has_model:
                return s.spec
            return P(*(None if name == MODEL_AXIS else name
                       for name in s.spec))

        logits = shard_map(
            spmd, mesh=mesh,
            in_specs=(jax.tree.map(_spec, rest_s),
                      jax.tree.map(_spec, stack_s),
                      micro_spec),
            out_specs=micro_spec,
            check_rep=False,
            manual_axes=manual,
        )(rest, stage_stack, micro)
        return logits.reshape((b,) + logits.shape[2:])

    return pipelined


def make_pp_loss_fn(config: TransformerConfig, n_stages: int, n_micro: int,
                    mesh: Mesh, fsdp_experts: bool = False):
    """Cross-entropy LM loss through the pipeline (tokenized models)."""
    apply_fn = make_pipelined_apply(config, n_stages, n_micro, mesh,
                                    fsdp_experts=fsdp_experts)

    def loss_fn(params, tokens, targets):
        rest, stage_stack = params
        logits = apply_fn(rest, stage_stack, tokens)
        from tempo_tpu.ops.losses import lm_cross_entropy

        return lm_cross_entropy(logits, targets)

    return loss_fn

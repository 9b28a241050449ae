"""Sharded checkpointing: save/restore WITHOUT single-host materialization.

The single-file msgpack checkpoints (train/checkpoint.py) `jax.device_get`
the whole state onto one host — fine at the flagship's 27M parameters, but
a contradiction for the tensor-parallel axis, which exists precisely for
model configurations wider than one chip's HBM (parallel/tensor.py): such a
state cannot be assembled into one host buffer. This module writes each
leaf as ONE .npy file streamed shard-by-shard from the devices that hold
it, and restores through `jax.make_array_from_callback`, which reads only
the slices each local device needs from a memory-mapped file. At no point
does a full-leaf host array exist on any process.

Layout (a directory, so the sweep's `ckpt_step=*` glob still matches):

    checkpoints/ckpt_step=NNNNNN.shards/
        index.json          # step, rng, ema, metric history, leaf table
        leaf_0000.npy ...   # one standard .npy per pytree leaf

Multi-process protocol: process 0 creates every .npy (header + zeros via
np.lib.format.open_memmap), all processes sync, then every process writes
the addressable replica-0 shards it owns into the shared file (each byte
range is written by exactly one process), syncs again, and process 0
finalizes index.json last — an index.json therefore implies a complete
checkpoint, preserving the atomicity contract of the msgpack path.

Reference artifact parity: same `ckpt_step=` naming and step/metrics
payload as the reference checkpoints (src/train_utils.py:122-147); this is
the scale-out variant the reference never needed (SURVEY.md §2.4).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import numpy as np
from flax import serialization

from tempo_tpu.train.state import TrainState

SHARDED_SUFFIX = ".shards"
_INDEX = "index.json"


def _leaf_table(state_dict: Any) -> List[Tuple[str, Any]]:
    """(keystr, leaf) pairs in deterministic flatten order. Operates on the
    to_state_dict form so optax tuple states become nested dicts, matching
    the msgpack checkpoints' structure."""
    flat = jax.tree_util.tree_flatten_with_path(state_dict)[0]
    return [(jax.tree_util.keystr(kp), leaf) for kp, leaf in flat]


def _sync(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def sharded_checkpoint_path(ckpt_dir: Union[str, Path], step: int) -> Path:
    from tempo_tpu.train.checkpoint import CKPT_PREFIX

    return Path(ckpt_dir) / f"{CKPT_PREFIX}{step:06d}{SHARDED_SUFFIX}"


def save_checkpoint_sharded(ckpt_dir: Union[str, Path], state: TrainState,
                            train_metrics: Optional[List[Dict]] = None,
                            val_metrics: Optional[List[Dict]] = None) -> Path:
    step = int(state.step)
    path = sharded_checkpoint_path(ckpt_dir, step)
    path.mkdir(parents=True, exist_ok=True)

    payload = {
        "params": serialization.to_state_dict(state.params),
        "opt_state": serialization.to_state_dict(state.opt_state),
    }
    leaves = _leaf_table(payload)
    primary = jax.process_index() == 0

    # Phase 1 (process 0): create each .npy with its final header+size.
    # open_memmap writes the header and sparse-extends; no data pass.
    table = []
    for i, (key, leaf) in enumerate(leaves):
        fname = f"leaf_{i:04d}.npy"
        table.append({"key": key, "file": fname,
                      "shape": list(np.shape(leaf)),
                      "dtype": np.dtype(
                          getattr(leaf, "dtype", np.asarray(leaf).dtype)).name})
        if primary:
            mm = np.lib.format.open_memmap(
                path / fname, mode="w+",
                dtype=np.dtype(table[-1]["dtype"]),
                shape=tuple(table[-1]["shape"]))
            del mm
    _sync(f"tempo-ckpt-create-{step}")

    # Phase 2 (all processes): stream addressable replica-0 shards into the
    # shared files. A full-leaf host array is never built.
    for entry, (_, leaf) in zip(table, leaves):
        target = path / entry["file"]
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            shards = [s for s in leaf.addressable_shards if s.replica_id == 0]
            if not shards:
                continue  # another process owns every replica-0 shard
            mm = np.lib.format.open_memmap(target, mode="r+")
            for shard in shards:
                mm[shard.index] = np.asarray(shard.data)
            mm.flush()
            del mm
        elif primary:
            mm = np.lib.format.open_memmap(target, mode="r+")
            mm[...] = np.asarray(leaf)
            mm.flush()
            del mm
    _sync(f"tempo-ckpt-write-{step}")

    # Phase 3 (process 0): the index is written LAST — its presence marks a
    # complete checkpoint (atomic via tmp+rename, like the msgpack path).
    if primary:
        host_small = jax.device_get({"rng": state.rng})
        index = {
            "format": 1,
            "step": step,
            "rng": np.asarray(host_small["rng"]).tolist(),
            "rng_dtype": np.asarray(host_small["rng"]).dtype.name,
            "ema": {k: float(v) for k, v in (state.ema or {}).items()},
            "train_metrics": train_metrics or [],
            "val_metrics": val_metrics or [],
            "leaves": table,
        }
        tmp = path / (_INDEX + ".tmp")
        tmp.write_text(json.dumps(index))
        tmp.replace(path / _INDEX)
    _sync(f"tempo-ckpt-done-{step}")
    return path


def is_sharded_checkpoint(path: Union[str, Path]) -> bool:
    path = Path(path)
    return path.is_dir() and (path / _INDEX).exists()


def load_checkpoint_sharded(path: Union[str, Path],
                            state_template: TrainState
                            ) -> Tuple[TrainState, List[Dict], List[Dict]]:
    """Restore with the TEMPLATE's shardings, never assembling a full leaf.

    `state_template` must carry device arrays with the target shardings
    (e.g. the freshly shard_state_tp'd init state). Each template leaf's
    sharding drives a `make_array_from_callback` whose callback serves
    slices straight from the memory-mapped .npy, so every process/device
    reads only the bytes it will hold.
    """
    path = Path(path)
    index = json.loads((path / _INDEX).read_text())

    template_payload = {
        "params": serialization.to_state_dict(state_template.params),
        "opt_state": serialization.to_state_dict(state_template.opt_state),
    }
    template_leaves = dict(_leaf_table(template_payload))

    # Fallback sharding (leaves absent from the template): replicate over
    # the mesh recovered from sibling leaves — same policy as
    # checkpoint.place_like.
    fallback = None
    for leaf in template_leaves.values():
        sh = getattr(leaf, "sharding", None)
        if getattr(sh, "mesh", None) is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            fallback = NamedSharding(sh.mesh, PartitionSpec())
            break

    restored: Dict[str, jax.Array] = {}
    for entry in index["leaves"]:
        mm = np.load(path / entry["file"], mmap_mode="r")
        template_leaf = template_leaves.get(entry["key"])
        sharding = getattr(template_leaf, "sharding", None) or fallback
        shape = tuple(entry["shape"])
        if sharding is None:
            restored[entry["key"]] = jax.device_put(np.asarray(mm))
            continue
        restored[entry["key"]] = jax.make_array_from_callback(
            shape, sharding,
            lambda idx, _mm=mm: np.asarray(_mm[idx]))

    def _rebuild(tree: Any, prefix_leaves: Dict[str, jax.Array]) -> Any:
        flat = jax.tree_util.tree_flatten_with_path(tree)
        leaves = [prefix_leaves[jax.tree_util.keystr(kp)]
                  for kp, _ in flat[0]]
        return jax.tree_util.tree_unflatten(flat[1], leaves)

    params_sd = _rebuild(template_payload["params"], {
        k[len("['params']"):]: v for k, v in restored.items()
        if k.startswith("['params']")})
    opt_sd = _rebuild(template_payload["opt_state"], {
        k[len("['opt_state']"):]: v for k, v in restored.items()
        if k.startswith("['opt_state']")})

    params = serialization.from_state_dict(state_template.params, params_sd)
    opt_state = serialization.from_state_dict(state_template.opt_state, opt_sd)

    rng = np.asarray(index["rng"]).astype(index.get("rng_dtype", "uint32"))
    ema_raw = index.get("ema") or {}
    ema = ({k: np.float32(v) for k, v in ema_raw.items()}
           if ema_raw else state_template.ema)
    state = state_template.replace(
        step=np.asarray(index["step"], dtype=np.int32),
        params=params,
        opt_state=opt_state,
        rng=rng,
        ema=ema,
    )
    return state, index.get("train_metrics", []), index.get("val_metrics", [])


def load_params_sharded(path: Union[str, Path], params_template: Any) -> Any:
    """Model parameters only, from a sharded checkpoint directory — the
    analysis/serving entry (mirrors checkpoint.load_params). Loads each
    params leaf from its .npy; leaves land on the default device (analysis
    runs single-chip; use load_checkpoint_sharded for training resume with
    mesh shardings)."""
    path = Path(path)
    index = json.loads((path / _INDEX).read_text())
    prefix = "['params']"
    restored = {}
    for entry in index["leaves"]:
        if not entry["key"].startswith(prefix):
            continue
        restored[entry["key"][len(prefix):]] = np.load(path / entry["file"])

    flat = jax.tree_util.tree_flatten_with_path(
        serialization.to_state_dict(params_template))
    leaves = []
    for kp, leaf in flat[0]:
        key = jax.tree_util.keystr(kp)
        if key not in restored:
            raise ValueError(
                f"FATAL: params leaf {key} missing from sharded checkpoint "
                f"{path}")
        leaves.append(restored[key])
    sd = jax.tree_util.tree_unflatten(flat[1], leaves)
    return serialization.from_state_dict(params_template, sd)

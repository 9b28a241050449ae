"""Checkpointing: single-file msgpack snapshots of the full train state.

Artifact parity with the reference (src/train_utils.py:122-147): checkpoints
are written to <output_dir>/checkpoints/ckpt_step=NNNNNN.msgpack and contain
the step, parameters, optimizer state, and metric history, so the checkpoint
sweep (tempo_tpu.infer.sweep) can enumerate them by the same glob pattern
the reference analysis uses (ckpt_step=*).

flax.serialization msgpack keeps each checkpoint a single portable file; the
state is pulled to host as numpy before serialization.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import numpy as np
from flax import serialization

from tempo_tpu.train.state import TrainState

CKPT_PREFIX = "ckpt_step="
CKPT_SUFFIX = ".msgpack"


def checkpoint_path(ckpt_dir: Union[str, Path], step: int) -> Path:
    return Path(ckpt_dir) / f"{CKPT_PREFIX}{step:06d}{CKPT_SUFFIX}"


def _host_payload(state: TrainState,
                  train_metrics: Optional[List[Dict]],
                  val_metrics: Optional[List[Dict]]) -> Dict[str, Any]:
    """Device->host snapshot of everything a checkpoint stores. Must run
    BEFORE the next train step is dispatched: the step donates the state
    buffers, so device arrays referenced here are invalidated by the next
    dispatch — the returned payload holds fresh host numpy only."""
    host_state = jax.device_get(state)
    return {
        "step": int(host_state.step),
        # to_state_dict flattens tuple-based pytrees (optax states) into
        # nested dicts that msgpack can encode.
        "params": serialization.to_state_dict(host_state.params),
        "opt_state": serialization.to_state_dict(host_state.opt_state),
        "rng": np.asarray(host_state.rng),
        "ema": {k: float(v) for k, v in (host_state.ema or {}).items()},
        "train_metrics": json.dumps(train_metrics or []),
        "val_metrics": json.dumps(val_metrics or []),
    }


def _write_payload(ckpt_dir: Path, payload: Dict[str, Any]) -> Path:
    path = checkpoint_path(ckpt_dir, payload["step"])
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(serialization.msgpack_serialize(payload))
    tmp.replace(path)  # atomic: no torn checkpoints on preemption
    return path


def save_checkpoint(ckpt_dir: Union[str, Path], state: TrainState,
                    train_metrics: Optional[List[Dict]] = None,
                    val_metrics: Optional[List[Dict]] = None) -> Path:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    return _write_payload(ckpt_dir,
                          _host_payload(state, train_metrics, val_metrics))


class AsyncCheckpointer:
    """Checkpoint writes that overlap with training.

    `save()` takes the device->host snapshot synchronously (required: the
    jitted step donates the state buffers, so the snapshot must complete
    before the next step dispatch) and hands msgpack serialization + the
    atomic tmp+rename write to a single background worker — at flagship
    scale the serialize+write is the dominant cost on this 1-core host,
    and it needs nothing from the device. One write in flight at a time:
    a new save first joins the previous one, and any failure re-raises on
    the NEXT save()/wait() so disk errors cannot pass silently (matching
    the fail-loud policy of the sync path). Call `wait()` after the train
    loop (the trainer does) before reading the final checkpoint back.

    The reference has no analogue (its torch.save blocks the step loop,
    src/train_utils.py:122-147); artifact layout is identical to
    save_checkpoint, so sweeps/resume see no difference.
    """

    def __init__(self):
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer")
        self._pending: Optional["concurrent.futures.Future"] = None

    def wait(self) -> Optional[Path]:
        """Join the in-flight write; re-raises its exception, if any."""
        if self._pending is None:
            return None
        fut, self._pending = self._pending, None
        return fut.result()

    def save(self, ckpt_dir: Union[str, Path], state: TrainState,
             train_metrics: Optional[List[Dict]] = None,
             val_metrics: Optional[List[Dict]] = None) -> Path:
        self.wait()  # one in flight; surfaces the previous write's error
        ckpt_dir = Path(ckpt_dir)
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        payload = _host_payload(state, train_metrics, val_metrics)
        path = checkpoint_path(ckpt_dir, payload["step"])
        self._pending = self._pool.submit(_write_payload, ckpt_dir, payload)
        return path

    def close(self) -> None:
        self.wait()
        self._pool.shutdown(wait=True)


def load_checkpoint(path: Union[str, Path], state_template: TrainState
                    ) -> Tuple[TrainState, List[Dict], List[Dict]]:
    """Restore a TrainState shaped like `state_template` from `path`.

    Dispatches on format: sharded checkpoint directories restore through
    the streaming path (no full-leaf host materialization); single-file
    msgpack snapshots restore here."""
    if Path(path).is_dir():
        from tempo_tpu.train.sharded_checkpoint import load_checkpoint_sharded

        return load_checkpoint_sharded(path, state_template)
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    params = serialization.from_state_dict(state_template.params, raw["params"])
    opt_state = serialization.from_state_dict(state_template.opt_state,
                                              raw["opt_state"])
    rng = np.asarray(raw["rng"]).astype(state_template.rng.dtype)
    ema_raw = raw.get("ema") or {}
    ema = ({k: np.float32(v) for k, v in ema_raw.items()}
           if ema_raw else state_template.ema)
    state = state_template.replace(
        step=np.asarray(raw["step"], dtype=np.int32),
        params=params,
        opt_state=opt_state,
        rng=rng,
        ema=ema,
    )
    train_metrics = json.loads(raw.get("train_metrics", "[]"))
    val_metrics = json.loads(raw.get("val_metrics", "[]"))
    return state, train_metrics, val_metrics


def place_like(state: Any, template: Any) -> Any:
    """Device-place a host-restored state with the TEMPLATE's shardings.

    A resumed run must come back with the same mesh placement it trains
    with — replicated for data parallelism, channel-sharded for tensor
    parallelism (parallel/tensor.py). A bare jax.device_put would commit
    everything to one device and silently degrade a multi-chip run after
    resume. On multi-process meshes the host copy is assembled into the
    global array the same way shard_state does."""
    multiprocess = jax.process_count() > 1
    # match leaves by path, not structure: the template may lack subtrees
    # the checkpoint carries (e.g. ema=None before the first step) — those
    # fall back to replication over the mesh recovered from sibling leaves
    template_leaves = {
        jax.tree_util.keystr(kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(template)[0]}

    # Fallback sharding for leaves the template doesn't carry: replicate
    # over the SAME mesh the template's sharded leaves live on. A bare
    # device_put would commit the leaf to one device (exactly the silent
    # degradation this function exists to prevent) and produce a non-global
    # array that fails inside the jitted step on multi-process meshes.
    fallback_sharding = None
    for leaf in template_leaves.values():
        sh = getattr(leaf, "sharding", None)
        mesh = getattr(sh, "mesh", None)
        if mesh is not None and getattr(mesh, "empty", False) is False:
            from jax.sharding import NamedSharding, PartitionSpec

            fallback_sharding = NamedSharding(mesh, PartitionSpec())
            break

    def _place(new, sharding):
        # already a device array with the target sharding (e.g. restored
        # through the sharded-checkpoint path): nothing to do — and on
        # multi-process meshes np.asarray on it would fail anyway
        if isinstance(new, jax.Array) and getattr(new, "sharding", None) == sharding:
            return new
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(new))
        return jax.device_put(new, sharding)

    def _one(kp, new):
        old = template_leaves.get(jax.tree_util.keystr(kp))
        sharding = getattr(old, "sharding", None)
        if sharding is None:
            if fallback_sharding is None:
                return jax.device_put(new)
            return _place(new, fallback_sharding)
        return _place(new, sharding)

    return jax.tree_util.tree_map_with_path(_one, state)


def load_params(path: Union[str, Path], params_template: Any) -> Any:
    """Restore only the model parameters (for inference/analysis).

    Accepts native msgpack checkpoints AND reference torch .pt checkpoints
    (base or L2-supervised), converted on the fly through the interop layer
    with the architecture inferred from the template — every analysis and
    serving CLI therefore consumes trained reference models directly."""
    path = Path(path)
    if path.suffix == ".pt":
        from tempo_tpu.interop.torch_ckpt import params_for_template

        return params_for_template(path, params_template)
    if path.is_dir():
        # sharded checkpoint directory: read only the params leaves from
        # the per-leaf .npy files (analysis needs no optimizer state)
        from tempo_tpu.train.sharded_checkpoint import load_params_sharded

        return load_params_sharded(path, params_template)
    raw = serialization.msgpack_restore(path.read_bytes())
    return serialization.from_state_dict(params_template, raw["params"])


def list_checkpoints(ckpt_dir: Union[str, Path]) -> List[Path]:
    """Every checkpoint in a directory: single-file msgpack snapshots AND
    sharded checkpoint directories (train/sharded_checkpoint.py), sorted by
    step — the same `ckpt_step=*` enumeration contract the reference
    analysis scripts rely on (src/scripts/evaluate_reconstruction.py:145)."""
    from tempo_tpu.train.sharded_checkpoint import (
        SHARDED_SUFFIX,
        is_sharded_checkpoint,
    )

    ckpt_dir = Path(ckpt_dir)
    files = list(ckpt_dir.glob(f"{CKPT_PREFIX}*{CKPT_SUFFIX}"))
    dirs = [p for p in ckpt_dir.glob(f"{CKPT_PREFIX}*{SHARDED_SUFFIX}")
            if is_sharded_checkpoint(p)]
    return sorted(files + dirs, key=checkpoint_step)


def latest_checkpoint(ckpt_dir: Union[str, Path]) -> Optional[Path]:
    """Highest-step checkpoint in a directory, or None — the preemption
    auto-resume hook (`training.resume_from: auto`)."""
    ckpts = list_checkpoints(ckpt_dir)
    return ckpts[-1] if ckpts else None


def wants_auto_resume(train_cfg: dict) -> bool:
    """True when `training.resume_from: auto` — the sentinel the CLIs use
    to allow re-entering an existing output dir (init_directory
    allow_existing). Kept beside resolve_resume_from so the detection and
    the resolution halves of the contract can't drift apart."""
    return train_cfg.get("resume_from") == "auto"


def resolve_resume_from(train_cfg: dict,
                        output_dir: Union[str, Path]) -> Optional[Path]:
    """The CLIs' shared `training.resume_from` contract: an explicit path
    is returned as-is; 'auto' resolves to the run's own latest checkpoint
    (None + a notice when there is none yet — fresh start)."""
    resume_from = train_cfg.get("resume_from")
    if resume_from == "auto":
        resume_from = latest_checkpoint(Path(output_dir) / "checkpoints")
        if resume_from is None:
            print("\nresume_from: auto — no checkpoint found, starting fresh")
    return resume_from


def checkpoint_step(path: Union[str, Path]) -> int:
    """Parse the step out of ckpt_step=NNNNNN.<ext> for any extension
    (native .msgpack and reference .pt checkpoints alike)."""
    stem = Path(path).stem
    return int(stem[len(CKPT_PREFIX):])

"""Step-based trainer: the host-side loop around the fused jitted step.

Behavioral parity with the reference Trainer (src/train_utils.py:66-301):
infinite-loader step loop, EMA(0.99) running metrics appended every
log_every, validation over n_val_batches every val_every, live summary plots
every plot_every, checkpoints + reconstruction figures every save_every, and
metrics.json at the end. TPU-first differences: the train step is one
compiled function (grad+clip+AdamW fused, state donated), batches are placed
on the mesh asynchronously, pixel_mse reuses the step's own reconstruction
instead of a second forward pass, and wall-clock/throughput are tracked
per-step (the reference has no profiling at all — SURVEY.md SS5.1).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Union

import jax
import numpy as np

from tempo_tpu.train import checkpoint as ckpt_lib
from tempo_tpu.train.metrics import save_metrics
from tempo_tpu.train.plots import (
    plot_per_product_losses,
    save_reconstruction_figure,
    update_summary_plots,
)
from tempo_tpu.train.state import TrainState
from tempo_tpu.train.step import LossFn, init_ema, make_eval_step, make_train_step


def _batch_size(batch) -> int:
    if isinstance(batch, dict):
        return next(iter(batch.values())).shape[0]
    return batch.shape[0]


class Trainer:
    def __init__(
        self,
        loss_fn: LossFn,
        tx,
        state: TrainState,
        output_dir: Union[str, Path],
        save_every: int = 1000,
        val_every: int = 100,
        log_every: int = 10,
        plot_every: int = 50,
        n_val_batches: int = 10,
        place_fn: Optional[Callable[[Any], Any]] = None,
        recon_fn: Optional[Callable[[Any, Any, jax.Array], Any]] = None,
        l2_products: Optional[Sequence[str]] = None,
        verbose: bool = True,
        profile_steps: Optional[tuple] = None,  # (start, end) step window
        save_steps: Optional[Sequence[int]] = None,  # explicit schedule
        checkpoint_format: str = "msgpack",  # 'sharded' (no host gather)
        #   or 'async' (msgpack artifacts, write overlaps training)
        metric_sinks: Optional[Sequence[Callable]] = None,
        grad_accum: int = 1,  # microbatches per optimizer update (step.py)
    ):
        self.tx = tx
        self.state = state
        self.output_dir = Path(output_dir)
        self.save_every = save_every
        self.val_every = val_every
        self.log_every = log_every
        self.plot_every = plot_every
        self.n_val_batches = n_val_batches
        self.place_fn = place_fn or jax.device_put
        self.recon_fn = recon_fn
        self._local_recon_jit = None  # lazy; multiprocess figure path
        self.l2_products = list(l2_products) if l2_products else None
        self.verbose = verbose
        self.profile_steps = profile_steps
        self.save_steps = set(save_steps) if save_steps is not None else None
        if checkpoint_format not in ("msgpack", "sharded", "async"):
            raise ValueError(
                f"FATAL: checkpoint_format must be 'msgpack', 'sharded' or "
                f"'async', got {checkpoint_format!r}")
        self.checkpoint_format = checkpoint_format
        # 'async': identical msgpack artifacts, but serialization + disk
        # write overlap the next train steps (checkpoint.AsyncCheckpointer)
        self._async_ckpt = (ckpt_lib.AsyncCheckpointer()
                            if checkpoint_format == "async" else None)
        # Pluggable metric sinks (the reference's latent wandb capability,
        # src/mltools/ml_utils.py:30-31): each is called as
        # sink(step, metrics_dict, kind) with kind in {'train','val'}.
        self.metric_sinks = list(metric_sinks or [])

        # Multi-host: every process runs the step loop (multi-controller
        # SPMD), but only process 0 writes artifacts.
        self.is_primary = jax.process_index() == 0
        self.multiprocess = jax.process_count() > 1

        self.ckpt_dir = self.output_dir / "checkpoints"
        self.summary_dir = self.output_dir / "summary"
        self.figures_dir = self.output_dir / "figures"
        if self.is_primary:
            for d in (self.ckpt_dir, self.summary_dir, self.figures_dir):
                d.mkdir(parents=True, exist_ok=True)

        self.loss_fn = loss_fn
        self.train_step = make_train_step(loss_fn, tx, grad_accum=grad_accum)
        self.eval_step = make_eval_step(loss_fn)
        self.eval_rng = jax.random.PRNGKey(0)

        self.train_metrics: List[Dict] = []
        self.val_metrics: List[Dict] = []
        self.step = int(self.state.step)

    # ------------------------------------------------------------------ io

    def save_checkpoint(self) -> Optional[Path]:
        if self.checkpoint_format == "sharded":
            # cooperative save: EVERY process writes the shards it owns
            # (never assembling a full leaf on any host) — required for
            # tensor-parallel states wider than one host's memory
            from tempo_tpu.train.sharded_checkpoint import save_checkpoint_sharded

            path = save_checkpoint_sharded(self.ckpt_dir, self.state,
                                           self.train_metrics,
                                           self.val_metrics)
            if self.verbose and self.is_primary:
                print(f"Saved checkpoint: {path}")
            return path
        if not self.is_primary:
            return None  # state is replicated; process 0's copy suffices
        if self._async_ckpt is not None:
            path = self._async_ckpt.save(self.ckpt_dir, self.state,
                                         self.train_metrics,
                                         self.val_metrics)
        else:
            path = ckpt_lib.save_checkpoint(self.ckpt_dir, self.state,
                                            self.train_metrics,
                                            self.val_metrics)
        if self.verbose:
            print(f"Saved checkpoint: {path}")
        return path

    def load_checkpoint(self, path: Union[str, Path]) -> None:
        if self._async_ckpt is not None:
            self._async_ckpt.wait()  # never read a half-written file
        template = self.state
        self.state, self.train_metrics, self.val_metrics = ckpt_lib.load_checkpoint(
            path, template)
        # keep the live state's mesh placement (replicated DP / channel-
        # sharded TP) — a bare device_put would demote to one device
        self.state = ckpt_lib.place_like(self.state, template)
        self.step = int(self.state.step)
        if self.verbose:
            print(f"Loaded checkpoint from step {self.step}")

    # ------------------------------------------------------------ validate

    def validate(self, val_iter: Iterator) -> Dict[str, float]:
        # Sample-weighted sums accumulate ON DEVICE (async dispatches); the
        # single host sync is the one device_get after the loop — on a
        # high-dispatch-latency transport a per-batch fetch would serialize
        # the whole validation pass.
        totals = None
        n_samples = 0
        for i, batch in enumerate(val_iter):
            if i >= self.n_val_batches:
                break
            bsz = _batch_size(batch)
            batch = self.place_fn(batch)
            rng = jax.random.fold_in(self.eval_rng, i)
            metrics = self.eval_step(self.state.params, batch, rng)
            weighted = jax.tree_util.tree_map(lambda v: v * float(bsz), metrics)
            totals = weighted if totals is None else jax.tree_util.tree_map(
                lambda a, b: a + b, totals, weighted)
            n_samples += bsz
        if n_samples == 0:
            return {}
        totals = jax.device_get(totals)
        return {f"val_{k}": float(v) / n_samples for k, v in totals.items()}

    # -------------------------------------------------------------- figures

    def _host_local(self, x, n: int = 8) -> Optional[np.ndarray]:
        """First n samples of a batch as host numpy on THIS process. Global
        (non-addressable) arrays are assembled from local replica-0 shards
        only — no collectives, so process 0 can call this alone."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            shards = [s for s in x.addressable_shards if s.replica_id == 0]
            if not shards:
                return None
            order = sorted(shards, key=lambda s: (s.index[0].start or 0))
            return np.concatenate(
                [np.asarray(s.data) for s in order], axis=0)[:n]
        return np.asarray(jax.device_get(x))[:n]

    def _local_params(self):
        """Host copy of the params from local shards, or None when the
        params are genuinely sharded (each local shard is a slice) — then
        no single process can render figures and offline analysis applies."""
        leaves = []
        for leaf in jax.tree_util.tree_leaves(self.state.params):
            if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
                shards = ([s for s in leaf.addressable_shards
                           if s.replica_id == 0]
                          or list(leaf.addressable_shards))
                data = shards[0].data
                if data.shape != leaf.shape:
                    return None  # tensor-parallel slice, not a replica
                leaves.append(np.asarray(data))
            else:
                leaves.append(leaf)
        treedef = jax.tree_util.tree_structure(self.state.params)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def _save_recon_figure(self, batch) -> None:
        # Pod runs included: process 0 renders from its LOCAL batch shard
        # and its local (replicated) param copy — reference artifact parity
        # (per-checkpoint figures, src/train_utils.py:317-387) without any
        # cross-process collectives.
        if self.recon_fn is None or not self.is_primary:
            return
        x_full = batch["spectral"] if isinstance(batch, dict) else batch
        x = self._host_local(x_full, 8)
        if x is None:
            return
        rng = jax.random.fold_in(self.eval_rng, self.step)
        if self.multiprocess:
            params = self._local_params()
            if params is None:
                return  # figures come from offline analysis for TP pods
            # local jit: runs on this process's devices only. Built once —
            # a fresh jax.jit wrapper per figure would recompile every
            # plot interval (jit caches are per-wrapper).
            if self._local_recon_jit is None:
                self._local_recon_jit = jax.jit(self.recon_fn)
            out = self._local_recon_jit(params, x, rng)
        else:
            out = self.recon_fn(self.state.params, self.place_fn(x), rng)
        if isinstance(out, dict):
            recon = np.asarray(jax.device_get(out["reconstruction"]))
            l2_preds = {p: np.asarray(jax.device_get(v))
                        for p, v in out.get("l2_predictions", {}).items()}
            l2_targets = None
            if isinstance(batch, dict) and self.l2_products:
                from tempo_tpu.models.vae_l2 import avg_pool_4x_nan
                l2_targets = {}
                for p in self.l2_products:
                    if p not in batch:
                        continue
                    local = self._host_local(batch[p], 8)
                    if local is None:
                        continue
                    l2_targets[p] = np.asarray(
                        avg_pool_4x_nan(local.astype(np.float32)))
            save_reconstruction_figure(self.figures_dir, self.step, x, recon,
                                       l2_targets=l2_targets, l2_preds=l2_preds)
        else:
            recon = np.asarray(jax.device_get(out))
            save_reconstruction_figure(self.figures_dir, self.step, x, recon)

    # ----------------------------------------------------------------- loop

    def train(self, train_iter: Iterator, val_iter_factory=None,
              n_steps: int = 10000) -> Dict[str, float]:
        """val_iter_factory: zero-arg callable returning a fresh val iterator
        (or None). Returns final throughput stats."""
        t_start = time.perf_counter()
        samples_done = 0
        last_batch = None

        while self.step < n_steps:
            batch = next(train_iter)
            bsz = _batch_size(batch)
            device_batch = self.place_fn(batch)
            last_batch = batch

            if self.state.ema is None:
                # Discover the metric names by abstract evaluation (no
                # device work) and attach the on-device EMA slot.
                rng = jax.random.PRNGKey(0)
                _, metrics_shape = jax.eval_shape(
                    self.loss_fn, self.state.params, device_batch, rng)
                keys = list(metrics_shape.keys()) + ["grad_norm"]
                self.state = init_ema(self.state, keys)

            if self.profile_steps and self.step == self.profile_steps[0]:
                jax.profiler.start_trace(str(self.output_dir / "profile"))

            # Steps are dispatched without any host sync; the device queue
            # throttles the loop. The only periodic sync is the EMA fetch
            # every log_every steps.
            self.state, _ = self.train_step(self.state, device_batch)
            self.step += 1
            samples_done += bsz

            if self.profile_steps and self.step == self.profile_steps[1]:
                jax.device_get(self.state.ema)  # flush queue before stopping
                jax.profiler.stop_trace()
                if self.verbose:
                    print(f"Saved profiler trace to "
                          f"{self.output_dir / 'profile'}")

            if self.step % self.log_every == 0:
                self._log_ema()

            if (self.step % self.plot_every == 0 and self.step > 0
                    and self.is_primary):
                update_summary_plots(self.summary_dir, self.train_metrics,
                                     self.val_metrics)
                if self.l2_products:
                    plot_per_product_losses(self.summary_dir,
                                            self.train_metrics,
                                            self.l2_products)

            if val_iter_factory is not None and self.step % self.val_every == 0:
                vm = self.validate(val_iter_factory())
                if vm:
                    self.val_metrics.append({"step": self.step, **vm})
                    self._emit(self.step, vm, "val")
                    if self.verbose:
                        msg = ", ".join(f"{k}={v:.4f}" for k, v in vm.items())
                        print(f"Step {self.step}: {msg}")

            should_save = (self.step in self.save_steps
                           if self.save_steps is not None
                           else self.step % self.save_every == 0)
            if should_save or self.step == n_steps:
                self.save_checkpoint()
                self._save_recon_figure(last_batch)

        elapsed = time.perf_counter() - t_start
        if self._async_ckpt is not None:
            # join the final in-flight write (and surface its error) before
            # reporting completion — resume/sweep may read it immediately
            self._async_ckpt.wait()
        # the loop always checkpoints at n_steps; nothing left to flush here
        if self.is_primary:
            save_metrics(self.output_dir, self.train_metrics, self.val_metrics)
        stats = {
            "elapsed_s": elapsed,
            "steps": self.step,
            "samples": samples_done,
            "samples_per_sec": samples_done / max(elapsed, 1e-9),
        }
        if self.verbose:
            print(f"Training complete: {stats}")
        return stats

    def _log_ema(self) -> None:
        ema = {k: float(v) for k, v in jax.device_get(self.state.ema).items()}
        self.train_metrics.append({"step": self.step, **ema})
        self._emit(self.step, ema, "train")

    def _emit(self, step: int, metrics: Dict[str, float], kind: str) -> None:
        for sink in self.metric_sinks:
            sink(step, metrics, kind)

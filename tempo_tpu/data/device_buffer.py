"""Device-resident shuffle buffer: the TPU-native redesign of the
reference's host RandomBuffer (reference: src/tempo_data.py:13-106; the
L2 dict-batch variant mirrors src/tempo_data_with_l2.py:35-176).

Motivation: a flagship batch (64 tiles x 16.8 MB) is ~1 GB of input per
~200 ms step — far beyond what a 1-core host can re-copy per step. Instead
of assembling batches on the host, whole tile shards live in HBM as a
[slots, tiles, H, W, C] pool; each batch is a device-side gather of random
(slot, tile) pairs (one jitted take per step, HBM-bandwidth cheap), and a
background host thread streams a replacement shard into the
least-recently-refreshed slot every `swap_every` batches. Host traffic drops
from ~5 GB/s to shard_bytes/swap_interval (tens of MB/s).

With `l2_products`, the pool is a pytree {spectral: [S,T,H,W,C],
<PRODUCT>: [S,T,H,W]} and each gather yields the dict batches the
L2-supervised trainer consumes — the same device-side fast path as the base
VAE (the reference streams L2 dicts through DataLoader worker processes).

Sampling semantics: uniform-with-replacement over the resident pool, with
the pool refreshed from uniformly random files — the same stationary tile
distribution as the reference's pop-without-replacement buffer (documented
stochastic equivalence; SURVEY.md SS7 'match in distribution').

Reproducibility: with a fixed `seed`, both the gather-index stream and the
shard-swap schedule derive from seeded generators, and swaps are applied at
deterministic batch boundaries (the pending transfer is joined at the next
swap interval rather than applied whenever IO happens to finish) — so the
same seed yields an identical batch stream across runs. With seed=None the
swap application stays opportunistic (never blocks the step loop).

Measured (v5e, flagship 1028-ch model, batch 64, f16 shards on disk):
host-loader end-to-end 0.8 patches/s (input-transfer bound) vs device-buffer
292 patches/s — 96% of the 303 patches/s compute-only step rate, with disk
reads and host->device shard transfers fully overlapped on a background
thread.
"""

from __future__ import annotations

import functools
import threading
from pathlib import Path
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from tempo_tpu.data.loader import _find_shards
from tempo_tpu.data.tiles import find_l2_shard, load_tile_shard


class DeviceTileBuffer:
    """Infinite batched stream of tiles gathered on-device.

    Yields [B, H, W, C] device arrays, or {'spectral': [B,H,W,C],
    '<PRODUCT>': [B,H,W]} dicts when l2_products is given (compute-ready,
    no host copy on the batch path)."""

    def __init__(
        self,
        data_dir: Union[str, Path],
        batch_size: int = 64,
        slots: int = 4,
        swap_every: int = 16,
        seed: Optional[int] = None,
        dtype: str = "float32",
        device: Optional[jax.Device] = None,
        mesh=None,
        l2_products: Optional[Sequence[str]] = None,
        partition: str = "replicate",
    ):
        """With a mesh, the pool is replicated and each gathered batch is
        sharded on its leading axis over the mesh's 'data' axis (each chip
        materializes only its local batch slice), so the device buffer also
        feeds data-parallel training.

        partition (multi-process meshes only):
        - 'replicate' (default): every process loads identical pools from
          the same seeded stream and issues identical global gather
          indices. Simple, but aggregate shuffle-buffer capacity does not
          grow with hosts and every host re-reads the same files.
        - 'process': the input path SCALES with hosts — each process owns a
          disjoint slice of the shard files (files[rank::nproc]), keeps an
          independent pool on its LOCAL devices, gathers its local share of
          the batch there, and the global [B, ...] batch is assembled from
          the local per-device pieces with zero cross-process traffic
          (jax.make_array_from_single_device_arrays). Aggregate pool
          capacity and disk bandwidth grow linearly with process count.
        """
        self.data_dir = Path(data_dir)
        self.files = _find_shards(data_dir)
        self.batch_size = batch_size
        if partition not in ("replicate", "process"):
            raise ValueError(
                f"FATAL: partition must be 'replicate' or 'process', "
                f"got {partition!r}")
        self.partition = partition
        self.slots = slots
        self.swap_every = swap_every
        self.dtype = jnp.dtype(dtype)
        self.l2_products = list(l2_products) if l2_products else None
        if self.l2_products:
            self.l2_dirs = {}
            for product in self.l2_products:
                l2_dir = self.data_dir / f"l2_{product}"
                if not l2_dir.exists():
                    raise FileNotFoundError(
                        f"FATAL: L2 directory not found: {l2_dir}")
                self.l2_dirs[product] = l2_dir
        # Independent streams for batch-index sampling and the swap
        # schedule, both derived from the one seed, so the pool evolution
        # cannot perturb the gather-index stream (and vice versa).
        self._rng = np.random.default_rng(seed)
        self._swap_rng = np.random.default_rng(
            None if seed is None else seed + 7919)
        self._deterministic = seed is not None
        self._device = device
        self._mesh = mesh
        self._multiprocess = False
        self._process_partitioned = False
        if mesh is not None:
            from tempo_tpu.parallel.mesh import batch_sharding, replicate_sharding

            self._batch_sharding = batch_sharding(mesh)  # gather output
            self._multiprocess = len(
                {d.process_index for d in mesh.devices.flat}) > 1
            if self._multiprocess and seed is None:
                raise ValueError(
                    "FATAL: DeviceTileBuffer on a multi-process mesh needs a "
                    "seed — the pool/gather streams must be reproducibly "
                    "coordinated across processes")
            if self._multiprocess and partition == "process":
                self._process_partitioned = True
                if dict(zip(mesh.axis_names, mesh.devices.shape)).get(
                        "model", 1) > 1:
                    raise ValueError(
                        "FATAL: data.partition: process assumes a pure "
                        "data-parallel mesh; with parallel.tensor > 1 the "
                        "local-gather relabeling would shard what must be "
                        "replicated along 'model' — use partition: "
                        "replicate for tensor-parallel runs")
                rank, nproc = jax.process_index(), jax.process_count()
                if len(self.files) < nproc:
                    raise ValueError(
                        f"FATAL: {len(self.files)} shard files cannot be "
                        f"partitioned over {nproc} processes")
                # disjoint per-host file ownership; independent streams
                self.files = self.files[rank::nproc]
                self._rng = np.random.default_rng(seed + 1_000_003 * rank)
                self._swap_rng = np.random.default_rng(
                    seed + 7919 + 1_000_003 * rank)
                n_local, n_global = (jax.local_device_count(),
                                     len(mesh.devices.flat))
                if batch_size % n_global:
                    raise ValueError(
                        f"FATAL: global batch {batch_size} must divide "
                        f"evenly over {n_global} devices")
                self._local_batch = batch_size * n_local // n_global
                # pool lives on LOCAL devices only; the local gather shards
                # over them, and its per-device pieces are re-labelled as
                # this process's shards of the global batch
                from jax.sharding import Mesh, NamedSharding, PartitionSpec

                local_mesh = Mesh(np.asarray(jax.local_devices()), ("data",))
                self._sharding = NamedSharding(local_mesh, PartitionSpec())
                self._local_batch_sharding = NamedSharding(
                    local_mesh, PartitionSpec("data"))
            else:
                self._sharding = replicate_sharding(mesh)  # pool: replicated
        else:
            self._sharding = None
            self._batch_sharding = None
        self._batches_since_swap = 0
        self._next_slot = 0
        self._pending: Optional[tuple] = None  # (slot, thread, result holder)

        first = self._load(int(self._swap_rng.integers(0, len(self.files))))
        spectral0 = first["spectral"] if isinstance(first, dict) else first
        self.tiles_per_shard = spectral0.shape[0]
        shards = [first]
        for _ in range(slots - 1):
            shards.append(self._load(
                int(self._swap_rng.integers(0, len(self.files)))))
        pool = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *shards)
        self._pool = self._put(pool)  # leaves: [S, T, ...]

        if self._process_partitioned:
            gather_jit = functools.partial(
                jax.jit, out_shardings=self._local_batch_sharding)
        elif self._batch_sharding is not None:
            gather_jit = functools.partial(
                jax.jit, out_shardings=self._batch_sharding)
        else:
            gather_jit = jax.jit

        @gather_jit
        def gather(pool, slot_idx, tile_idx):
            return jax.tree_util.tree_map(
                lambda a: a[slot_idx, tile_idx], pool)

        # donate the pool: the update happens in place instead of holding
        # two multi-GB copies in HBM
        @functools.partial(jax.jit, donate_argnums=(0,))
        def replace_slot(pool, slot, shard):
            return jax.tree_util.tree_map(
                lambda p, s: jax.lax.dynamic_update_index_in_dim(p, s, slot, 0),
                pool, shard)

        self._gather = gather
        self._replace = replace_slot

    # ------------------------------------------------------------ internals

    def _load(self, file_idx: int):
        """Load one shard (with matching L2 shards when configured) as the
        pool-item pytree."""
        spectral_path = self.files[file_idx]
        shard = load_tile_shard(spectral_path, mmap=True)
        if shard.ndim == 3:
            shard = shard[None]
        spectral = np.asarray(shard, dtype=self.dtype)
        if self.l2_products is None:
            return spectral
        item = {"spectral": spectral}
        name = Path(spectral_path).name
        for product in self.l2_products:
            l2 = load_tile_shard(find_l2_shard(self.l2_dirs[product], name),
                                 mmap=True)
            if l2.ndim == 2:
                l2 = l2[None]
            item[product] = np.asarray(l2, dtype=self.dtype)
        return item

    def _globalize(self, local_tree):
        """Re-label a locally-gathered batch (sharded over this process's
        devices) as this process's addressable piece of the GLOBAL batch
        array — no data movement, no cross-process traffic."""

        def _one(local):
            shards = sorted(local.addressable_shards,
                            key=lambda s: (s.index[0].start or 0))
            global_shape = (self.batch_size,) + local.shape[1:]
            return jax.make_array_from_single_device_arrays(
                global_shape, self._batch_sharding,
                [s.data for s in shards])

        return jax.tree_util.tree_map(_one, local_tree)

    def _put(self, tree):
        if self._process_partitioned:
            # the pool is process-local: replicate over LOCAL devices only
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(jnp.asarray(a), self._sharding),
                tree)
        if self._sharding is not None:
            if self._multiprocess:
                # replicated global array assembled from each process's
                # identical local copy (same seed -> same shard loads)
                return jax.tree_util.tree_map(
                    lambda a: jax.make_array_from_process_local_data(
                        self._sharding, np.asarray(a)), tree)
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(jnp.asarray(a), self._sharding), tree)
        if self._device is not None:
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(jnp.asarray(a), self._device), tree)
        return jax.tree_util.tree_map(jnp.asarray, tree)

    def _start_swap(self) -> None:
        slot = self._next_slot
        self._next_slot = (self._next_slot + 1) % self.slots
        # Draw the replacement file on the main thread from the seeded swap
        # stream — the background thread only does IO, never RNG.
        file_idx = int(self._swap_rng.integers(0, len(self.files)))
        holder: dict = {}

        def work():
            # Disk read AND host->device transfer both happen off the step
            # loop; only the cheap on-device slot update runs on the main
            # thread. jax device transfers are thread-safe.
            shard_dev = self._put(self._load(file_idx))
            jax.block_until_ready(shard_dev)
            holder["shard"] = shard_dev

        thread = threading.Thread(target=work, daemon=True)
        thread.start()
        self._pending = (slot, thread, holder)

    def _finish_swap_if_ready(self, block: bool = False) -> None:
        if self._pending is None:
            return
        slot, thread, holder = self._pending
        if thread.is_alive():
            if not block:
                return  # transfer still in flight; never stall the step loop
            thread.join()
        shard = holder.get("shard")
        if shard is not None:
            self._pool = self._replace(self._pool, slot, shard)
        self._pending = None

    # ------------------------------------------------------------ interface

    def __iter__(self):
        return self

    def __next__(self):
        self._batches_since_swap += 1
        if self._batches_since_swap >= self.swap_every:
            self._batches_since_swap = 0
            # Seeded mode: the pending shard (started one full interval ago,
            # plenty of IO overlap) is joined and applied exactly here, so
            # the pool content at every batch index is a pure function of
            # the seed.
            self._finish_swap_if_ready(block=self._deterministic)
            if self._pending is None:
                self._start_swap()
        elif not self._deterministic:
            self._finish_swap_if_ready()

        n = (self._local_batch if self._process_partitioned
             else self.batch_size)
        slot_idx = jnp.asarray(self._rng.integers(
            0, self.slots, size=n), jnp.int32)
        tile_idx = jnp.asarray(self._rng.integers(
            0, self.tiles_per_shard, size=n), jnp.int32)
        batch = self._gather(self._pool, slot_idx, tile_idx)
        if self._process_partitioned:
            return self._globalize(batch)
        return batch

    def close(self) -> None:
        if self._pending is not None:
            self._pending[1].join(timeout=5)
            self._pending = None

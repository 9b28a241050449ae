"""Worker process for the multi-host DCN test (launched by
tests/test_multihost.py, one subprocess per simulated host).

Each worker contributes 4 virtual CPU devices to a 2-process / 8-device
global mesh, then drives the REAL Trainer for a few data-parallel steps:
per-host local batches are assembled into global arrays, the fused train
step runs SPMD across both processes (gradient all-reduce over the
simulated DCN), and only process 0 writes artifacts.

Prints RESULT lines the test harness parses.
"""

import sys

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])

    from tempo_tpu.models.vae import AutoencoderKL, VAEConfig
    from tempo_tpu.parallel.mesh import (
        initialize_multihost,
        make_place_fn,
        shard_state,
    )
    from tempo_tpu.train.state import create_train_state, make_optimizer
    from tempo_tpu.train.step import vae_loss_fn
    from tempo_tpu.train.trainer import Trainer

    mesh = initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    print(f"RESULT pid={pid} local={jax.local_device_count()} "
          f"global={jax.device_count()}", flush=True)

    cfg = VAEConfig(shape=(8, 16, 16), chs=(12, 8, 8), z_channels=4,
                    embed_dim=4, n_attention_heads=2, norm_groups=4,
                    compute_dtype="float32")
    model = AutoencoderKL(cfg)
    x0 = jnp.zeros((8, 16, 16, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0,
                        rng=jax.random.PRNGKey(1))["params"]
    tx = make_optimizer(lr=1e-3)
    # host snapshot: later phases (FSDP/TP) rebuild fresh states from
    # it — the donated fused train step deletes the device buffers the
    # first phase's state aliases
    host_params = jax.device_get(params)
    state = shard_state(create_train_state(params, tx, jax.random.PRNGKey(2)),
                        mesh)

    def local_batches():
        # each host feeds its own shard stream (per-process seed offset);
        # global batch stays 8 on every process topology
        rng = np.random.default_rng(100 + pid)
        rows = 8 // nproc
        while True:
            yield rng.standard_normal((rows, 16, 16, 8)).astype(np.float32)

    def recon_fn(params, x, rng):
        return model.apply({"params": params}, x, rng=rng,
                           method=AutoencoderKL.reconstruct)

    trainer = Trainer(vae_loss_fn(model), tx, state, outdir,
                      save_every=2, val_every=1000, log_every=1,
                      plot_every=1000, place_fn=make_place_fn(mesh),
                      recon_fn=recon_fn,  # pod-run figures from local shards
                      verbose=False)
    trainer.train(local_batches(), None, n_steps=4)

    losses = [round(m["loss"], 4) for m in trainer.train_metrics]
    print(f"RESULT pid={pid} losses={losses}", flush=True)
    leaf_sum = sum(float(np.abs(np.asarray(jax.device_get(leaf))).sum())
                   for leaf in jax.tree_util.tree_leaves(trainer.state.params))
    print(f"RESULT pid={pid} leafsum={leaf_sum:.6f}", flush=True)

    # Cooperative sharded checkpoint across BOTH processes: each writes the
    # shards it owns into the shared files; restore streams per-device
    # slices back with the live state's shardings and must match bitwise.
    from tempo_tpu.train.sharded_checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    from pathlib import Path

    path = save_checkpoint_sharded(Path(outdir) / "checkpoints",
                                   trainer.state)
    restored, _, _ = load_checkpoint_sharded(path, trainer.state)
    match = all(
        bool(np.array_equal(np.asarray(a.addressable_shards[0].data),
                            np.asarray(b.addressable_shards[0].data)))
        for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                        jax.tree_util.tree_leaves(restored.params)))
    print(f"RESULT pid={pid} shardedmatch={match}", flush=True)

    # Process-partitioned device buffer: disjoint per-host shard files,
    # local pools, global batches assembled with no cross-process traffic;
    # the DP step over those batches must still reduce globally (identical
    # losses on both processes).
    from jax.experimental import multihost_utils

    from tempo_tpu.data.device_buffer import DeviceTileBuffer
    from tempo_tpu.data.synthetic import make_tile_shards

    shard_dir = Path(outdir) / "shards"
    if pid == 0:
        make_tile_shards(shard_dir, n_files=6, tiles_per_file=8, tile=16,
                         n_spectral=8, seed=5)
    multihost_utils.sync_global_devices("shards-ready")

    buf = DeviceTileBuffer(shard_dir, batch_size=8, slots=2, swap_every=4,
                           seed=21, mesh=mesh, partition="process")
    owned = sorted(Path(p).name for p in buf.files)
    print(f"RESULT pid={pid} owned={','.join(owned)}", flush=True)

    from tempo_tpu.train.step import make_train_step

    step = make_train_step(vae_loss_fn(model), tx)
    dstate = trainer.state
    buf_losses = []
    for _ in range(3):
        dstate, metrics = step(dstate, next(buf))
        buf_losses.append(round(float(metrics["loss"]), 4))
    print(f"RESULT pid={pid} buflosses={buf_losses}", flush=True)

    # ---- FSDP across the process boundary: the whole train state
    # sharded over the global 'data' axis; the jitted step's parameter
    # all-gathers and gradient reduce-scatters now cross DCN. The SAME
    # deterministic global batch is fed on every topology (each process
    # places its row slice), so the loss trajectory printed here is
    # pinned equal across 2-process and 1-process runs by the test. ----
    from tempo_tpu.parallel.fsdp import shard_state_fsdp

    nd = jax.device_count()
    local = jax.local_device_count()
    fstate = shard_state_fsdp(
        create_train_state(host_params, tx, jax.random.PRNGKey(2)), mesh)
    fplace = make_place_fn(mesh)
    grng = np.random.default_rng(7)
    flosses = []
    for _ in range(3):
        gbatch = grng.standard_normal((8, 16, 16, 8)).astype(np.float32)
        rows = 8 * local // nd
        lo = pid * rows
        fstate, metrics = step(fstate, fplace(gbatch[lo:lo + rows]))
        flosses.append(round(float(metrics["loss"]), 4))
    print(f"RESULT pid={pid} fsdplosses={flosses}", flush=True)

    # ---- dp x tp over the same global devices: channel-sharded params
    # on the fast 'model' axis, batch on 'data' — the 2D mesh the
    # reference never had, now pinned across process topologies too ----
    from tempo_tpu.parallel.tensor import create_tp_mesh, shard_state_tp

    tp_mesh = create_tp_mesh(2)
    tstate = shard_state_tp(
        create_train_state(host_params, tx, jax.random.PRNGKey(2)),
        tp_mesh)
    tplace = make_place_fn(tp_mesh)
    grng = np.random.default_rng(8)
    tlosses = []
    for _ in range(3):
        gbatch = grng.standard_normal((8, 16, 16, 8)).astype(np.float32)
        rows = 8 * local // nd
        lo = pid * rows
        tstate, metrics = step(tstate, tplace(gbatch[lo:lo + rows]))
        tlosses.append(round(float(metrics["loss"]), 4))
    print(f"RESULT pid={pid} tplosses={tlosses}", flush=True)


def main_restore() -> None:
    """Round B: a FRESH process topology restores round A's cooperative
    sharded checkpoint (written by `main`) and keeps training under
    FSDP — the cross-run, cross-process-boundary resume path."""
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    from pathlib import Path

    import numpy as np

    from tempo_tpu.models.vae import AutoencoderKL, VAEConfig
    from tempo_tpu.parallel.fsdp import shard_state_fsdp
    from tempo_tpu.parallel.mesh import initialize_multihost, make_place_fn, shard_state
    from tempo_tpu.train.sharded_checkpoint import load_checkpoint_sharded
    from tempo_tpu.train.state import create_train_state, make_optimizer
    from tempo_tpu.train.step import make_train_step, vae_loss_fn

    mesh = initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    cfg = VAEConfig(shape=(8, 16, 16), chs=(12, 8, 8), z_channels=4,
                    embed_dim=4, n_attention_heads=2, norm_groups=4,
                    compute_dtype="float32")
    model = AutoencoderKL(cfg)
    x0 = jnp.zeros((8, 16, 16, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0,
                        rng=jax.random.PRNGKey(1))["params"]
    tx = make_optimizer(lr=1e-3)
    template = shard_state(
        create_train_state(params, tx, jax.random.PRNGKey(2)), mesh)
    shards = sorted(Path(outdir, "checkpoints").glob("*.shards"))[-1]
    restored, _, _ = load_checkpoint_sharded(shards, template)
    leaf_sum = sum(float(np.abs(np.asarray(jax.device_get(leaf))).sum())
                   for leaf in jax.tree_util.tree_leaves(restored.params))
    print(f"RESULT pid={pid} restoredsum={leaf_sum:.6f}", flush=True)

    # keep training from the restored weights, FSDP-sharded
    fstate = shard_state_fsdp(jax.device_get(restored), mesh)
    step = make_train_step(vae_loss_fn(model), tx)
    place = make_place_fn(mesh)
    nd = jax.device_count()
    local = jax.local_device_count()
    grng = np.random.default_rng(9)
    losses = []
    for _ in range(2):
        gbatch = grng.standard_normal((8, 16, 16, 8)).astype(np.float32)
        rows = 8 * local // nd
        lo = pid * rows
        fstate, metrics = step(fstate, place(gbatch[lo:lo + rows]))
        losses.append(round(float(metrics["loss"]), 4))
    print(f"RESULT pid={pid} resumelosses={losses}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 5 and sys.argv[5] == "restore":
        main_restore()
    else:
        main()

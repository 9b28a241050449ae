"""Training tests: the fused step optimizes a tiny model, checkpoints
round-trip exactly, AdamW semantics match torch, and the trainer loop
produces the reference's artifact tree."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.models.vae import AutoencoderKL, VAEConfig
from tempo_tpu.train.checkpoint import (
    checkpoint_step,
    list_checkpoints,
    load_checkpoint,
    save_checkpoint,
)
from tempo_tpu.train.metrics import RunningMetrics
from tempo_tpu.train.state import create_train_state, make_optimizer
from tempo_tpu.train.step import make_train_step, vae_loss_fn
from tempo_tpu.train.trainer import Trainer

TINY = VAEConfig(shape=(8, 16, 16), chs=(12, 8, 8), z_channels=4,
                 embed_dim=4, n_attention_heads=2, norm_groups=4,
                 compute_dtype="float32")


def _tiny_setup(lr=1e-3):
    model = AutoencoderKL(TINY)
    x = jnp.zeros((4, 16, 16, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))["params"]
    tx = make_optimizer(lr=lr)
    state = create_train_state(params, tx, jax.random.PRNGKey(42))
    return model, tx, state


def _batches(n, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((batch, 16, 16, 8)).astype(np.float32)
    for _ in range(n):
        yield jnp.asarray(base + 0.01 * rng.standard_normal(base.shape,
                                                            dtype=np.float32))


def test_train_step_decreases_loss():
    model, tx, state = _tiny_setup(lr=3e-3)
    step = make_train_step(vae_loss_fn(model), tx)
    losses = []
    for batch in _batches(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert int(state.step) == 30


def test_grad_accum_matches_full_batch():
    """grad_accum=4 inside the jitted step must produce the SAME update as
    the one-shot step for an rng-free loss: every loss is a per-sample
    mean, so the mean of equal-microbatch grads equals the full-batch
    grad. Uses a deterministic quadratic loss (the VAE loss draws a
    posterior sample per call, which accumulation legitimately re-draws
    per microbatch)."""
    import optax

    def loss_fn(params, batch, rng):
        pred = batch @ params["w"] + params["b"]
        loss = jnp.mean((pred - jnp.sin(batch.sum(axis=1, keepdims=True)))
                        ** 2)
        return loss, {"loss": loss}

    rng = np.random.default_rng(3)
    params = {"w": jnp.asarray(rng.standard_normal((8, 1)), jnp.float32),
              "b": jnp.zeros((1,), jnp.float32)}
    tx = optax.adamw(1e-2)
    batch = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)

    outs = {}
    for accum in (1, 4):
        state = create_train_state(params, tx, jax.random.PRNGKey(0))
        step = make_train_step(loss_fn, tx, donate=False, grad_accum=accum)
        new_state, metrics = step(state, batch)
        outs[accum] = (new_state.params, metrics)
    for a, b in zip(jax.tree_util.tree_leaves(outs[1][0]),
                    jax.tree_util.tree_leaves(outs[4][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    np.testing.assert_allclose(float(outs[1][1]["loss"]),
                               float(outs[4][1]["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(outs[1][1]["grad_norm"]),
                               float(outs[4][1]["grad_norm"]), rtol=1e-5)

    # indivisible batch fails loudly at trace time
    with pytest.raises(AssertionError, match="divisible"):
        make_train_step(loss_fn, tx, donate=False, grad_accum=3)(
            create_train_state(params, tx, jax.random.PRNGKey(0)), batch)


def test_grad_accum_vae_step_trains():
    """The stochastic VAE loss trains through the accumulated step (fresh
    posterior draw per microbatch) and the EMA slot still updates."""
    from tempo_tpu.train.step import init_ema

    model, tx, state = _tiny_setup(lr=3e-3)
    state = init_ema(state, ["loss"])
    step = make_train_step(vae_loss_fn(model), tx, grad_accum=2)
    losses = []
    for batch in _batches(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(float(state.ema["loss"]))


def test_grad_clipping_matches_torch_semantics():
    """optax.clip_by_global_norm + adamw == torch clip_grad_norm_ + AdamW:
    verified against a hand-rolled AdamW on a quadratic."""
    torch = pytest.importorskip("torch")
    w0 = np.asarray([1.5, -2.0, 0.5], dtype=np.float32)
    target = np.asarray([0.0, 1.0, -1.0], dtype=np.float32)

    # torch reference
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([tw], lr=0.1, betas=(0.9, 0.95), eps=1e-8,
                            weight_decay=0.05)
    for _ in range(5):
        opt.zero_grad()
        loss = torch.sum((tw - torch.from_numpy(target)) ** 2) * 10
        loss.backward()
        torch.nn.utils.clip_grad_norm_([tw], max_norm=1.0)
        opt.step()
    want = tw.detach().numpy()

    # ours
    tx = make_optimizer(lr=0.1)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)

    def loss_fn(p):
        return jnp.sum((p["w"] - jnp.asarray(target)) ** 2) * 10

    for _ in range(5):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), want, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    model, tx, state = _tiny_setup()
    step = make_train_step(vae_loss_fn(model), tx)
    for batch in _batches(3):
        state, _ = step(state, batch)

    path = save_checkpoint(tmp_path, state, [{"step": 3, "loss": 1.0}], [])
    assert path.name == "ckpt_step=000003.msgpack"
    assert checkpoint_step(path) == 3
    assert list_checkpoints(tmp_path) == [path]

    _, _, fresh = _tiny_setup()
    restored, train_hist, _ = load_checkpoint(path, fresh)
    assert int(restored.step) == 3
    assert train_hist == [{"step": 3, "loss": 1.0}]
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training must continue bit-identically to uninterrupted training
    batch = next(_batches(1, seed=9))
    cont_a, m_a = step(state, batch)
    cont_b, m_b = step(jax.device_put(restored), batch)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)


def test_async_checkpointer_matches_sync(tmp_path):
    """AsyncCheckpointer writes byte-identical artifacts to the sync path,
    the file only becomes visible once complete, and worker errors
    re-raise on the next wait() instead of vanishing."""
    from tempo_tpu.train import checkpoint as ckpt_lib

    model, tx, state = _tiny_setup()
    step = make_train_step(vae_loss_fn(model), tx)
    for batch in _batches(2):
        state, _ = step(state, batch)

    sync_path = save_checkpoint(tmp_path / "sync", state,
                                [{"step": 2, "loss": 1.0}], [])
    ac = ckpt_lib.AsyncCheckpointer()
    async_path = ac.save(tmp_path / "async", state,
                         [{"step": 2, "loss": 1.0}], [])
    assert ac.wait() == async_path and async_path.exists()
    assert async_path.name == sync_path.name
    assert async_path.read_bytes() == sync_path.read_bytes()

    # loadable through the ordinary restore path
    _, _, fresh = _tiny_setup()
    restored, hist, _ = load_checkpoint(async_path, fresh)
    assert int(restored.step) == 2 and hist == [{"step": 2, "loss": 1.0}]

    # a failed background write surfaces on the next save()/wait()
    boom = ckpt_lib.AsyncCheckpointer()
    orig = ckpt_lib._write_payload

    def exploding(ckpt_dir, payload):
        raise OSError("disk on fire")

    ckpt_lib._write_payload = exploding
    try:
        boom.save(tmp_path / "boom", state, [], [])
        with pytest.raises(OSError, match="disk on fire"):
            boom.wait()
    finally:
        ckpt_lib._write_payload = orig
    ac.close()
    boom.close()


@pytest.mark.slow  # heavier sibling: the byte-identical
# async-vs-sync checkpoint pin stays fast
def test_trainer_async_checkpoint_format(tmp_path):
    """checkpoint_format: async through the Trainer — same artifact tree,
    final write joined before train() returns, resume works."""
    model, tx, state = _tiny_setup()
    trainer = Trainer(loss_fn=vae_loss_fn(model), tx=tx, state=state,
                      output_dir=tmp_path, save_every=3, val_every=100,
                      log_every=2, plot_every=100, verbose=False,
                      checkpoint_format="async")
    stats = trainer.train(iter(_batches(20)), n_steps=6)
    assert stats["steps"] == 6
    assert {p.name for p in (tmp_path / "checkpoints").iterdir()} == {
        "ckpt_step=000003.msgpack", "ckpt_step=000006.msgpack"}

    _, tx2, state2 = _tiny_setup()
    trainer2 = Trainer(loss_fn=vae_loss_fn(model), tx=tx2, state=state2,
                       output_dir=tmp_path, verbose=False,
                       checkpoint_format="async")
    trainer2.load_checkpoint(tmp_path / "checkpoints" /
                             "ckpt_step=000006.msgpack")
    assert trainer2.step == 6
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_running_metrics_ema():
    rm = RunningMetrics(alpha=0.99)
    first = rm.update({"loss": 10.0})
    assert first["loss"] == 10.0  # alpha=0 on first update
    second = rm.update({"loss": 0.0})
    np.testing.assert_allclose(second["loss"], 9.9)


def test_trainer_loop_artifacts(tmp_path):
    model, tx, state = _tiny_setup()

    def recon_fn(params, x, rng):
        return model.apply({"params": params}, x, rng=rng,
                           method=AutoencoderKL.reconstruct)

    trainer = Trainer(
        loss_fn=vae_loss_fn(model), tx=tx, state=state,
        output_dir=tmp_path, save_every=10, val_every=5, log_every=2,
        plot_every=5, n_val_batches=2, recon_fn=recon_fn, verbose=False,
    )
    stats = trainer.train(
        iter(_batches(100)),
        val_iter_factory=lambda: _batches(2, seed=7),
        n_steps=20,
    )
    assert stats["steps"] == 20
    assert (tmp_path / "metrics.json").exists()
    metrics = json.loads((tmp_path / "metrics.json").read_text())
    assert metrics["train"] and metrics["val"]
    assert {p.name for p in (tmp_path / "checkpoints").iterdir()} == {
        "ckpt_step=000010.msgpack", "ckpt_step=000020.msgpack"}
    assert (tmp_path / "summary" / "loss.png").exists()
    assert (tmp_path / "summary" / "recons_err.png").exists()
    assert (tmp_path / "summary" / "kl.png").exists()
    assert (tmp_path / "figures" / "reconstructions_step_000010.png").exists()

    # resume path
    _, tx2, state2 = _tiny_setup()
    trainer2 = Trainer(loss_fn=vae_loss_fn(model), tx=tx2, state=state2,
                       output_dir=tmp_path, verbose=False)
    trainer2.load_checkpoint(tmp_path / "checkpoints" / "ckpt_step=000020.msgpack")
    assert trainer2.step == 20


def test_sqrt_save_schedule():
    from tempo_tpu.train.schedules import sqrt_save_steps

    steps = sqrt_save_steps(200000, n_saves=100)
    assert steps[-1] == 200000
    assert steps == sorted(set(steps))
    # sqrt(linspace) rises steeply then flattens: gaps shrink, so coverage
    # densifies toward the end of training
    assert steps[2] - steps[1] > steps[-1] - steps[-2]


def test_lr_schedule():
    """optimizer.schedule: constant | cosine | linear (+ warmup) — the
    reference trains at a constant lr (no scheduler object anywhere in
    src/train_utils.py); cosine/linear are framework capabilities."""
    import pytest

    from tempo_tpu.train.schedules import lr_schedule

    # constant: returns the bare float so jitted step programs are
    # unchanged from configs that never mention a schedule
    assert lr_schedule({"lr": 3e-4}, 1000) == 3e-4
    assert lr_schedule({}, 1000) == 1e-4

    cos = lr_schedule({"lr": 1e-3, "schedule": "cosine",
                       "warmup_steps": 10, "min_lr": 1e-5}, 100)
    assert float(cos(0)) == 0.0            # warmup starts at 0
    assert abs(float(cos(10)) - 1e-3) < 1e-9   # peak at end of warmup
    assert abs(float(cos(100)) - 1e-5) < 1e-7  # decays to min_lr
    assert float(cos(55)) < 1e-3           # strictly below peak mid-decay

    lin = lr_schedule({"lr": 1e-3, "schedule": "linear",
                       "warmup_steps": 0, "min_lr": 0.0}, 100)
    assert abs(float(lin(0)) - 1e-3) < 1e-9    # no warmup: starts at lr
    assert abs(float(lin(50)) - 5e-4) < 1e-6   # linear midpoint
    assert float(lin(100)) < 1e-5

    with pytest.raises(ValueError, match="schedule"):
        lr_schedule({"schedule": "exponential"}, 100)
    with pytest.raises(ValueError, match="warmup"):
        lr_schedule({"schedule": "cosine", "warmup_steps": 200}, 100)


def test_optimizer_from_config_with_schedule():
    """make_optimizer_from_config threads n_steps into the schedule; a
    scheduled optimizer still takes valid AdamW steps."""
    import jax
    import jax.numpy as jnp
    import optax
    import pytest

    from tempo_tpu.train.state import make_optimizer_from_config

    tx = make_optimizer_from_config(
        {"lr": 1e-2, "schedule": "cosine", "warmup_steps": 2}, n_steps=10)
    params = {"w": jnp.ones((4,), jnp.float32)}
    opt_state = tx.init(params)
    grads = {"w": jnp.full((4,), 0.5, jnp.float32)}
    # step 0 lr is 0 (warmup from zero): update must be exactly zero
    upd, opt_state = tx.update(grads, opt_state, params)
    assert float(jnp.abs(upd["w"]).max()) == 0.0
    params = optax.apply_updates(params, upd)
    upd, opt_state = tx.update(grads, opt_state, params)
    assert float(jnp.abs(upd["w"]).max()) > 0.0  # lr ramped off zero

    with pytest.raises(ValueError, match="n_steps"):
        make_optimizer_from_config({"schedule": "cosine"})


def test_no2_probe_head():
    """Vestigial in-model NO2 probe (reference src/model.py:619-632,
    671-679): enabled via no2_weight>0 + no2_mlp_hidden."""
    import jax
    import jax.numpy as jnp

    from tempo_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig(shape=(8, 16, 16), chs=(12, 8, 8), z_channels=4,
                    embed_dim=4, n_attention_heads=2, norm_groups=4,
                    no2_weight=1.0, no2_mlp_hidden=(16,),
                    compute_dtype="float32")
    model = AutoencoderKL(cfg)
    x = jnp.ones((2, 16, 16, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x,
                        method=AutoencoderKL.predict_no2)
    pred = model.apply(params, x, method=AutoencoderKL.predict_no2)
    assert pred.shape == (2, 4, 4, 1)


@pytest.mark.slow
def test_trainer_sharded_format_and_metric_sinks(tmp_path):
    """checkpoint_format='sharded' writes .shards directory checkpoints the
    resume machinery recognizes, and metric sinks receive every train/val
    emission (JsonlSink streams them to a .jsonl)."""
    from tempo_tpu.train.metrics import JsonlSink
    from tempo_tpu.train.sharded_checkpoint import is_sharded_checkpoint

    model, tx, state = _tiny_setup()
    seen = []
    sink_path = tmp_path / "logs" / "metrics.jsonl"
    trainer = Trainer(
        loss_fn=vae_loss_fn(model), tx=tx, state=state,
        output_dir=tmp_path, save_every=5, val_every=5, log_every=2,
        plot_every=100, n_val_batches=2, verbose=False,
        checkpoint_format="sharded",
        metric_sinks=[JsonlSink(sink_path),
                      lambda step, m, kind: seen.append((step, kind))],
    )
    trainer.train(iter(_batches(100)),
                  val_iter_factory=lambda: _batches(2, seed=7), n_steps=10)

    ckpts = sorted((tmp_path / "checkpoints").iterdir())
    assert [c.name for c in ckpts] == ["ckpt_step=000005.shards",
                                       "ckpt_step=000010.shards"]
    assert all(is_sharded_checkpoint(c) for c in ckpts)

    # sinks saw train emissions (every log_every) and val emissions
    assert (5, "val") in seen and (10, "train") in seen
    lines = [json.loads(l) for l in sink_path.read_text().splitlines()]
    assert {l["kind"] for l in lines} == {"train", "val"}
    assert any("loss" in l for l in lines)

    # auto-resume finds the sharded checkpoint
    from tempo_tpu.train.checkpoint import latest_checkpoint

    latest = latest_checkpoint(tmp_path / "checkpoints")
    assert latest is not None and latest.name == "ckpt_step=000010.shards"
    _, tx2, state2 = _tiny_setup()
    trainer2 = Trainer(loss_fn=vae_loss_fn(model), tx=tx2, state=state2,
                       output_dir=tmp_path, verbose=False)
    trainer2.load_checkpoint(latest)
    assert trainer2.step == 10
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    import pytest
    with pytest.raises(ValueError):
        Trainer(loss_fn=vae_loss_fn(model), tx=tx, state=state,
                output_dir=tmp_path, checkpoint_format="bogus")


def test_load_params_from_sharded_checkpoint(tmp_path):
    """Analysis CLIs consume sharded checkpoint directories through the
    same load_params entry as msgpack/.pt files."""
    from tempo_tpu.train.checkpoint import load_params
    from tempo_tpu.train.sharded_checkpoint import save_checkpoint_sharded

    model, tx, state = _tiny_setup()
    path = save_checkpoint_sharded(tmp_path, state)
    params = load_params(path, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

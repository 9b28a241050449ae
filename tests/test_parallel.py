"""Multi-device tests on the virtual 8-device CPU mesh: data-parallel
training must (a) run sharded end-to-end and (b) produce the same numbers as
single-device execution (the collective correctness check the reference
never needed — SURVEY.md SS2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.models.vae import AutoencoderKL, VAEConfig
from tempo_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    make_place_fn,
    shard_state,
)
from tempo_tpu.train.state import create_train_state, make_optimizer
from tempo_tpu.train.step import make_train_step, vae_loss_fn

TINY = VAEConfig(shape=(8, 16, 16), chs=(12, 8, 8), z_channels=4,
                 embed_dim=4, n_attention_heads=2, norm_groups=4,
                 compute_dtype="float32")


def _setup():
    model = AutoencoderKL(TINY)
    x = jnp.zeros((8, 16, 16, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))["params"]
    tx = make_optimizer(lr=1e-3)
    state = create_train_state(params, tx, jax.random.PRNGKey(42))
    return model, tx, state


def test_eight_cpu_devices_available():
    assert jax.device_count() >= 8


def test_data_parallel_step_runs_sharded():
    model, tx, state = _setup()
    mesh = create_mesh()
    state = shard_state(state, mesh)
    place = make_place_fn(mesh)

    step = make_train_step(vae_loss_fn(model), tx)
    batch = place(np.random.default_rng(0).standard_normal(
        (8, 16, 16, 8)).astype(np.float32))
    assert batch.sharding == batch_sharding(mesh)

    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # params stay replicated after the update
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_data_parallel_matches_single_device():
    """Same batch, same init: DP-sharded step must equal the unsharded step
    (the mean/sum reductions divide by the GLOBAL batch, so sharding is
    numerically transparent)."""
    model, tx, state_a = _setup()
    step = make_train_step(vae_loss_fn(model), tx, donate=False)

    batch_np = np.random.default_rng(1).standard_normal(
        (8, 16, 16, 8)).astype(np.float32)

    # single device
    state_1, metrics_1 = step(state_a, jnp.asarray(batch_np))

    # 8-way data parallel
    _, _, state_b = _setup()
    mesh = create_mesh()
    state_b = shard_state(state_b, mesh)
    batch = make_place_fn(mesh)(batch_np)
    state_8, metrics_8 = step(state_b, batch)

    np.testing.assert_allclose(float(metrics_1["loss"]),
                               float(metrics_8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_spatial_halo_sharded_encode_matches_unsharded():
    """Track-axis (W) sharding of a whole granule: XLA inserts the conv halo
    exchanges; the sharded encode must equal the single-device encode."""
    from tempo_tpu.parallel.spatial import (
        decode_spatially_sharded,
        encode_spatially_sharded,
        spatial_sharding,
    )

    model = AutoencoderKL(TINY)
    # granule-like input: W = 128 = 8 devices x 16
    x = np.random.default_rng(5).standard_normal(
        (1, 32, 128, 8)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        rng=jax.random.PRNGKey(1))["params"]

    want = model.apply({"params": params}, jnp.asarray(x),
                       method=AutoencoderKL.encode).mean

    mesh = create_mesh()
    got = encode_spatially_sharded(model, params, x, mesh)
    assert got.sharding == spatial_sharding(mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)

    # decode round-trip through the sharded path
    dec_want = model.apply({"params": params}, want,
                           method=AutoencoderKL.decode)
    dec_got = decode_spatially_sharded(model, params, np.asarray(want), mesh)
    np.testing.assert_allclose(np.asarray(dec_got), np.asarray(dec_want),
                               atol=2e-4, rtol=1e-3)


def test_tensor_parallel_step_matches_single_device():
    """Channel-sharded (tensor-parallel) training over a ('data','model')
    mesh: kernels/biases sharded on their output-channel axis, XLA SPMD
    inserts the activation collectives. Must match the unsharded step to
    fp32 reassociation tolerance, with optimizer state actually sharded."""
    from tempo_tpu.parallel.tensor import (
        MODEL_AXIS,
        create_tp_mesh,
        shard_state_tp,
        tp_sharding_rule,
    )

    model, tx, state_a = _setup()
    step = make_train_step(vae_loss_fn(model), tx, donate=False)
    batch_np = np.random.default_rng(7).standard_normal(
        (8, 16, 16, 8)).astype(np.float32)

    state_1, metrics_1 = step(state_a, jnp.asarray(batch_np))

    _, _, state_b = _setup()
    mesh = create_tp_mesh(n_model=4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    state_b = shard_state_tp(state_b, mesh)

    # conv kernels really are sharded on their last (output-channel) axis
    kernel = state_b.params["encoder"]["conv_in"]["kernel"]
    assert kernel.sharding.spec[-1] == MODEL_AXIS
    # RNG key stays replicated even when its trailing dim divides the axis
    assert state_b.rng.sharding.is_fully_replicated

    batch = make_place_fn(mesh)(batch_np)
    state_tp, metrics_tp = step(state_b, batch)

    np.testing.assert_allclose(float(metrics_1["loss"]),
                               float(metrics_tp["loss"]), rtol=1e-5)
    flat_1 = jax.tree_util.tree_leaves(state_1.params)
    flat_tp = jax.tree_util.tree_leaves(state_tp.params)
    for a, b in zip(flat_1, flat_tp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

    # the update must preserve the channel sharding (no silent regather)
    kernel_after = state_tp.params["encoder"]["conv_in"]["kernel"]
    assert kernel_after.sharding.spec == tp_sharding_rule(
        kernel_after, mesh).spec


def test_tensor_parallel_encode_matches_unsharded():
    from tempo_tpu.parallel.tensor import create_tp_mesh, shard_params_tp

    model = AutoencoderKL(TINY)
    x = np.random.default_rng(8).standard_normal(
        (4, 16, 16, 8)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        rng=jax.random.PRNGKey(1))["params"]
    want = model.apply({"params": params}, jnp.asarray(x),
                       method=AutoencoderKL.encode).mean

    mesh = create_tp_mesh(n_model=4)
    params_tp = shard_params_tp(params, mesh)
    got = jax.jit(lambda p, xx: model.apply(
        {"params": p}, xx, method=AutoencoderKL.encode).mean)(params_tp,
                                                             jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_tensor_parallel_l2_step_matches_single_device():
    """The L2-supervised multi-task step under channel sharding: product
    heads (1-channel outputs) stay replicated by rule; everything else
    shards. Must match unsharded execution."""
    from tempo_tpu.models.vae_l2 import L2_PRODUCTS, VAEWithL2Head
    from tempo_tpu.parallel.tensor import create_tp_mesh, shard_state_tp

    model = VAEWithL2Head(TINY, mlp_hidden=(16, 16))
    rng = np.random.default_rng(13)
    batch_np = {"spectral": rng.standard_normal(
        (8, 16, 16, 8)).astype(np.float32)}
    for p in L2_PRODUCTS:
        field = rng.standard_normal((8, 16, 16)).astype(np.float32)
        field[rng.random(field.shape) < 0.2] = np.nan
        batch_np[p] = field

    sample = {k: v[:2] for k, v in batch_np.items()}
    params = model.init(jax.random.PRNGKey(0), sample, jax.random.PRNGKey(1),
                        method=VAEWithL2Head.compute_loss)["params"]
    tx = make_optimizer(lr=1e-3)

    def loss_fn(p, b, rng):
        return model.apply({"params": p}, b, rng,
                           method=VAEWithL2Head.compute_loss)

    step = make_train_step(loss_fn, tx, donate=False)

    state_1 = create_train_state(params, tx, jax.random.PRNGKey(42))
    _, metrics_1 = step(state_1, jax.tree_util.tree_map(jnp.asarray,
                                                        batch_np))

    mesh = create_tp_mesh(n_model=4)
    state_tp = shard_state_tp(
        create_train_state(params, tx, jax.random.PRNGKey(42)), mesh)
    _, metrics_tp = step(state_tp, make_place_fn(mesh)(batch_np))

    for k in ("loss", "nll_loss", "NO2_loss"):
        np.testing.assert_allclose(float(metrics_1[k]),
                                   float(metrics_tp[k]), rtol=1e-5)


def test_checkpoint_roundtrip_preserves_mesh_sharding(tmp_path):
    """Resume must restore the live state's mesh placement: replicated for
    DP, channel-sharded for TP (train/checkpoint.py:place_like). A bare
    device_put would silently demote a multi-chip run to one device."""
    from tempo_tpu.parallel.tensor import create_tp_mesh, shard_state_tp
    from tempo_tpu.train import checkpoint as ckpt_lib

    _, _, state = _setup()
    mesh = create_tp_mesh(n_model=4)
    state = shard_state_tp(state, mesh)
    path = ckpt_lib.save_checkpoint(tmp_path, state, [], [])

    _, _, template = _setup()
    template = shard_state_tp(template, mesh)
    loaded, _, _ = ckpt_lib.load_checkpoint(path, template)
    loaded = ckpt_lib.place_like(loaded, template)

    kernel = loaded.params["encoder"]["conv_in"]["kernel"]
    assert kernel.sharding == template.params["encoder"]["conv_in"][
        "kernel"].sharding
    for a, b in zip(jax.tree_util.tree_leaves(loaded.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_buffer_feeds_dp_train_step(tmp_path):
    """Integration: device-resident buffer (mesh mode) -> fused DP train
    step, end to end on the CPU mesh."""
    from tempo_tpu.data.device_buffer import DeviceTileBuffer
    from tempo_tpu.data.synthetic import make_tile_shards

    make_tile_shards(tmp_path, n_files=2, tiles_per_file=16, tile=16,
                     n_spectral=8, seed=4)
    mesh = create_mesh()
    buf = DeviceTileBuffer(tmp_path, batch_size=8, slots=2, swap_every=3,
                           seed=0, mesh=mesh)
    model, tx, state = _setup()
    state = shard_state(state, mesh)
    step = make_train_step(vae_loss_fn(model), tx)
    try:
        losses = []
        for _ in range(8):
            state, metrics = step(state, next(buf))
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert int(state.step) == 8
    finally:
        buf.close()


def test_device_buffer_feeds_l2_dp_train_step(tmp_path):
    """Integration: L2 dict batches from the device-resident buffer (mesh
    mode) -> fused L2-supervised DP train step — the multi-task path at the
    framework's own input speed (VERDICT round-1 gap #2)."""
    from tempo_tpu.data.device_buffer import DeviceTileBuffer
    from tempo_tpu.data.synthetic import make_tile_shards
    from tempo_tpu.models.vae_l2 import L2_PRODUCTS, VAEWithL2Head

    products = list(L2_PRODUCTS)
    make_tile_shards(tmp_path, n_files=2, tiles_per_file=16, tile=16,
                     n_spectral=8, l2_products=products, seed=9)
    mesh = create_mesh()
    buf = DeviceTileBuffer(tmp_path, batch_size=8, slots=2, swap_every=3,
                           seed=0, mesh=mesh, l2_products=products)

    model = VAEWithL2Head(TINY, mlp_hidden=(16, 16))
    sample = {"spectral": jnp.zeros((8, 16, 16, 8), jnp.float32)}
    for p in products:
        sample[p] = jnp.zeros((8, 16, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), sample, jax.random.PRNGKey(1),
                        method=VAEWithL2Head.compute_loss)["params"]
    tx = make_optimizer(lr=1e-3)
    state = shard_state(create_train_state(params, tx, jax.random.PRNGKey(2)),
                        mesh)

    def loss_fn(p, batch, rng):
        return model.apply({"params": p}, batch, rng,
                           method=VAEWithL2Head.compute_loss)

    step = make_train_step(loss_fn, tx)
    try:
        for _ in range(6):
            batch = next(buf)
            assert batch["spectral"].sharding == batch_sharding(mesh)
            state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        for p in products:
            assert np.isfinite(float(metrics[f"{p}_loss"]))
        assert int(state.step) == 6
    finally:
        buf.close()


def test_granule_codec_sharded_matches_unsharded():
    """GranuleCodec(mesh=...): whole-granule encode/decode/reconstruct with
    the track axis split over 8 devices — each device holds a 16-column
    share of a 128-wide granule — must equal the single-device codec
    (VERDICT round-1 item #8)."""
    from tempo_tpu.infer.granule_codec import GranuleCodec

    model = AutoencoderKL(TINY)
    granule = np.random.default_rng(11).standard_normal(
        (32, 128, 8)).astype(np.float32)  # [H, W, C]; W = 8 devices x 16
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(granule)[None],
                        rng=jax.random.PRNGKey(1))["params"]

    plain = GranuleCodec(model, params, multiple=16, seed=0)
    mesh = create_mesh()
    sharded = GranuleCodec(model, params, multiple=16, seed=0, mesh=mesh)

    lat_plain = np.asarray(plain.encode(granule))
    lat_sharded_dev = sharded.encode(granule)
    # the [H/4, W/4, Z] latent stays split along W across all 8 devices
    assert len(lat_sharded_dev.sharding.device_set) == 8
    lat_sharded = np.asarray(lat_sharded_dev)
    assert lat_plain.shape == (8, 32, 4)
    np.testing.assert_allclose(lat_sharded, lat_plain, atol=2e-4, rtol=1e-3)

    rec_plain = plain.reconstruct(granule, sample_posterior=False)
    rec_sharded = sharded.reconstruct(granule, sample_posterior=False)
    np.testing.assert_allclose(rec_sharded, rec_plain, atol=2e-4, rtol=1e-3)

    dec_plain = plain.decode(lat_plain)
    dec_sharded = sharded.decode(lat_plain)
    np.testing.assert_allclose(dec_sharded, dec_plain, atol=2e-4, rtol=1e-3)


def test_sharded_checkpoint_tp_roundtrip(tmp_path):
    """Sharded checkpointing (train/sharded_checkpoint.py) must save and
    restore a tensor-parallel state WITHOUT ever assembling a full leaf on
    the host: save streams addressable shards into per-leaf .npy files,
    restore reads per-device slices from memmaps. Pinned: bitwise value
    roundtrip, preserved channel shardings, ckpt_step= enumeration parity,
    and no jax.device_get of the big leaves."""
    from tempo_tpu.parallel.tensor import create_tp_mesh, shard_state_tp, MODEL_AXIS
    from tempo_tpu.train import checkpoint as ckpt_lib
    from tempo_tpu.train.sharded_checkpoint import (
        is_sharded_checkpoint,
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )
    from tempo_tpu.train.step import init_ema

    model, tx, state = _setup()
    mesh = create_tp_mesh(n_model=4)
    state = shard_state_tp(state, mesh)
    state = init_ema(state, ["loss"])
    # advance one step so the optimizer moments are non-trivial
    step = make_train_step(vae_loss_fn(model), tx, donate=False)
    batch = make_place_fn(mesh)(np.random.default_rng(9).standard_normal(
        (8, 16, 16, 8)).astype(np.float32))
    state, _ = step(state, batch)

    # device_get must only ever see the small host header (rng)
    real_device_get = jax.device_get

    def guarded_device_get(x):
        leaves = jax.tree_util.tree_leaves(x)
        assert all(np.size(np.shape(l)) == 0 or np.prod(np.shape(l)) <= 64
                   for l in leaves), "full-leaf host gather in sharded save"
        return real_device_get(x)

    jax.device_get = guarded_device_get
    try:
        path = save_checkpoint_sharded(tmp_path, state,
                                       train_metrics=[{"step": 1, "loss": 1.0}])
    finally:
        jax.device_get = real_device_get

    assert is_sharded_checkpoint(path)
    assert ckpt_lib.list_checkpoints(tmp_path) == [path]
    assert ckpt_lib.latest_checkpoint(tmp_path) == path
    assert ckpt_lib.checkpoint_step(path) == 1

    # fresh template with the target shardings (as a resumed run builds it)
    model2, tx2, template = _setup()
    template = shard_state_tp(template, mesh)
    template = init_ema(template, ["loss"])
    restored, train_m, _ = load_checkpoint_sharded(path, template)
    assert train_m == [{"step": 1, "loss": 1.0}]
    assert int(restored.step) == 1

    # bitwise value roundtrip + sharding preservation
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    kernel = restored.params["encoder"]["conv_in"]["kernel"]
    assert kernel.sharding.spec[-1] == MODEL_AXIS

    # the generic loader dispatches on the directory format too, and the
    # restored state steps (resume path)
    restored2, _, _ = ckpt_lib.load_checkpoint(path, template)
    restored2 = ckpt_lib.place_like(restored2, template)
    state_next, metrics = step(restored2, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state_next.step) == 2


@pytest.mark.slow
def test_tensor_parallel_with_padded_boundary():
    """Tensor parallelism must compose with the lane-padded boundary-conv
    parameterization (models/vae.py pad_boundary): the in-jit zero-pad of
    the channel-sharded conv_out kernel goes through XLA SPMD, and the
    sharded step must match single-device numerics at a padded-eligible
    (ragged, >=256-channel) spectral width."""
    from tempo_tpu.parallel.tensor import create_tp_mesh, shard_state_tp

    cfg = VAEConfig(shape=(260, 16, 16), chs=(32, 24, 16), z_channels=4,
                    embed_dim=4, n_attention_heads=2, norm_groups=4,
                    compute_dtype="float32", pad_boundary=True)
    assert cfg.boundary_pad == 384
    model = AutoencoderKL(cfg)
    x = jnp.zeros((8, 16, 16, 260), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x,
                        rng=jax.random.PRNGKey(1))["params"]
    tx = make_optimizer(lr=1e-3)
    step = make_train_step(vae_loss_fn(model), tx, donate=False)
    batch_np = np.random.default_rng(3).standard_normal(
        (8, 16, 16, 260)).astype(np.float32)

    state_1, metrics_1 = step(
        create_train_state(params, tx, jax.random.PRNGKey(42)),
        jnp.asarray(batch_np))

    mesh = create_tp_mesh(n_model=4)
    state_tp = shard_state_tp(
        create_train_state(params, tx, jax.random.PRNGKey(42)), mesh)
    # the ragged 260-channel conv_out output axis (260 % 4 == 0) really is
    # sharded — the pad composes with a distributed kernel
    kernel = state_tp.params["decoder"]["conv_out"]["kernel"]
    assert not kernel.sharding.is_fully_replicated
    state_tp, metrics_tp = step(state_tp, make_place_fn(mesh)(batch_np))

    # the summed loss reassociates across the extra SPMD partials (532k
    # terms dominated by the per-element logvar constant); the parity
    # criterion is the global <1e-3, and pixel_mse (O(1) scale) is tighter
    np.testing.assert_allclose(float(metrics_1["loss"]),
                               float(metrics_tp["loss"]), rtol=1e-3)
    np.testing.assert_allclose(float(metrics_1["pixel_mse"]),
                               float(metrics_tp["pixel_mse"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_diffusion_data_parallel_matches_single_device():
    """The latent-diffusion step (frozen-VAE encode fused in, VDM ELBO) is
    DP-transparent too: same batch + same rng chain, sharded == unsharded.
    Covers the antithetic time sampling (arange over the GLOBAL batch) and
    the per-sample ELBO mean under sharding."""
    from tempo_tpu.models.diffusion import VDM
    from tempo_tpu.nn.unet import CUNet
    from tempo_tpu.train.step import diffusion_loss_fn

    vae_model, _, _ = _setup()
    vae_params = vae_model.init(
        jax.random.PRNGKey(3), jnp.zeros((8, 16, 16, 8), jnp.float32),
        rng=jax.random.PRNGKey(4))["params"]

    def encode_fn(x, rng):
        return vae_model.apply({"params": vae_params}, x,
                               method=AutoencoderKL.encode).sample(rng)

    score = CUNet(shape=(4, 4, 4), chs=(8, 12), norm_groups=4,
                  n_attention_heads=2, dropout_prob=0.0,
                  t_conditioning=True, t_embedding_dim=8)
    model = VDM(score, gamma_min=-8.0, gamma_max=4.0)
    params = model.init(jax.random.PRNGKey(5),
                        jnp.zeros((8, 4, 4, 4), jnp.float32),
                        rng=jax.random.PRNGKey(6))["params"]
    tx = make_optimizer(lr=1e-3)
    loss_fn = diffusion_loss_fn(model, encode_fn)

    batch_np = np.random.default_rng(7).standard_normal(
        (8, 16, 16, 8)).astype(np.float32)

    state_1 = create_train_state(params, tx, jax.random.PRNGKey(8))
    step = make_train_step(loss_fn, tx, donate=False)
    state_1, metrics_1 = step(state_1, jnp.asarray(batch_np))

    state_8 = create_train_state(params, tx, jax.random.PRNGKey(8))
    mesh = create_mesh()
    state_8 = shard_state(state_8, mesh)
    batch = make_place_fn(mesh)(batch_np)
    state_8, metrics_8 = step(state_8, batch)

    np.testing.assert_allclose(float(metrics_1["loss"]),
                               float(metrics_8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Pipeline (stage-axis) parallelism for the transformer family


def _pp_setup():
    from tempo_tpu.nn.transformer import Transformer, TransformerConfig

    cfg = TransformerConfig(in_size=61, block_size=16, n_layer=4, n_head=2,
                            n_embd=32, tokenized=True, tie_emb=True)
    model = Transformer(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 61)
    targets = jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, 61)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    return cfg, model, params, tokens, targets


def test_pipeline_parallel_forward_matches_unpipelined():
    """4 stages x 4 microbatches over the 'pipe' mesh axis: the ppermute
    pipeline must reproduce the plain Transformer logits exactly, and the
    stage split/merge must roundtrip."""
    from tempo_tpu.parallel.pipeline import (create_pp_mesh,
                                             make_pipelined_apply,
                                             merge_pipeline_params,
                                             place_pipeline_params,
                                             split_pipeline_params)

    cfg, model, params, tokens, _ = _pp_setup()
    ref_logits = model.apply({"params": params}, tokens)

    mesh = create_pp_mesh(4)
    rest, stack = split_pipeline_params(params, 4)
    merged = merge_pipeline_params(rest, stack)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rest, stack = place_pipeline_params(mesh, rest, stack)
    stage_leaf = jax.tree_util.tree_leaves(stack)[0]
    assert not stage_leaf.sharding.is_fully_replicated  # stages are sharded

    pp_logits = jax.jit(make_pipelined_apply(cfg, 4, 4, mesh))(
        rest, stack, tokens)
    np.testing.assert_allclose(np.asarray(pp_logits), np.asarray(ref_logits),
                               atol=2e-5, rtol=2e-5)


def test_pipeline_parallel_train_step_matches_single_device():
    """One AdamW update through the differentiated pipeline (reverse
    schedule comes from the ppermute transpose) equals the unpipelined
    update; also covers a non-square schedule (2 stages, 8 microbatches)."""
    import optax

    from tempo_tpu.parallel.pipeline import (create_pp_mesh, make_pp_loss_fn,
                                             merge_pipeline_params,
                                             place_pipeline_params,
                                             split_pipeline_params)

    cfg, model, params, tokens, targets = _pp_setup()

    def ref_loss(p, tok, tgt):
        logits = model.apply({"params": p}, tok)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0].mean()

    tx = make_optimizer(lr=1e-3)

    l_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(
        params, tokens, targets)
    upd_ref, _ = tx.update(g_ref, tx.init(params), params)
    params_ref = optax.apply_updates(params, upd_ref)

    mesh = create_pp_mesh(2)
    rest, stack = place_pipeline_params(mesh,
                                        *split_pipeline_params(params, 2))
    loss_fn = make_pp_loss_fn(cfg, n_stages=2, n_micro=8, mesh=mesh)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_fn))(
        (rest, stack), tokens, targets)
    upd_pp, _ = tx.update(g_pp, tx.init((rest, stack)), (rest, stack))
    rest_new, stack_new = optax.apply_updates((rest, stack), upd_pp)

    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    params_pp = merge_pipeline_params(rest_new, stack_new)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(params_ref)
    flat_pp, _ = jax.tree_util.tree_flatten_with_path(params_pp)
    for (path_a, a), (path_b, b) in zip(flat_ref, flat_pp):
        assert path_a == path_b
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=str(path_a))


def test_pipeline_parallel_composes_with_data_axis():
    """2-D ('data','pipe') mesh (2x4 = 8 devices): data-sharded
    microbatches through per-slice pipelines, grads all-reduced over
    'data' — loss and grads equal the unpipelined model."""
    from tempo_tpu.parallel.pipeline import (create_pp_mesh, make_pp_loss_fn,
                                             merge_pipeline_params,
                                             place_pipeline_params,
                                             split_pipeline_params)

    cfg, model, params, tokens, targets = _pp_setup()

    def ref_loss(p, tok, tgt):
        logits = model.apply({"params": p}, tok)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0].mean()

    l_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(
        params, tokens, targets)

    mesh = create_pp_mesh(4, n_data=2)
    assert dict(mesh.shape) == {"data": 2, "pipe": 4}
    rest, stack = place_pipeline_params(mesh,
                                        *split_pipeline_params(params, 4))
    loss_fn = make_pp_loss_fn(cfg, n_stages=4, n_micro=4, mesh=mesh)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_fn))(
        (rest, stack), tokens, targets)

    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    merged = merge_pipeline_params(g_pp[0], g_pp[1])
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_pipeline_composes_with_data_and_tensor_axes():
    """3-D ('data','pipe','model') mesh (2x2x2 = 8 devices) — the dp x pp
    x tp layout a real multi-pod run uses: stage stacks sharded over
    'pipe', channel (last-axis) params over 'model' as a GSPMD auto axis
    inside the pipeline's shard_map, batch over 'data'. Loss and grads
    must equal the single-device model."""
    from tempo_tpu.parallel.pipeline import (create_pp_mesh, make_pp_loss_fn,
                                             merge_pipeline_params,
                                             place_pipeline_params,
                                             split_pipeline_params)
    from tempo_tpu.parallel.tensor import MODEL_AXIS

    cfg, model, params, tokens, targets = _pp_setup()

    def ref_loss(p, tok, tgt):
        logits = model.apply({"params": p}, tok)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0].mean()

    l_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(
        params, tokens, targets)

    mesh = create_pp_mesh(2, n_data=2, n_model=2)
    assert dict(mesh.shape) == {"data": 2, "pipe": 2, "model": 2}
    rest, stack = place_pipeline_params(mesh,
                                        *split_pipeline_params(params, 2))
    # the channel tails really are tensor-sharded
    wte_spec = rest["wte"].sharding.spec
    assert wte_spec[-1] == MODEL_AXIS, wte_spec
    stack_leaf = jax.tree_util.tree_leaves(stack)[0]
    assert stack_leaf.sharding.spec[0] == "pipe"

    loss_fn = make_pp_loss_fn(cfg, n_stages=2, n_micro=4, mesh=mesh)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_fn))(
        (rest, stack), tokens, targets)

    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    merged = merge_pipeline_params(g_pp[0], g_pp[1])
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_pp, _ = jax.tree_util.tree_flatten_with_path(merged)
    for (path_a, a), (path_b, b) in zip(flat_ref, flat_pp):
        assert path_a == path_b
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=str(path_a))


@pytest.mark.slow  # heavier sibling of the TP sharded-checkpoint
# roundtrip (which stays fast); PP save/restore also runs in
# test_multihost.py (slow)
def test_sharded_checkpoint_pp_roundtrip(tmp_path):
    """The template-driven sharded checkpoint generalizes to the pipeline
    axis: a (rest, stage_stack) param tuple with stage-sharded [S, ...]
    leaves saves and restores with values and 'pipe' shardings intact."""
    import optax

    from tempo_tpu.parallel.pipeline import (PIPE_AXIS, create_pp_mesh,
                                             make_pp_loss_fn,
                                             place_pipeline_params,
                                             split_pipeline_params)
    from tempo_tpu.train.sharded_checkpoint import (
        load_checkpoint_sharded, save_checkpoint_sharded)

    cfg, model, params, tokens, targets = _pp_setup()
    mesh = create_pp_mesh(4)
    pp_params = place_pipeline_params(mesh, *split_pipeline_params(params, 4))

    tx = make_optimizer(lr=1e-3)
    state = create_train_state(pp_params, tx, jax.random.PRNGKey(3))

    # one real update so the moments are non-trivial
    loss_fn = make_pp_loss_fn(cfg, n_stages=4, n_micro=4, mesh=mesh)
    grads = jax.jit(jax.grad(lambda p: loss_fn(p, tokens, targets)))(
        pp_params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    state = state.replace(params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state, step=state.step + 1)

    path = save_checkpoint_sharded(tmp_path, state)

    template = create_train_state(
        place_pipeline_params(mesh, *split_pipeline_params(params, 4)),
        tx, jax.random.PRNGKey(3))
    restored, _, _ = load_checkpoint_sharded(path, template)

    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    stack_leaf = jax.tree_util.tree_leaves(restored.params[1])[0]
    assert stack_leaf.sharding.spec[0] == PIPE_AXIS
    # restored state still trains through the pipeline
    l2 = jax.jit(loss_fn)(restored.params, tokens, targets)
    assert np.isfinite(float(l2))


def test_tensor_parallel_gpt_matches_unsharded():
    """The generic last-axis tp_sharding_rule extends to the transformer
    family unchanged: channel-sharded GPT params give identical loss and
    grads (XLA inserts the activation collectives)."""
    from tempo_tpu.parallel.tensor import create_tp_mesh, shard_params_tp

    cfg, model, params, tokens, targets = _pp_setup()

    def loss_fn(p):
        logits = model.apply({"params": p}, tokens)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(logp, targets[..., None], -1).mean()

    l1, g1 = jax.jit(jax.value_and_grad(loss_fn))(params)

    mesh = create_tp_mesh(n_model=4)
    params_tp = shard_params_tp(params, mesh)
    assert not params_tp["h_0"]["attn"]["c_attn"][
        "kernel"].sharding.is_fully_replicated
    l2, g2 = jax.jit(jax.value_and_grad(loss_fn))(params_tp)

    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_fsdp_train_step_matches_single_device():
    """ZeRO-3 (parallel/fsdp.py): params + AdamW moments sharded over the
    'data' axis must train identically to single device — the sharding rule
    only touches placements, never values; XLA inserts the just-in-time
    weight all-gathers and gradient reduce-scatters."""
    from tempo_tpu.parallel.fsdp import shard_state_fsdp

    model, tx, state_a = _setup()
    step = make_train_step(vae_loss_fn(model), tx, donate=False)
    batch_np = np.random.default_rng(1).standard_normal(
        (8, 16, 16, 8)).astype(np.float32)
    state_1, metrics_1 = step(state_a, jnp.asarray(batch_np))

    _, _, state_b = _setup()
    mesh = create_mesh()
    state_b = shard_state_fsdp(state_b, mesh)
    # the state must actually be sharded (the memory win is the point)
    param_leaves = jax.tree_util.tree_leaves(state_b.params)
    n_sharded = sum(1 for leaf in param_leaves
                    if not leaf.sharding.is_fully_replicated)
    # TINY's 12-channel leaves can't divide by 8 and stay replicated;
    # everything divisible (104/131 leaves here) must shard
    assert n_sharded > 0.7 * len(param_leaves), (
        f"{n_sharded}/{len(param_leaves)} param leaves sharded")
    some = next(leaf for leaf in param_leaves
                if not leaf.sharding.is_fully_replicated)
    assert (np.prod(some.addressable_shards[0].data.shape)
            == some.size // jax.device_count())

    state_8, metrics_8 = step(state_b, make_place_fn(mesh)(batch_np))
    np.testing.assert_allclose(float(metrics_1["loss"]),
                               float(metrics_8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    # the updated state keeps its FSDP shardings (no silent re-replication)
    assert sum(1 for leaf in jax.tree_util.tree_leaves(state_8.params)
               if not leaf.sharding.is_fully_replicated) == n_sharded

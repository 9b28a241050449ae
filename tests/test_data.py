"""Data-layer tests: granule reading (h5py vs the netCDF layout), the exact
normalization semantics, tile/augmentation matching, and the threaded
shuffle-buffer loader."""

import numpy as np
import pytest

from tempo_tpu.data.granule import l2_filename_for, read_l2_field, read_radiance
from tempo_tpu.data.loader import RandomBuffer, TileLoader
from tempo_tpu.data.normalize import compute_l2_stats, normalize_l2, normalize_radiance
from tempo_tpu.data.synthetic import (
    L2_FIELDS,
    make_granule_corpus,
    make_tile_shards,
    write_granule,
    write_l2_granule,
)
from tempo_tpu.data.tiles import (
    apply_augmentation,
    extract_l2_tiles,
    extract_tiles_with_positions,
    load_tile_shard,
    save_tile_shard,
)


def test_granule_roundtrip(tmp_path, rng):
    rad = write_granule(tmp_path / "g.nc", rng, 20, 24, 8)
    got = read_radiance(tmp_path / "g.nc")
    np.testing.assert_array_equal(got, rad)
    assert got.dtype == np.float32


def test_l2_field_fill_values_and_scale(tmp_path, rng):
    raw = write_l2_granule(tmp_path / "l2.nc", rng, "NO2", 10, 12)
    got = read_l2_field(tmp_path / "l2.nc", L2_FIELDS["NO2"], scale=1e15)
    fill_mask = raw < -1e29
    assert np.isnan(got[fill_mask]).all()
    np.testing.assert_allclose(got[~fill_mask], raw[~fill_mask] / 1e15,
                               rtol=1e-5)


def test_l2_field_missing_returns_none(tmp_path, rng):
    write_granule(tmp_path / "g.nc", rng, 8, 8, 4)  # no product group
    assert read_l2_field(tmp_path / "g.nc", "whatever") is None


def test_l2_filename_convention():
    name = "TEMPO_RAD_L1_V03_20250101T120000Z_S001G01.nc"
    assert l2_filename_for(name, "NO2") == \
        "TEMPO_NO2_L2_V03_20250101T120000Z_S001G01.nc"


def test_normalize_radiance_semantics(rng):
    rad = rng.gamma(2.0, 5e10, size=(6, 7, 4)).astype(np.float32)
    rad[0, 0, 0] = 0.0  # must be clamped to min_radiance before log
    mean = np.log(rad.clip(1.0, None)).reshape(-1, 4).mean(0)
    std = np.log(rad.clip(1.0, None)).reshape(-1, 4).std(0)
    z = normalize_radiance(rad, mean, std)
    want = np.clip((np.log(np.clip(rad, 1.0, None)) - mean) / (std + 1e-8),
                   -10, 10)
    np.testing.assert_allclose(z, want, rtol=1e-5)
    assert np.isfinite(z).all()


def test_normalize_l2_types(rng):
    data = rng.standard_normal((50, 50)).astype(np.float32) * 3
    data[0, :10] = np.nan

    for norm_type in ("zscore", "minmax", "asinh"):
        out, stats = normalize_l2(data, norm_type)
        assert stats is not None
        assert np.isnan(out[0, :10]).all()
        assert np.isfinite(out[1:]).all()

    frac = rng.random((20, 20)).astype(np.float32)
    out, stats = normalize_l2(frac, "logit")
    assert stats == {"eps": 0.01}
    want = np.log((0.01 + 0.98 * frac) / (1 - 0.01 - 0.98 * frac))
    np.testing.assert_allclose(out, want, rtol=1e-4)


def test_l2_stats_asinh_uses_mad(rng):
    vals = rng.standard_normal(1000).astype(np.float32)
    stats = compute_l2_stats(vals, "asinh")
    med = np.median(vals)
    mad = np.median(np.abs(vals - med))
    np.testing.assert_allclose(stats["scale"], 1.4826 * mad, rtol=1e-6)


def test_extract_tiles_and_l2_alignment(rng):
    z = rng.standard_normal((40, 48, 3)).astype(np.float32)
    l2 = rng.standard_normal((40, 48)).astype(np.float32)

    tiles, positions = extract_tiles_with_positions(z, (16, 16), 5, rng)
    assert tiles.shape == (5, 16, 16, 3)
    l2_tiles = extract_l2_tiles(l2, positions, (16, 16))
    assert l2_tiles.shape == (5, 16, 16)

    # the L2 window must be the SAME pixels under the SAME augmentation
    for t, pos in enumerate(positions):
        raw_spec = z[pos.i:pos.i + 16, pos.j:pos.j + 16]
        want = apply_augmentation(raw_spec.copy(), pos.flip_h, pos.flip_v,
                                  pos.rotation)
        np.testing.assert_array_equal(tiles[t], want)
        raw_l2 = l2[pos.i:pos.i + 16, pos.j:pos.j + 16]
        want_l2 = apply_augmentation(raw_l2.copy(), pos.flip_h, pos.flip_v,
                                     pos.rotation)
        np.testing.assert_array_equal(l2_tiles[t], want_l2)


def test_extract_tiles_too_small_returns_none(rng):
    z = rng.standard_normal((8, 8, 2)).astype(np.float32)
    tiles, positions = extract_tiles_with_positions(z, (16, 16), 3, rng)
    assert tiles is None and positions is None


def test_shard_roundtrip(tmp_path, rng):
    tiles = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    save_tile_shard(tmp_path / "t.npy", tiles)
    np.testing.assert_array_equal(load_tile_shard(tmp_path / "t.npy"), tiles)


def test_shard_pt_interop(tmp_path, rng):
    torch = pytest.importorskip("torch")
    tiles = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    torch.save(torch.from_numpy(tiles), tmp_path / "t.pt")
    np.testing.assert_array_equal(load_tile_shard(tmp_path / "t.pt"), tiles)


def test_random_buffer():
    buf = RandomBuffer(np.random.default_rng(0))
    for i in range(10):
        buf.put(i)
    seen = sorted(buf.get() for _ in range(10))
    assert seen == list(range(10))
    with pytest.raises(IndexError):
        buf.get()


def test_tile_loader_stream(tmp_path):
    make_tile_shards(tmp_path, n_files=3, tiles_per_file=8, tile=8,
                     n_spectral=4)
    loader = TileLoader(tmp_path, batch_size=4, min_buffer_size=8, seed=0)
    try:
        for _ in range(5):
            batch = next(loader)
            assert batch.shape == (4, 8, 8, 4)
            assert batch.dtype == np.float32
    finally:
        loader.close()


def test_tile_loader_with_l2(tmp_path):
    products = ["NO2", "CLDO4"]
    make_tile_shards(tmp_path, n_files=2, tiles_per_file=8, tile=8,
                     n_spectral=4, l2_products=products)
    loader = TileLoader(tmp_path, batch_size=4, min_buffer_size=8,
                        l2_products=products, seed=0)
    try:
        batch = next(loader)
        assert set(batch) == {"spectral", "NO2", "CLDO4"}
        assert batch["spectral"].shape == (4, 8, 8, 4)
        assert batch["NO2"].shape == (4, 8, 8)
    finally:
        loader.close()


def test_granule_corpus_layout(tmp_path):
    paths = make_granule_corpus(tmp_path, n_granules=2, n_mirror=20,
                                n_track=24, n_spectral=4,
                                l2_products=["NO2"])
    l1_files = sorted((paths["l1"] / "raw").glob("*.nc"))
    assert len(l1_files) == 2
    for f in l1_files:
        l2_name = l2_filename_for(f.name, "NO2")
        assert (paths["NO2"] / "raw" / l2_name).exists()


def test_device_tile_buffer(tmp_path):
    from tempo_tpu.data.device_buffer import DeviceTileBuffer

    make_tile_shards(tmp_path, n_files=4, tiles_per_file=8, tile=8,
                     n_spectral=4, seed=1)
    buf = DeviceTileBuffer(tmp_path, batch_size=4, slots=2, swap_every=2,
                           seed=0)
    try:
        seen = []
        for _ in range(8):  # crosses several swap boundaries
            batch = buf.__next__()
            assert batch.shape == (4, 8, 8, 4)
            seen.append(np.asarray(batch))
        stacked = np.stack(seen)
        assert np.isfinite(stacked).all()
        # batches differ (random gather, not a constant slice)
        assert not np.array_equal(seen[0], seen[1])
    finally:
        buf.close()


def test_device_tile_buffer_distribution(tmp_path):
    """Every resident tile must be reachable: over many draws from a single
    static pool, all (slot, tile) pairs appear."""
    from tempo_tpu.data.device_buffer import DeviceTileBuffer

    make_tile_shards(tmp_path, n_files=1, tiles_per_file=8, tile=4,
                     n_spectral=2, seed=2)
    buf = DeviceTileBuffer(tmp_path, batch_size=16, slots=2,
                           swap_every=10_000, seed=0)
    try:
        signatures = set()
        for _ in range(40):
            batch = np.asarray(buf.__next__())
            for row in batch.reshape(16, -1):
                signatures.add(row.tobytes())
        assert len(signatures) == 8  # all 8 resident tiles sampled
    finally:
        buf.close()


def test_device_tile_buffer_multichip(tmp_path):
    """With a mesh, the pool replicates and each gathered batch is sharded
    on its leading axis — the device buffer feeds DP training directly."""
    import jax

    from tempo_tpu.data.device_buffer import DeviceTileBuffer
    from tempo_tpu.parallel.mesh import batch_sharding, create_mesh

    make_tile_shards(tmp_path, n_files=2, tiles_per_file=8, tile=8,
                     n_spectral=4, seed=3)
    mesh = create_mesh()
    buf = DeviceTileBuffer(tmp_path, batch_size=16, slots=2, swap_every=4,
                           seed=0, mesh=mesh)
    try:
        for _ in range(6):
            batch = buf.__next__()
            assert batch.shape == (16, 8, 8, 4)
            assert batch.sharding == batch_sharding(mesh)
            assert np.isfinite(np.asarray(batch)).all()
    finally:
        buf.close()


def test_device_tile_buffer_reproducible(tmp_path):
    """Same seed => identical batch stream across runs: both the gather
    indices and the shard-swap schedule derive from the seed, and swaps
    apply at deterministic batch boundaries."""
    from tempo_tpu.data.device_buffer import DeviceTileBuffer

    make_tile_shards(tmp_path, n_files=6, tiles_per_file=8, tile=8,
                     n_spectral=4, seed=5)

    def stream(seed, n):
        buf = DeviceTileBuffer(tmp_path, batch_size=4, slots=2, swap_every=2,
                               seed=seed)
        try:
            return [np.asarray(next(buf)) for _ in range(n)]
        finally:
            buf.close()

    a = stream(7, 12)  # 12 batches cross several swap boundaries
    b = stream(7, 12)
    c = stream(8, 12)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_device_tile_buffer_l2_dict_batches(tmp_path):
    """L2 mode: the pool is a {spectral, <product>} pytree and every gather
    uses the SAME (slot, tile) indices for all leaves — checked by encoding
    the tile id into the values of both the spectral and L2 shards."""
    from tempo_tpu.data.device_buffer import DeviceTileBuffer

    products = ["NO2", "CLDO4"]
    for i in range(3):
        ids = 100.0 * i + np.arange(8, dtype=np.float32)
        spectral = np.broadcast_to(ids[:, None, None, None],
                                   (8, 8, 8, 4)).copy()
        np.save(tmp_path / f"{i:05d}.npy", spectral)
        for p in products:
            (tmp_path / f"l2_{p}").mkdir(exist_ok=True)
            l2 = np.broadcast_to(ids[:, None, None], (8, 8, 8)).copy()
            np.save(tmp_path / f"l2_{p}" / f"{i:05d}.npy", l2)

    buf = DeviceTileBuffer(tmp_path, batch_size=4, slots=2, swap_every=3,
                           seed=0, l2_products=products)
    try:
        for _ in range(8):
            batch = next(buf)
            assert set(batch) == {"spectral", "NO2", "CLDO4"}
            assert batch["spectral"].shape == (4, 8, 8, 4)
            spec_ids = np.asarray(batch["spectral"])[:, 0, 0, 0]
            for p in products:
                assert batch[p].shape == (4, 8, 8)
                np.testing.assert_array_equal(
                    np.asarray(batch[p])[:, 0, 0], spec_ids)
    finally:
        buf.close()


def test_device_tile_buffer_l2_nan_passthrough(tmp_path):
    """NaNs in L2 shards survive the device gather (the masked loss needs
    them) while spectral data stays finite."""
    from tempo_tpu.data.device_buffer import DeviceTileBuffer

    make_tile_shards(tmp_path, n_files=2, tiles_per_file=8, tile=8,
                     n_spectral=4, l2_products=["NO2"], seed=6)
    buf = DeviceTileBuffer(tmp_path, batch_size=16, slots=2, swap_every=100,
                           seed=0, l2_products=["NO2"])
    try:
        saw_nan = False
        for _ in range(5):
            batch = next(buf)
            assert np.isfinite(np.asarray(batch["spectral"])).all()
            saw_nan = saw_nan or bool(np.isnan(np.asarray(batch["NO2"])).any())
        assert saw_nan  # make_tile_shards plants ~5% NaNs per L2 shard
    finally:
        buf.close()


def test_load_config_expands_env(tmp_path, monkeypatch):
    """configs/demo/ anchors paths on ${DATA_DIR}; unset variables must
    fail fast rather than produce literal '${...}' paths."""
    import pytest

    from tempo_tpu.utils.config import load_config

    cfg = tmp_path / "c.yaml"
    cfg.write_text('output_dir: "${TEMPO_TEST_ROOT}/run"\nseed: 1\n'
                   'paths: ["${TEMPO_TEST_ROOT}/a", plain]\n')
    monkeypatch.setenv("TEMPO_TEST_ROOT", "/data/x")
    c = load_config(cfg)
    assert c["output_dir"] == "/data/x/run"
    assert c["paths"] == ["/data/x/a", "plain"]
    assert c["seed"] == 1

    monkeypatch.delenv("TEMPO_TEST_ROOT")
    with pytest.raises(ValueError, match="unset environment variable"):
        load_config(cfg)

    # bare $VAR: expands when set, literal pass-through when unset (config
    # values like '$1' field refs must not be rejected); $$ escapes to $
    cfg2 = tmp_path / "c2.yaml"
    cfg2.write_text('a: "$TEMPO_TEST_ROOT/run"\nb: "awk $1 costs $$5"\n')
    monkeypatch.setenv("TEMPO_TEST_ROOT", "/data/y")
    c2 = load_config(cfg2)
    assert c2["a"] == "/data/y/run"
    assert c2["b"] == "awk $1 costs $5"
    monkeypatch.delenv("TEMPO_TEST_ROOT")
    assert load_config(cfg2)["a"] == "$TEMPO_TEST_ROOT/run"

"""Native tile-IO runtime: build, correctness of the threaded gather (f32 and
f16-widening), and the loader integration with memory-mapped shards."""

import numpy as np

from tempo_tpu.data.loader import TileLoader
from tempo_tpu.data.native import gather_batch, native_available
from tempo_tpu.data.tiles import load_tile_shard, save_tile_shard


def test_native_library_builds():
    assert native_available(), "g++ build of native/tileio.cpp failed"


def test_gather_f32(rng):
    tiles = [rng.standard_normal((8, 8, 4)).astype(np.float32)
             for _ in range(10)]
    got = gather_batch(tiles, n_threads=3)
    np.testing.assert_array_equal(got, np.stack(tiles))
    assert got.dtype == np.float32


def test_gather_f16_widens(rng):
    tiles = [rng.standard_normal((8, 8, 4)).astype(np.float16)
             for _ in range(6)]
    # exercise specials: subnormal, inf, nan, zero
    tiles[0][0, 0, 0] = np.float16(6e-8)   # subnormal
    tiles[0][0, 0, 1] = np.float16(np.inf)
    tiles[0][0, 0, 2] = np.float16(np.nan)
    tiles[0][0, 0, 3] = np.float16(-0.0)
    got = gather_batch(tiles, n_threads=2)
    want = np.stack(tiles).astype(np.float32)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    mask = ~np.isnan(want)
    np.testing.assert_array_equal(got[mask], want[mask])


def test_gather_from_mmap_views(tmp_path, rng):
    data = rng.standard_normal((12, 8, 8, 4)).astype(np.float32)
    save_tile_shard(tmp_path / "s.npy", data)
    shard = load_tile_shard(tmp_path / "s.npy", mmap=True)
    views = [shard[i] for i in (3, 7, 1, 11)]
    got = gather_batch(views, n_threads=2)
    np.testing.assert_array_equal(got, data[[3, 7, 1, 11]])


def test_gather_fallback_mixed_dtype(rng):
    tiles = [rng.standard_normal((4, 4)).astype(np.float32),
             rng.standard_normal((4, 4)).astype(np.float64)]
    got = gather_batch(tiles)
    np.testing.assert_allclose(got, np.stack(tiles).astype(np.float32),
                               rtol=1e-6)


def test_loader_with_f16_shards(tmp_path, rng):
    for i in range(2):
        tiles = rng.standard_normal((8, 8, 8, 4)).astype(np.float16)
        save_tile_shard(tmp_path / f"{i:05d}.npy", tiles, dtype=np.float16)
    loader = TileLoader(tmp_path, batch_size=4, min_buffer_size=8, seed=0)
    try:
        batch = next(loader)
        assert batch.dtype == np.float32
        assert batch.shape == (4, 8, 8, 4)
        assert np.isfinite(batch).all()
    finally:
        loader.close()

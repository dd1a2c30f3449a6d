"""Input-pipeline sources (SURVEY.md §3 #16): synthetic, wav-dir, grain."""

import os

import numpy as np
import pytest

from nsc_tpu.train import data as D
from nsc_tpu.utils import audio


@pytest.fixture()
def wav_dir(tmp_path):
    for i in range(5):
        audio.save_wav(
            str(tmp_path / f"{i}.wav"),
            np.random.RandomState(i).randn(8000).astype(np.float32) * 0.1,
            16_000,
        )
    return str(tmp_path)


def test_synthetic_deterministic():
    a = next(D.SyntheticSource(16_000, seed=5).batches(3, 1600))
    b = next(D.SyntheticSource(16_000, seed=5).batches(3, 1600))
    assert a.shape == (3, 1600) and np.allclose(a, b)
    assert float(np.abs(a).max()) <= 1.0


def test_wav_dir_source_crops(wav_dir):
    src = D.WavDirectorySource(wav_dir, 16_000, seed=0)
    batch = next(src.batches(4, 3200))
    assert batch.shape == (4, 3200) and np.isfinite(batch).all()


def test_grain_source_batches_and_determinism(wav_dir):
    src = D.make_source("grain:" + wav_dir, 16_000, seed=3)
    assert isinstance(src, D.GrainWavSource)
    it = src.batches(4, 3200)
    b1, b2 = next(it), next(it)
    assert b1.shape == (4, 3200) and np.isfinite(b1).all()
    assert not np.allclose(b1, b2)  # stream advances
    # same seed -> identical stream (deterministic shuffling + crops)
    it2 = D.make_source("grain:" + wav_dir, 16_000, seed=3).batches(4, 3200)
    np.testing.assert_allclose(next(it2), b1)


def test_grain_source_shards_files(wav_dir):
    s0 = D.GrainWavSource(wav_dir, 16_000, shard_index=0, shard_count=2)
    s1 = D.GrainWavSource(wav_dir, 16_000, shard_index=1, shard_count=2)
    assert set(s0._paths).isdisjoint(s1._paths)
    assert len(s0._paths) + len(s1._paths) == 5


def test_grain_source_shard_validation(wav_dir):
    """ADVICE r2: index without count raises; more hosts than files
    round-robins one file per host instead of silently serving the FULL
    corpus to an empty shard."""
    with pytest.raises(ValueError, match="together"):
        D.GrainWavSource(wav_dir, 16_000, shard_index=1)
    with pytest.raises(ValueError, match="together"):
        D.GrainWavSource(wav_dir, 16_000, shard_count=2)
    with pytest.raises(ValueError, match="not in"):
        D.GrainWavSource(wav_dir, 16_000, shard_index=2, shard_count=2)
    # 8 hosts, 5 files: every host gets exactly one wrapped file
    shards = [
        D.GrainWavSource(wav_dir, 16_000, shard_index=i, shard_count=8)._paths
        for i in range(8)
    ]
    assert all(len(s) == 1 for s in shards)
    assert shards[0] != shards[1]
    assert shards[5] == shards[0]  # wraps: 5 % 5 == 0


def test_pooled_source_spec_batches_and_determinism():
    src = D.make_source("synthetic:pool=24", 16_000, seed=9)
    assert isinstance(src, D.PooledSource)
    it = src.batches(4, 1600)
    b1, b2 = next(it), next(it)
    assert b1.shape == (4, 1600) and b1.dtype == np.float32
    assert float(np.abs(b1).max()) <= 1.0
    assert not np.allclose(b1, b2)  # sampler advances
    it2 = D.make_source("synthetic:pool=24", 16_000, seed=9).batches(4, 1600)
    np.testing.assert_allclose(next(it2), b1)


def test_pooled_source_disk_cache_roundtrip(tmp_path):
    src = D.make_source("synthetic:pool=8", 16_000, seed=2)
    src.set_cache_dir(str(tmp_path))
    b1 = next(src.batches(2, 800))
    cache_files = [f for f in os.listdir(tmp_path) if f.endswith(".npy")]
    assert len(cache_files) == 1
    # a fresh instance must LOAD the pool (byte-identical batches), not
    # regenerate it — overwrite the cache to prove the load path is taken
    pool = np.load(tmp_path / cache_files[0])
    src2 = D.make_source("synthetic:pool=8", 16_000, seed=2)
    src2.set_cache_dir(str(tmp_path))
    b2 = next(src2.batches(2, 800))
    np.testing.assert_allclose(b2, b1)
    np.testing.assert_allclose(src2._pool, pool)


def test_prefetcher_passthrough_and_close():
    it = iter([np.ones(2), np.zeros(2)])
    pf = D.Prefetcher(it)
    got = [next(pf), next(pf)]
    assert np.allclose(got[0], 1) and np.allclose(got[1], 0)
    with pytest.raises(StopIteration):
        next(pf)
    pf.close()


def test_prefetcher_surfaces_worker_error():
    def bad():
        yield np.ones(2)
        raise RuntimeError("decode failed")

    pf = D.Prefetcher(bad())
    next(pf)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(pf)

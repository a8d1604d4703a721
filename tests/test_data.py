"""Data pipeline tests: record shard round-trip, bucketed loader static
shapes, seeded shuffle determinism, sharded (multi-host) iteration."""

import os

import numpy as np
import pytest

from vaenar_tts_tpu.data import (
    BucketedLoader,
    RecordShardReader,
    RecordShardWriter,
    RecordWriter,
    list_shards,
    pad_to_multiple,
)


def make_corpus_dir(tmp_path, n=20, num_mels=80, seed=0):
    """Build a fake extracted-features directory (texts/, mels/, lists)."""
    rng = np.random.default_rng(seed)
    (tmp_path / "texts").mkdir()
    (tmp_path / "mels").mkdir()
    fids = [f"utt{i:04d}" for i in range(n)]
    for i, fid in enumerate(fids):
        tl = int(rng.integers(5, 40))
        ml = int(rng.integers(30, 400))
        np.save(tmp_path / "texts" / f"{fid}.npy",
                rng.integers(0, 43, tl).astype(np.int32))
        np.save(tmp_path / "mels" / f"{fid}.npy",
                rng.standard_normal((ml, num_mels)).astype(np.float32))
    ntrain = n - 4
    (tmp_path / "train.txt").write_text("\n".join(fids[:ntrain]) + "\n")
    (tmp_path / "dev.txt").write_text("\n".join(fids[ntrain:ntrain + 2]) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(fids[ntrain + 2:]) + "\n")
    return fids


class TestRecords:
    def test_shard_roundtrip(self, tmp_path, rng):
        path = str(tmp_path / "test-0.vrs")
        w = RecordShardWriter(path, num_mels=8)
        texts = [rng.integers(0, 43, n).astype(np.int32) for n in (5, 9, 3)]
        mels = [rng.standard_normal((n, 8)).astype(np.float32)
                for n in (50, 31, 77)]
        for i, (t, m) in enumerate(zip(texts, mels)):
            w.add(f"utt{i}", t, m)
        w.close()
        r = RecordShardReader(path)
        assert len(r) == 3
        for i in range(3):
            u = r.get(i)
            assert u.fid == f"utt{i}"
            np.testing.assert_array_equal(u.text, texts[i])
            np.testing.assert_allclose(u.mel, mels[i])

    def test_writer_splits_train(self, tmp_path):
        make_corpus_dir(tmp_path, n=20)
        save = tmp_path / "records"
        w = RecordWriter(str(tmp_path), str(save), train_split=4, num_mels=80)
        paths = w.write_all()
        assert len(paths["train"]) == 4
        assert len(paths["dev"]) == 1
        assert len(list_shards(str(save), "train")) == 4
        # all 16 train utterances present across shards, round-robin
        total = sum(len(RecordShardReader(p)) for p in paths["train"])
        assert total == 16


class TestLoader:
    @pytest.fixture
    def shards(self, tmp_path):
        make_corpus_dir(tmp_path, n=30)
        save = tmp_path / "records"
        w = RecordWriter(str(tmp_path), str(save), train_split=2, num_mels=80)
        w.write_all()
        return list_shards(str(save), "train")

    def test_static_bucket_shapes(self, shards):
        loader = BucketedLoader(shards, batch_size=4, mel_bucket=120,
                                text_bucket=32, seed=1)
        for b in loader.epoch(0):
            assert b.texts.shape[0] == 4
            assert b.texts.shape[1] % 32 == 0
            assert b.mels.shape[1] % 120 == 0
            assert b.mels.shape[1] >= b.mel_lengths.max()
            # mel padded region must be zero
            for i in range(b.n_valid):
                assert np.all(b.mels[i, b.mel_lengths[i]:] == 0)

    def test_seeded_shuffle_deterministic(self, shards):
        l1 = BucketedLoader(shards, batch_size=4, seed=7)
        l2 = BucketedLoader(shards, batch_size=4, seed=7)
        fids1 = [b.fids for b in l1.epoch(3)]
        fids2 = [b.fids for b in l2.epoch(3)]
        assert fids1 == fids2
        fids_other_epoch = [b.fids for b in l1.epoch(4)]
        assert fids1 != fids_other_epoch  # reshuffled across epochs

    def test_covers_all_utterances(self, shards):
        loader = BucketedLoader(shards, batch_size=4, seed=0)
        seen = set()
        for b in loader.epoch(0):
            seen.update(b.fids[:b.n_valid])
        assert len(seen) == loader.num_utterances

    def test_multihost_sharding_partitions_batches(self, shards):
        full = BucketedLoader(shards, batch_size=4, seed=5, drop_last=True)
        parts = [BucketedLoader(shards, batch_size=4, seed=5, drop_last=True,
                                shard_index=i, shard_count=2)
                 for i in range(2)]
        all_batches = sorted(tuple(b.fids) for b in full.epoch(1))
        part_batches = sorted(
            tuple(b.fids) for p in parts for b in p.epoch(1))
        assert all_batches == part_batches  # disjoint + complete
        assert abs(len(parts[0]) - len(parts[1])) <= 1

    def test_shape_census_small(self, shards):
        loader = BucketedLoader(shards, batch_size=4, seed=0)
        census = loader.shape_census()
        assert sum(census.values()) == len(loader)
        # sorted-by-length bucketing keeps distinct shapes low
        assert len(census) <= 6

    def test_shape_schedule_matches_epoch(self, shards):
        loader = BucketedLoader(shards, batch_size=4, seed=9)
        sched = loader.epoch_shape_schedule(2)
        batches = list(loader.epoch(2))
        assert len(sched) == len(batches)
        for row, b in zip(sched, batches):
            assert (int(row[0]), int(row[1])) == b.shape_key

    def test_shape_schedule_pad_and_truncate(self, shards):
        loader = BucketedLoader(shards, batch_size=4, seed=9)
        n = len(loader)
        longer = loader.epoch_shape_schedule(0, n_steps=n + 3)
        assert len(longer) == n + 3
        assert np.all(longer[n:] == longer[n - 1])  # repeats the last row
        shorter = loader.epoch_shape_schedule(0, n_steps=n - 1)
        assert len(shorter) == n - 1

    def test_scheduled_epoch_pads_to_schedule(self, shards):
        loader = BucketedLoader(shards, batch_size=4, seed=9)
        sched = loader.epoch_shape_schedule(1)
        sched = sched + np.asarray([[32, 120]])  # pretend a peer needs more
        batches = list(loader.epoch(1, shape_schedule=sched))
        assert len(batches) == len(sched)
        for row, b in zip(sched, batches):
            assert b.shape_key == (int(row[0]), int(row[1]))
            assert np.all(b.mels[0, b.mel_lengths[0]:] == 0)
        # truncated schedule caps the iteration (lockstep step cap)
        assert len(list(loader.epoch(1, shape_schedule=sched[:2]))) == 2

    def test_repad_batch(self, shards):
        from vaenar_tts_tpu.data.loader import repad_batch
        loader = BucketedLoader(shards, batch_size=4, seed=9)
        b = next(iter(loader.epoch(0)))
        bigger = repad_batch(b, b.texts.shape[1] + 32, b.mels.shape[1] + 120)
        assert bigger.shape_key == (b.texts.shape[1] + 32,
                                    b.mels.shape[1] + 120)
        assert np.array_equal(bigger.texts[:, :b.texts.shape[1]], b.texts)
        assert np.array_equal(bigger.mels[:, :b.mels.shape[1]], b.mels)
        assert np.array_equal(bigger.mel_lengths, b.mel_lengths)
        smaller = repad_batch(b, 32, 120)
        assert smaller.shape_key == (32, 120)
        assert smaller.mel_lengths.max() <= 120  # clamped


def test_pad_to_multiple():
    assert pad_to_multiple(1, 120) == 120
    assert pad_to_multiple(120, 120) == 120
    assert pad_to_multiple(121, 120) == 240


def test_empty_shard_reads_cleanly(tmp_path):
    path = str(tmp_path / "train-0.vrs")
    w = RecordShardWriter(path, num_mels=8)
    w.close()
    r = RecordShardReader(path)
    assert len(r) == 0


def test_float16_records_roundtrip(tmp_path, rng):
    """fp16 storage: loader upcasts, native packer falls back to numpy."""
    make_corpus_dir(tmp_path, n=10)
    save = tmp_path / "rec16"
    RecordWriter(str(tmp_path), str(save), train_split=1, num_mels=80,
                 mel_dtype="float16").write_all()
    shards = list_shards(str(save), "train")
    r = RecordShardReader(shards[0])
    u = r.get(0)
    assert u.mel.dtype == np.float32  # reader upcasts
    loader = BucketedLoader(shards, batch_size=2, seed=0)
    b = next(iter(loader.epoch(0)))
    assert b.mels.dtype == np.float32
    # values match the fp32 originals to fp16 precision
    orig = np.load(tmp_path / "mels" / f"{b.fids[0]}.npy")
    np.testing.assert_allclose(b.mels[0, :b.mel_lengths[0]], orig.astype(
        np.float16).astype(np.float32), atol=1e-6)

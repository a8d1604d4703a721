"""Native C++ batch assembler: builds, loads, and produces byte-identical
batches to the NumPy fallback."""

import numpy as np
import pytest

from vaenar_tts_tpu.data import BucketedLoader, RecordWriter, list_shards
from vaenar_tts_tpu.native import get_batchpack
from tests.test_data import make_corpus_dir


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    make_corpus_dir(root, n=24)
    RecordWriter(str(root), str(root / "rec"), train_split=3,
                 num_mels=80).write_all()
    return list_shards(str(root / "rec"), "train")


def test_library_builds():
    assert get_batchpack() is not None, "g++ build of batchpack.cc failed"


def test_native_matches_numpy(shards):
    fast = BucketedLoader(shards, batch_size=4, seed=9)
    slow = BucketedLoader(shards, batch_size=4, seed=9)
    # force the numpy path on `slow`
    slow._pack_native = lambda *a, **k: False
    for bf, bs in zip(fast.epoch(2), slow.epoch(2)):
        assert bf.fids == bs.fids
        np.testing.assert_array_equal(bf.texts, bs.texts)
        np.testing.assert_array_equal(bf.mels, bs.mels)
        np.testing.assert_array_equal(bf.text_lengths, bs.text_lengths)
        np.testing.assert_array_equal(bf.mel_lengths, bs.mel_lengths)


def test_native_handles_partial_batches(shards):
    loader = BucketedLoader(shards, batch_size=7, seed=1)  # 18 train utts
    seen = 0
    for b in loader.epoch(0):
        assert b.texts.shape[0] == 7  # repeat-padded to full batch
        seen += b.n_valid
    assert seen == loader.num_utterances

"""Corpus preprocessing tests with synthetic LJSpeech / DataBaker corpora:
text processing, split stratification, mel extraction, idempotent resume."""

import os
import pickle

import numpy as np
import pytest
from scipy.io import wavfile

from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.data.corpus import DataBakerCorpus, LJSpeechCorpus


def make_lj_corpus(root, n=12, sr=22050):
    root.mkdir(exist_ok=True)
    lines = []
    rng = np.random.default_rng(0)
    sentences = [
        "Hello world.", "The quick brown fox.", "Printing, in the only sense.",
        "It costs $5 today.", "Dr. Smith arrived in 1906.",
        "A much longer sentence with many more characters to process here.",
    ]
    for i in range(n):
        fid = f"LJ001-{i:04d}"
        text = sentences[i % len(sentences)]
        lines.append(f"{fid}|{text}|{text}")
        dur = 0.3 + 0.1 * (i % 5)
        t = np.arange(int(dur * sr)) / sr
        wav = (0.3 * np.sin(2 * np.pi * 220 * (1 + i % 3) * t)
               + 0.01 * rng.standard_normal(len(t)))
        wavfile.write(str(root / f"{fid}.wav"), sr,
                      (wav * 32767).astype(np.int16))
    (root / "metadata.csv").write_text("\n".join(lines) + "\n",
                                       encoding="utf-8")


class TestLJSpeechCorpus:
    @pytest.fixture
    def corpus(self, tmp_path):
        data = tmp_path / "LJSpeech"
        data.mkdir()
        make_lj_corpus(data)
        hp = get_config("ljspeech")
        return LJSpeechCorpus(str(data), str(tmp_path / "feats"), hp)

    def test_full_extraction(self, corpus):
        corpus.feature_extraction(num_workers=1)
        # texts.pkl + per-utt npys + split lists + mels all exist
        assert os.path.isfile(corpus.text_dict_f)
        with open(corpus.text_dict_f, "rb") as f:
            td = pickle.load(f)
        assert len(td) == 12
        for fid, seq in td.items():
            assert os.path.isfile(os.path.join(corpus.text_dir, f"{fid}.npy"))
            assert os.path.isfile(os.path.join(corpus.mel_dir, f"{fid}.npy"))
            mel = np.load(os.path.join(corpus.mel_dir, f"{fid}.npy"))
            assert mel.ndim == 2 and mel.shape[1] == 80  # [frames, mels]
            assert seq[0] == corpus.tokenizer.symbol_to_id["^"]
        n_train = sum(1 for _ in open(corpus.train_list_f))
        n_dev = sum(1 for _ in open(corpus.dev_list_f))
        n_test = sum(1 for _ in open(corpus.test_list_f))
        assert n_train + n_dev + n_test == 12
        assert n_dev >= 1 and n_test >= 1

    def test_resume_is_idempotent(self, corpus):
        corpus.feature_extraction(num_workers=1)
        mtime = os.path.getmtime(corpus.text_dict_f)
        corpus.feature_extraction(num_workers=1)  # must detect + skip
        assert os.path.getmtime(corpus.text_dict_f) == mtime

    def test_text_numericization(self, corpus):
        seq = corpus.text_to_array("Hello World")
        assert corpus.tokenizer.decode(seq, strip_specials=True) == "hello world"


class TestDataBakerCorpus:
    def test_text_process(self, tmp_path):
        data = tmp_path / "databaker"
        data.mkdir()
        content = (
            "000001\t妈妈#1当时#1表示#3，儿子#1开心得#2像花儿#1一样#4。\n"
            "\tma1 ma1 dang1 shi2 biao3 shi4 er2 zi5 kai1 xin1 de5 xiang4 "
            "huar1 yi2 yang4\n"
            "000002\t你好#4。\n"
            "\tni3 hao3\n"
        )
        (data / "000001-010000.txt").write_text(content, encoding="utf-8")
        hp = get_config("databaker")
        corpus = DataBakerCorpus(str(data), str(tmp_path / "feats"), hp)
        os.makedirs(corpus.text_dir, exist_ok=True)
        os.makedirs(corpus.mel_dir, exist_ok=True)
        td = corpus.text_process()
        assert set(td.keys()) == {"000001", "000002"}
        decoded = corpus.tokenizer.decode(td["000002"], strip_specials=True)
        assert decoded == "ni3-hao3."  # SYL separator inside a prosodic word


class TestDeviceMelExtraction:
    def test_matches_host_path(self, tmp_path):
        """--device_mels output must match the host multiprocessing path."""
        data = tmp_path / "LJSpeech"
        data.mkdir()
        make_lj_corpus(data, n=5)
        hp = get_config("ljspeech")

        host = LJSpeechCorpus(str(data), str(tmp_path / "host"), hp)
        host.feature_extraction(num_workers=1)
        dev = LJSpeechCorpus(str(data), str(tmp_path / "dev"), hp)
        dev._validate_dir()
        dev.text_dict = dev.text_process()
        dev.dataset_split()
        dev.extract_mels(use_device=True)

        import glob
        host_mels = sorted(glob.glob(os.path.join(host.mel_dir, "*.npy")))
        assert host_mels
        for hm in host_mels:
            dm = os.path.join(dev.mel_dir, os.path.basename(hm))
            a, b = np.load(hm), np.load(dm)
            assert a.shape == b.shape, (hm, a.shape, b.shape)
            np.testing.assert_allclose(a, b, atol=5e-4)


def test_multiworker_preprocess_matches_single(tmp_path):
    """Two workers over a shared save_dir (worker 0: text+split+its wav
    slice+its shard slice; worker 1: waits on lists, its slices) produce
    byte-identical record shards to a single-worker run."""
    import filecmp

    from tests.test_data import make_corpus_dir  # texts/mels fixture
    from vaenar_tts_tpu.data.records import RecordWriter, list_shards

    # build one extracted-features dir, then write records two ways
    root = tmp_path / "feats"
    root.mkdir()
    make_corpus_dir(root, n=20, num_mels=16)

    single = tmp_path / "single"
    RecordWriter(str(root), str(single), train_split=4,
                 num_mels=16).write_all()
    multi = tmp_path / "multi"
    for w in (0, 1):
        RecordWriter(str(root), str(multi), train_split=4,
                     num_mels=16).write_all(worker_index=w, worker_count=2)

    for mode in ("train", "dev", "test"):
        a = [p.split("/")[-1] for p in list_shards(str(single), mode)]
        b = [p.split("/")[-1] for p in list_shards(str(multi), mode)]
        assert a == b, (mode, a, b)
        for name in a:
            assert filecmp.cmp(str(single / name), str(multi / name),
                               shallow=False), name


def test_multiworker_extraction_slices_are_disjoint_and_complete(tmp_path,
                                                                 monkeypatch):
    """Worker wav slices partition the corpus; a non-zero worker waits for
    worker 0's split lists."""
    import pytest as _pytest

    from vaenar_tts_tpu.configs.hparams import tiny_test_config
    from vaenar_tts_tpu.data.corpus import TextMelCorpus

    c = TextMelCorpus.__new__(TextMelCorpus)
    wavs = [f"/x/{i:03d}.wav" for i in range(10)]
    monkeypatch.setattr(TextMelCorpus, "get_wav_files", lambda self: wavs)
    seen = []
    import vaenar_tts_tpu.data.corpus as corpus_mod
    monkeypatch.setattr(corpus_mod, "_extract_one",
                        lambda args: seen.append(args[0]))
    c.mel_dir = str(tmp_path)
    c.hps = tiny_test_config()
    c.extract_mels(num_workers=1, worker_index=0, worker_count=3)
    c.extract_mels(num_workers=1, worker_index=1, worker_count=3)
    c.extract_mels(num_workers=1, worker_index=2, worker_count=3)
    assert sorted(seen) == sorted(wavs)
    assert len(set(seen)) == len(wavs)

    # waiting worker times out fast when worker 0 never ran
    c2 = TextMelCorpus.__new__(TextMelCorpus)
    c2.text_dict_f = str(tmp_path / "nope.pkl")
    c2.train_list_f = str(tmp_path / "train.txt")
    c2.dev_list_f = str(tmp_path / "dev.txt")
    c2.test_list_f = str(tmp_path / "test.txt")
    with _pytest.raises(TimeoutError):
        c2._wait_for_lists(timeout=0.1)

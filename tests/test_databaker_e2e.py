"""DataBaker (Mandarin) end-to-end slice: synthetic 16 kHz corpus with
prosody-labeled transcripts -> pinyin frontend -> records -> one train step
with the DataBaker preset shapes."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.data import RecordWriter, list_shards
from vaenar_tts_tpu.data.corpus import DataBakerCorpus


@pytest.fixture(scope="module")
def databaker_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("databaker")
    rng = np.random.default_rng(0)
    hanzi = ["妈妈#1当时#1表示#3，儿子#1开心得#2像花儿#1一样#4。",
             "你好#1世界#4。", "今天#1天气#2很好#4。"]
    pinyin = ["ma1 ma1 dang1 shi2 biao3 shi4 er2 zi5 kai1 xin1 de5 xiang4 "
              "huar1 yi2 yang4",
              "ni3 hao3 shi4 jie4",
              "jin1 tian1 tian1 qi4 hen3 hao3"]
    lines = []
    for i in range(9):
        fid = f"{i + 1:06d}"
        lines.append(f"{fid}\t{hanzi[i % 3]}")
        lines.append(f"\t{pinyin[i % 3]}")
        dur = 0.4 + 0.1 * (i % 3)
        t = np.arange(int(dur * 16000)) / 16000
        wav = 0.3 * np.sin(2 * np.pi * (180 + 20 * i) * t)
        wavfile.write(str(root / f"{fid}.wav"), 16000,
                      (wav * 32767).astype(np.int16))
    (root / "000001-010000.txt").write_text("\n".join(lines) + "\n",
                                            encoding="utf-8")
    return root


class TestDataBakerEndToEnd:
    def test_preprocess_and_records(self, databaker_root, tmp_path_factory):
        feats = tmp_path_factory.mktemp("db_feats")
        hp = get_config("databaker")
        corpus = DataBakerCorpus(str(databaker_root), str(feats), hp)
        corpus.feature_extraction(num_workers=1)
        assert len(corpus.text_dict) == 9
        # all ids tokenized within the 39-symbol vocab
        for seq in corpus.text_dict.values():
            assert max(seq) < hp.encoder.vocab_size
        paths = RecordWriter(str(feats), str(feats / "rec"), train_split=2,
                             num_mels=80).write_all()
        assert len(paths["train"]) == 2

        # one forward pass at DataBaker preset dims (tiny model)
        import dataclasses

        import jax
        import jax.numpy as jnp

        from vaenar_tts_tpu.configs.hparams import tiny_test_config
        from vaenar_tts_tpu.data import BucketedLoader
        from vaenar_tts_tpu.models import VAENAR
        from vaenar_tts_tpu.training.steps import init_model

        tiny = tiny_test_config(vocab_size=hp.encoder.vocab_size)
        loader = BucketedLoader(list_shards(str(feats / "rec"), "train"),
                                batch_size=2, mel_bucket=60, text_bucket=16,
                                seed=0)
        batch = next(iter(loader.epoch(0)))
        model = VAENAR(tiny)
        params, bs = init_model(tiny, model, 0, batch.texts.shape[1],
                                batch.mels.shape[1])
        outs, _ = model.apply(
            {"params": params, "batch_stats": bs},
            jnp.asarray(batch.texts), jnp.asarray(batch.mels),
            jnp.asarray(batch.mel_lengths), jnp.asarray(batch.text_lengths),
            reduction_factor=2, train=True, reduce_loss=True,
            rngs={"dropout": jax.random.key(0), "sample": jax.random.key(1)},
            mutable=["batch_stats"])
        _dec, mel_l2, kl, len_l2, _ = outs
        assert np.isfinite(float(mel_l2)) and np.isfinite(float(kl))

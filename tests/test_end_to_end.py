"""End-to-end slice (SURVEY.md section 7 step 5): synthetic corpus ->
records -> two epochs of the real train() driver -> checkpoint resume ->
batch inference -> Griffin-Lim wav bytes on disk."""

import os

import numpy as np
import pytest

from vaenar_tts_tpu.configs.hparams import tiny_test_config
from vaenar_tts_tpu.data import RecordWriter, list_shards
from tests.test_data import make_corpus_dir


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    make_corpus_dir(root, n=16, num_mels=80)
    RecordWriter(str(root), str(root / "records"), train_split=2,
                 num_mels=80).write_all()
    return root


HP = tiny_test_config().replace()


def _small_hp():
    hp = tiny_test_config()
    tr = hp.train
    import dataclasses
    return hp.replace(train=dataclasses.replace(
        tr, train_batch_size=4, test_batch_size=2, test_interval=1000))


class TestEndToEnd:
    def test_train_two_epochs_and_resume(self, workspace):
        from vaenar_tts_tpu.training.loop import train
        hp = _small_hp()
        data_dir = str(workspace / "records")
        model_dir = str(workspace / "ckpt")
        log_dir = str(workspace / "logs")
        state = train(hp, data_dir, model_dir, log_dir,
                      test_dir=str(workspace / "test"), max_epochs=3,
                      steps_per_epoch=2)
        # max_epochs is inclusive ("run through epoch N"); the reference's
        # exclusive range(step+1, epochs) applies to the preset only
        assert state.epoch == 3
        # metrics written
        assert os.path.isfile(os.path.join(log_dir, "train", "metrics.jsonl"))
        # resume: runs the remaining epoch only
        state2 = train(hp, data_dir, model_dir, log_dir,
                       test_dir=str(workspace / "test"), max_epochs=4,
                       steps_per_epoch=2)
        assert state2.epoch == 4

    def test_inference_artifacts(self, workspace):
        """Batch inference from the trained checkpoint produces trimmed mel
        files and playable wav bytes."""
        import jax
        import jax.numpy as jnp

        from vaenar_tts_tpu.audio.export import TestUtils
        from vaenar_tts_tpu.cli.inference import load_model_state
        from vaenar_tts_tpu.data import BucketedLoader
        from vaenar_tts_tpu.training.steps import make_inference_step

        hp = _small_hp()
        hp, model, params, batch_stats, epoch = load_model_state(
            hp, str(workspace / "ckpt"))
        inf = make_inference_step(hp, model)
        loader = BucketedLoader(
            list_shards(str(workspace / "records"), "test"), 2,
            mel_bucket=hp.dataset.mel_bucket,
            text_bucket=hp.dataset.text_bucket, shuffle=False)
        batch = next(iter(loader.epoch(0)))
        mels, pred_lens, _ = inf(params, batch_stats,
                                 jnp.asarray(batch.texts),
                                 jnp.asarray(batch.text_lengths),
                                 jax.random.key(0), reduction_factor=2,
                                 max_mel_length=240)
        mels = np.asarray(mels, np.float32)
        pred_lens = np.asarray(pred_lens)
        assert np.isfinite(mels).all()
        out_dir = str(workspace / "inference_out")
        tester = TestUtils(hp, out_dir)
        mel_paths = tester.write_mels(epoch, mels, pred_lens, batch.fids,
                                      "prior")
        assert all(os.path.isfile(p) for p in mel_paths)
        wav_paths = tester.synthesize_and_save_wavs(
            epoch, mels, np.minimum(pred_lens, 120), batch.fids, "prior")
        for p in wav_paths:
            assert os.path.getsize(p) > 1000  # non-trivial audio


def test_quality_metrics_in_test_artifacts(workspace, tmp_path, monkeypatch):
    """The periodic test eval writes mel-L1/MCD quality scalars."""
    import jax

    from vaenar_tts_tpu.audio.export import TestUtils
    from vaenar_tts_tpu.cli.inference import load_model_state
    from vaenar_tts_tpu.data import BucketedLoader
    from vaenar_tts_tpu.training.loop import _run_test_artifacts
    from vaenar_tts_tpu.training.steps import TrainState, make_test_step
    from vaenar_tts_tpu.utils.logging import MetricsWriter

    hp = _small_hp()
    hp, model, params, batch_stats, _ = load_model_state(
        hp, str(workspace / "ckpt"))
    state = TrainState(params, batch_stats, None, epoch=7)
    loader = BucketedLoader(
        list_shards(str(workspace / "records"), "test"), 2,
        mel_bucket=hp.dataset.mel_bucket, text_bucket=hp.dataset.text_bucket,
        shuffle=False)
    tester = TestUtils(hp, str(tmp_path / "arts"))
    # skip Griffin-Lim (slow, covered elsewhere)
    monkeypatch.setattr(tester, "synthesize_and_save_wavs",
                        lambda *a, **k: [])
    writer = MetricsWriter(str(tmp_path / "m"), use_tensorboard=False)
    _run_test_artifacts(hp, state, make_test_step(hp, model), loader, tester,
                        epoch=7, r=2, rng=jax.random.key(0),
                        metrics_writer=writer)
    writer.close()
    import json
    recs = [json.loads(l) for l in
            (tmp_path / "m" / "metrics.jsonl").read_text().splitlines()]
    assert recs and "test_mel_l1" in recs[-1] and "test_mcd_db" in recs[-1]
    assert np.isfinite(recs[-1]["test_mcd_db"])

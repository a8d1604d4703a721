"""In-training product-metric probe (training/probe.py).

The probe is the checkpoint-lottery answer (ALIGNMENT.md): every probed
epoch gets a free-text LER through the REAL inference path recorded to
ler_probe.jsonl, and the probed epoch is forced onto disk so it stays a
restorable selection candidate. Mechanics are tested on the tiny config;
the LER value itself is only meaningful on a toy-v2-trained model."""

import json
import os

import dataclasses
import pytest

from vaenar_tts_tpu.configs.hparams import tiny_test_config
from vaenar_tts_tpu.data import RecordWriter
from tests.test_data import make_corpus_dir


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("probe_e2e")
    make_corpus_dir(root, n=16, num_mels=80)
    RecordWriter(str(root), str(root / "records"), train_split=2,
                 num_mels=80).write_all()
    return root


def _small_hp():
    hp = tiny_test_config()
    return hp.replace(train=dataclasses.replace(
        hp.train, train_batch_size=4, test_batch_size=2,
        test_interval=1000, checkpoint_every_n_epochs=2))


def test_probe_records_ler_and_forces_checkpoints(workspace, tmp_path):
    from vaenar_tts_tpu.training.loop import train
    from vaenar_tts_tpu.training.probe import make_toy_ler_probe

    hp = _small_hp()
    out = str(tmp_path / "probe_wd")
    probe = make_toy_ler_probe(hp, out, n_texts=2, sample_seeds=1)
    model_dir = str(tmp_path / "ckpt")
    train(hp, str(workspace / "records"), model_dir,
          str(tmp_path / "logs"), test_dir=None, max_epochs=3,
          steps_per_epoch=2, probe=probe, probe_every=3)

    path = os.path.join(out, "ler_probe.jsonl")
    assert os.path.isfile(path)
    rows = [json.loads(l) for l in open(path)]
    assert [r["epoch"] for r in rows] == [3]
    assert all(0.0 <= r["probe_ler"] <= 1.0 for r in rows)
    # epoch 3 is NOT on the every-2 checkpoint cadence but was probed, so
    # the loop must have forced a save (restorable selection candidate)...
    assert os.path.isdir(os.path.join(model_dir, "3"))
    # ...and the probe scalars reach the dev metrics stream
    mpath = os.path.join(tmp_path, "logs", "dev", "metrics.jsonl")
    recs = [json.loads(l) for l in open(mpath)]
    assert any("probe_ler" in r.get("scalars", r) for r in recs)


def test_probe_failure_does_not_kill_training(workspace, tmp_path):
    from vaenar_tts_tpu.training.loop import train

    def bad_probe(epoch, state):
        raise RuntimeError("boom")

    hp = _small_hp()
    state = train(hp, str(workspace / "records"), str(tmp_path / "ckpt"),
                  str(tmp_path / "logs"), test_dir=None, max_epochs=2,
                  steps_per_epoch=2, probe=bad_probe, probe_every=1)
    assert state.epoch == 2


def test_probe_early_stop(workspace, tmp_path):
    from vaenar_tts_tpu.training.loop import train

    calls = []

    def stopping_probe(epoch, state):
        calls.append(epoch)
        return {"probe_ler": 0.05, "stop_training": True}

    hp = _small_hp()
    state = train(hp, str(workspace / "records"), str(tmp_path / "ckpt"),
                  str(tmp_path / "logs"), test_dir=None, max_epochs=5,
                  steps_per_epoch=2, probe=stopping_probe, probe_every=1)
    assert calls == [1]
    assert state.epoch == 1
    # the stop epoch is on disk (probe forces the save before stopping)
    import os
    assert os.path.isdir(os.path.join(tmp_path, "ckpt", "1"))

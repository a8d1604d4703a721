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
    # LER (Levenshtein/len(ref)) is unbounded ABOVE 1: a garbage-emitting
    # tiny model can insert more letters than the reference has
    import math
    assert all(r["probe_ler"] >= 0.0 and math.isfinite(r["probe_ler"])
               for r in rows)
    # the improving probe persisted a durable running-best export: a wedge
    # or OOM after this point cannot lose the best-probed weights
    assert os.path.isfile(os.path.join(out, "export_best.npz"))
    best = json.load(open(os.path.join(out, "export_best.json")))
    assert best["epoch"] == 3
    assert best["probe_ler"] == pytest.approx(rows[0]["probe_ler"], abs=1e-3)
    from vaenar_tts_tpu.utils.export import load_npz
    exported = load_npz(os.path.join(out, "export_best.npz"))
    assert exported["epoch"] == 3 and "params" in exported
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


def test_probe_start_skips_early_epochs(workspace, tmp_path):
    """probe_start gates the probe cadence: LER is measured uninformative
    (~1.0 flat) before the r-curriculum's final stage, so the lottery
    harness skips those probes to save chip time."""
    from vaenar_tts_tpu.training.loop import train

    seen = []

    def recording_probe(epoch, state):
        seen.append(epoch)
        return {"probe_ler": 1.0}

    hp = _small_hp()
    train(hp, str(workspace / "records"), str(tmp_path / "ckpt"),
          str(tmp_path / "logs"), test_dir=None, max_epochs=4,
          steps_per_epoch=2, probe=recording_probe, probe_every=1,
          probe_start=3)
    assert seen == [3, 4]


def test_dev_mcd_probe_records_and_exports(workspace, tmp_path):
    """Real-corpus probe (VERDICT r4 item 5): dev-set MCD-DTW through the
    inference path on the checkpoint cadence, same jsonl/early-stop/export
    contract as the toy LER probe."""
    from vaenar_tts_tpu.training.loop import train
    from vaenar_tts_tpu.training.probe import make_dev_mcd_probe

    hp = _small_hp()
    out = str(tmp_path / "probe_wd")
    probe = make_dev_mcd_probe(hp, str(workspace / "records"), out, n_utts=2)
    train(hp, str(workspace / "records"), str(tmp_path / "ckpt"),
          str(tmp_path / "logs"), test_dir=None, max_epochs=2,
          steps_per_epoch=2, probe=probe, probe_every=2)

    rows = [json.loads(l) for l in open(os.path.join(out, "mcd_probe.jsonl"))]
    assert [r["epoch"] for r in rows] == [2]
    assert rows[0]["probe_mcd_dtw"] > 0.0
    assert -1.0 <= rows[0]["probe_diag"] <= 1.0
    assert os.path.isfile(os.path.join(out, "export_best.npz"))
    best = json.load(open(os.path.join(out, "export_best.json")))
    assert best["epoch"] == 2
    # scalars reach the dev metrics stream
    mpath = os.path.join(tmp_path, "logs", "dev", "metrics.jsonl")
    recs = [json.loads(l) for l in open(mpath)]
    assert any("probe_mcd_dtw" in r.get("scalars", r) for r in recs)


def test_with_early_stop_wrapper(tmp_path):
    from vaenar_tts_tpu.training.probe import with_early_stop

    def probe(epoch, state):
        return {"probe_mcd_dtw": 3.0}

    wd = str(tmp_path)
    miss = with_early_stop(probe, "probe_mcd_dtw", 2.0, wd)(1, None)
    assert "stop_training" not in miss
    assert not os.path.exists(os.path.join(wd, "PROBE_STOP"))
    hit = with_early_stop(probe, "probe_mcd_dtw", 3.5, wd)(2, None)
    assert hit["stop_training"] is True
    assert open(os.path.join(wd, "PROBE_STOP")).read().startswith("2 ")


def test_best_exporter_resumes_from_history(tmp_path):
    """A restarted chunk must not clobber a better export from an earlier
    chunk (the ADVICE r4 retention scenario)."""
    from vaenar_tts_tpu.training.probe import _BestExporter

    class FakeState:
        params = {"w": __import__("numpy").zeros(3)}
        batch_stats = {}

    wd = str(tmp_path)
    ex = _BestExporter(wd, "probe_ler", "ler_probe.jsonl")
    assert ex.maybe_export(10, FakeState(), 0.5)
    assert not ex.maybe_export(20, FakeState(), 0.6)  # worse: no export
    # fresh process (chunk restart): picks the sidecar best back up
    ex2 = _BestExporter(wd, "probe_ler", "ler_probe.jsonl")
    assert ex2.best == pytest.approx(0.5)
    assert not ex2.maybe_export(30, FakeState(), 0.55)
    assert ex2.maybe_export(40, FakeState(), 0.4)
    assert json.load(open(os.path.join(wd, "export_best.json")))["epoch"] == 40


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

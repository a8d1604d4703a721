"""Utility-layer tests: Logger tee, MetricsWriter JSONL, checkpoint retention,
prefetch iterator, mfcc shape."""

import json
import os
import sys

import numpy as np
import pytest


class TestLogger:
    def test_tee(self, tmp_path, capsys):
        from vaenar_tts_tpu.utils.logging import Logger
        logger = Logger(str(tmp_path))
        old = sys.stdout
        try:
            sys.stdout = logger
            print("hello tee")
        finally:
            sys.stdout = old
        content = (tmp_path / "train.log").read_text()
        assert "hello tee" in content


class TestMetricsWriter:
    def test_jsonl(self, tmp_path):
        from vaenar_tts_tpu.utils.logging import MetricsWriter
        w = MetricsWriter(str(tmp_path), use_tensorboard=False)
        w.scalars(1, {"total": 1.5, "kl": 0.2})
        w.scalars(2, {"total": 1.2, "kl": 0.1})
        w.close()
        lines = [json.loads(l) for l in
                 (tmp_path / "metrics.jsonl").read_text().splitlines()]
        assert lines[0]["step"] == 1 and lines[0]["total"] == 1.5
        assert lines[1]["kl"] == pytest.approx(0.1)


class TestCheckpointRetention:
    def test_max_to_keep(self, tmp_path):
        import jax.numpy as jnp
        from vaenar_tts_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path / "c"), max_to_keep=2,
                                keep_every_n_hours=1e6)
        state = {"params": {"w": jnp.ones((4,))}, "epoch": 0}
        for e in range(5):
            state["epoch"] = e
            mgr.save(e, state)
        assert mgr.latest_epoch() == 4
        restored = mgr.restore(state, epoch=4)
        assert int(restored["epoch"]) == 4
        # old checkpoints pruned to max_to_keep (first may be pinned by the
        # keep_time_interval policy)
        kept = [d for d in os.listdir(tmp_path / "c") if d.isdigit()]
        assert len(kept) <= 3
        mgr.close()


class TestPrefetch:
    def test_order_and_completeness(self):
        from vaenar_tts_tpu.utils.prefetch import prefetch
        assert list(prefetch(range(100), depth=4)) == list(range(100))

    def test_propagates_errors(self):
        from vaenar_tts_tpu.utils.prefetch import prefetch

        def gen():
            yield 1
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            list(prefetch(gen()))


class TestMFCC:
    def test_shape(self):
        from vaenar_tts_tpu.audio.dsp import AudioProcessor
        from vaenar_tts_tpu.configs import get_config
        ap = AudioProcessor(get_config("ljspeech").audio)
        y = np.sin(2 * np.pi * 440 * np.arange(11025) / 22050).astype(np.float32)
        m = ap.mfcc(y)
        assert m.shape[0] == 3 * 13
        assert np.isfinite(m).all()


def test_device_vocoder_probe(monkeypatch):
    """Env override wins; otherwise only a direct-attached TPU qualifies
    (the CPU test backend must choose host threads)."""
    from vaenar_tts_tpu.audio.export import device_vocoder_capable
    monkeypatch.delenv("VAENAR_JAX_VOCODER", raising=False)
    assert device_vocoder_capable() is False  # CPU backend in tests
    monkeypatch.setenv("VAENAR_JAX_VOCODER", "1")
    assert device_vocoder_capable() is True
    monkeypatch.setenv("VAENAR_JAX_VOCODER", "0")
    assert device_vocoder_capable() is False

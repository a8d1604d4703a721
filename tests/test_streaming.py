"""Streaming vocoder: chunked Griffin-Lim with phase propagation must match
the whole-utterance path in length, preemphasis semantics, and quality.
(New capability beyond the reference, whose synthesis is whole-utterance
only: reference inference.py:148-164.)"""

import dataclasses

import numpy as np
import pytest

from vaenar_tts_tpu.audio.dsp import AudioProcessor
from vaenar_tts_tpu.audio.streaming import StreamingVocoder
from vaenar_tts_tpu.configs import get_config


@pytest.fixture
def cfg():
    base = get_config("ljspeech").audio
    return dataclasses.replace(base, num_freq=129, frame_length_sample=128,
                               frame_shift_sample=32, griffin_lim_iters=16)


def _mel(ap, cfg, dur=1.0):
    t = np.arange(int(dur * cfg.sample_rate)) / cfg.sample_rate
    y = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.25 * np.sin(2 * np.pi * 990 * t)).astype(np.float32)
    return ap.melspectrogram(ap.preemphasize(y)).T, y  # [frames, mels]


class TestStreamingVocoder:
    def test_length_and_chunk_count(self, cfg):
        ap = AudioProcessor(cfg)
        mel, _ = _mel(ap, cfg)
        sv = StreamingVocoder(ap, chunk_frames=100, context_frames=12)
        pieces = list(sv.stream(mel, np.random.default_rng(0)))
        n = mel.shape[0]
        assert len(pieces) == -(-n // 100)
        total = sum(len(p) for p in pieces)
        assert total == cfg.frame_shift_sample * (n - 1)

    def test_matches_full_utterance_quality(self, cfg):
        """The stitched stream reconstructs the source tones as well as the
        whole-utterance vocoder (spectral-convergence within 5% relative)."""
        ap = AudioProcessor(cfg)
        mel, y = _mel(ap, cfg)
        w_full = ap.inv_preemphasize(
            ap.inv_mel_spectrogram(mel.T, np.random.default_rng(0)))
        sv = StreamingVocoder(ap, chunk_frames=100, context_frames=16)
        w_stream = sv.synthesize(mel, np.random.default_rng(0))
        assert len(w_stream) == len(w_full)

        ref = np.abs(ap._stft(ap.preemphasize(y)))

        def err(w):
            m = np.abs(ap._stft(ap.preemphasize(np.asarray(w, np.float64))))
            k = min(m.shape[1], ref.shape[1])
            return (np.linalg.norm(ref[:, :k] - m[:, :k])
                    / np.linalg.norm(ref[:, :k]))

        assert err(w_stream) <= err(w_full) * 1.05 + 1e-6

    def test_deterministic(self, cfg):
        ap = AudioProcessor(cfg)
        mel, _ = _mel(ap, cfg, dur=0.5)
        sv = StreamingVocoder(ap, chunk_frames=64, context_frames=8)
        a = sv.synthesize(mel, np.random.default_rng(7))
        b = sv.synthesize(mel, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)

    def test_seams_are_continuous(self, cfg):
        """Sample-to-sample jumps at chunk joins must be no larger than the
        signal's own maximum derivative (no clicks)."""
        ap = AudioProcessor(cfg)
        mel, _ = _mel(ap, cfg)
        sv = StreamingVocoder(ap, chunk_frames=80, context_frames=16)
        pieces = list(sv.stream(mel, np.random.default_rng(3)))
        w = np.concatenate(pieces)
        joins = np.cumsum([len(p) for p in pieces])[:-1]
        d = np.abs(np.diff(w))
        assert max(d[j - 1] for j in joins) <= d.max() + 1e-9

    def test_single_chunk_covers_whole_utterance(self, cfg):
        """chunk >= n_frames degenerates to one piece of the full length."""
        ap = AudioProcessor(cfg)
        mel, _ = _mel(ap, cfg, dur=0.4)
        sv = StreamingVocoder(ap, chunk_frames=10_000)
        pieces = list(sv.stream(mel, np.random.default_rng(1)))
        assert len(pieces) == 1
        assert len(pieces[0]) == cfg.frame_shift_sample * (mel.shape[0] - 1)

    def test_no_preemphasis_config(self, cfg):
        cfg2 = dataclasses.replace(cfg, preemphasize=None)
        ap = AudioProcessor(cfg2)
        mel, _ = _mel(ap, cfg2, dur=0.4)
        w = StreamingVocoder(ap, chunk_frames=64).synthesize(
            mel, np.random.default_rng(2))
        assert np.isfinite(w).all()


class TestDeviceBackend:
    """backend='device' (jitted fixed-bucket GL window kernel,
    ops/griffin_lim.py::gl_window_fn) must deliver the same streaming
    contract as the host backend: exact lengths, continuous seams, and
    whole-utterance-grade quality. Runs on the CPU JAX backend here; the
    chip measurement lives in VOCODER.md."""

    def test_lengths_and_quality_match_host_contract(self, cfg):
        ap = AudioProcessor(cfg)
        mel, y = _mel(ap, cfg)
        w_full = ap.inv_preemphasize(
            ap.inv_mel_spectrogram(mel.T, np.random.default_rng(0)))
        sv = StreamingVocoder(ap, chunk_frames=100, context_frames=16,
                              backend="device")
        w_stream = sv.synthesize(mel, np.random.default_rng(0))
        assert len(w_stream) == len(w_full)

        ref = np.abs(ap._stft(ap.preemphasize(y)))

        def err(w):
            m = np.abs(ap._stft(ap.preemphasize(np.asarray(w, np.float64))))
            k = min(m.shape[1], ref.shape[1])
            return (np.linalg.norm(ref[:, :k] - m[:, :k])
                    / np.linalg.norm(ref[:, :k]))

        assert err(w_stream) <= err(w_full) * 1.05 + 1e-6

    def test_device_close_to_host_stream(self, cfg):
        """Same initial phase field -> the two backends converge to nearly
        the same waveform (they share the iteration math; edge analysis
        differs only in re-analysis padding)."""
        ap = AudioProcessor(cfg)
        mel, _ = _mel(ap, cfg, dur=0.6)
        host = StreamingVocoder(ap, chunk_frames=64, context_frames=8)
        dev = StreamingVocoder(ap, chunk_frames=64, context_frames=8,
                               backend="device")
        wh = host.synthesize(mel, np.random.default_rng(3))
        wd = dev.synthesize(mel, np.random.default_rng(3))
        assert len(wh) == len(wd)
        # correlation, not allclose: GL fixed points can drift apart a bit
        c = np.corrcoef(wh, wd)[0, 1]
        assert c > 0.95, c

    def test_deterministic(self, cfg):
        ap = AudioProcessor(cfg)
        mel, _ = _mel(ap, cfg, dur=0.4)
        sv = StreamingVocoder(ap, chunk_frames=50, context_frames=8,
                              backend="device")
        a = sv.synthesize(mel, np.random.default_rng(7))
        b = sv.synthesize(mel, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)

    def test_bad_backend_rejected(self, cfg):
        ap = AudioProcessor(cfg)
        with pytest.raises(ValueError, match="backend"):
            StreamingVocoder(ap, backend="gpu")

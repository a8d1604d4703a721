"""Audio DSP tests: STFT vs naive DFT, mel filterbank properties,
dB/normalize chain inverses, Griffin-Lim roundtrip quality.

Validates the from-scratch implementation against closed-form math (librosa
itself is unavailable); semantics per reference audio/audio.py.
"""

import numpy as np
import pytest

from vaenar_tts_tpu.audio import (
    AudioProcessor,
    hann_window,
    istft,
    mel_filterbank,
    stft,
)
from vaenar_tts_tpu.configs import get_config


@pytest.fixture
def cfg():
    return get_config("ljspeech").audio


def naive_stft_frame(frame: np.ndarray, n_fft: int) -> np.ndarray:
    k = np.arange(1 + n_fft // 2)[:, None]
    n = np.arange(n_fft)[None, :]
    basis = np.exp(-2j * np.pi * k * n / n_fft)
    return basis @ frame


class TestSTFT:
    def test_matches_naive_dft(self):
        rng = np.random.default_rng(0)
        n_fft, hop, win = 64, 16, 64
        y = rng.standard_normal(256)
        S = stft(y, n_fft, hop, win, center=False)
        w = hann_window(win)
        # check frame 0 and 3 against a naive DFT
        for i in (0, 3):
            frame = y[i * hop: i * hop + n_fft] * w
            np.testing.assert_allclose(S[:, i], naive_stft_frame(frame, n_fft),
                                       atol=1e-9)

    def test_center_padding_frame_count(self):
        n_fft, hop = 2048, 256
        y = np.zeros(22050)
        S = stft(y, n_fft, hop, 1024, center=True)
        # librosa: n_frames = 1 + len(y)//hop for center=True
        assert S.shape == (1025, 1 + len(y) // hop)

    def test_istft_roundtrip(self):
        rng = np.random.default_rng(1)
        n_fft, hop, win = 512, 128, 512
        y = rng.standard_normal(4096)
        S = stft(y, n_fft, hop, win, center=True)
        y2 = istft(S, hop, win, center=True, length=len(y))
        np.testing.assert_allclose(y2, y, atol=1e-8)

    def test_window_is_periodic_hann(self):
        w = hann_window(8)
        assert w[0] == 0.0
        # periodic hann of even length peaks at n/2 with value 1
        assert w[4] == pytest.approx(1.0)
        assert len(w) == 8


class TestMelFilterbank:
    def test_shape_and_coverage(self, cfg):
        fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.num_mels,
                            cfg.min_mel_freq, cfg.max_mel_freq)
        assert fb.shape == (80, 1025)
        assert np.all(fb >= 0)
        # every filter has some support
        assert np.all(fb.sum(axis=1) > 0)

    def test_slaney_normalization(self, cfg):
        """With Slaney norm, each triangle integrates to ~2/width * area = 1
        over continuous frequency; check the discrete sum approximates
        peak*width/2 * 2/width / df = 1/df scaling."""
        fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.num_mels,
                            cfg.min_mel_freq, cfg.max_mel_freq)
        df = cfg.sample_rate / 2 / (cfg.n_fft // 2)
        sums = fb.sum(axis=1) * df
        # each normalized triangle has unit area (within discretization error)
        assert np.all(np.abs(sums[5:-5] - 1.0) < 0.15)

    def test_linear_region_spacing(self):
        """Below 1 kHz the Slaney mel scale is linear: centers evenly spaced."""
        fb = mel_filterbank(22050, 2048, 80, 0.0, 8000.0)
        freqs = np.linspace(0, 22050 / 2, 1025)
        centers = freqs[np.argmax(fb, axis=1)]
        lin = centers[centers < 900]
        d = np.diff(lin)
        assert d.std() < d.mean() * 0.35  # roughly uniform


class TestDbChain:
    def test_amp_db_inverse(self, cfg):
        ap = AudioProcessor(cfg)
        x = np.abs(np.random.default_rng(2).standard_normal(100)) + 1e-3
        np.testing.assert_allclose(ap.db_to_amp(ap.amp_to_db(x)), x, rtol=1e-6)

    def test_normalize_denormalize(self, cfg):
        ap = AudioProcessor(cfg)
        S = np.linspace(cfg.min_level_db, 0.0, 50)
        np.testing.assert_allclose(ap.denormalize(ap.normalize(S)), S, atol=1e-6)

    def test_normalize_clips(self, cfg):
        ap = AudioProcessor(cfg)
        S = np.array([cfg.min_level_db - 50.0, 100.0])
        n = ap.normalize(S)
        assert n[0] == 0.0 and n[1] == cfg.max_abs_value


class TestPipeline:
    def test_melspectrogram_shape(self, cfg):
        ap = AudioProcessor(cfg)
        y = np.sin(2 * np.pi * 440 * np.arange(22050) / 22050).astype(np.float32)
        m = ap.melspectrogram(y)
        assert m.shape[0] == 80
        assert 0.0 <= m.min() and m.max() <= cfg.max_abs_value

    def test_preemphasis_inverse(self, cfg):
        ap = AudioProcessor(cfg)
        y = np.random.default_rng(3).standard_normal(1000)
        np.testing.assert_allclose(ap.inv_preemphasize(ap.preemphasize(y)), y,
                                   atol=1e-8)

    def test_griffin_lim_reconstructs_tone(self, cfg):
        """A pure tone's magnitude spectrogram should reconstruct a signal
        whose spectrogram matches closely after Griffin-Lim."""
        ap = AudioProcessor(cfg)
        t = np.arange(int(0.5 * cfg.sample_rate)) / cfg.sample_rate
        y = 0.5 * np.sin(2 * np.pi * 440 * t)
        mag = np.abs(ap._stft(y))
        rng = np.random.default_rng(4)
        y2 = ap.griffin_lim(mag, rng)
        mag2 = np.abs(ap._stft(y2[: len(y)]))
        # spectral convergence
        err = np.linalg.norm(mag - mag2[:, : mag.shape[1]]) / np.linalg.norm(mag)
        assert err < 0.25

    def test_fast_griffin_lim_matches_reference_path(self, cfg):
        """The float32 vectorized vocoder GL (fast_griffin_lim) must converge
        as well as the reference-parity float64 path: same length, same seed,
        spectral-convergence error within 2% relative of the slow path."""
        ap = AudioProcessor(cfg)
        t = np.arange(int(0.5 * cfg.sample_rate)) / cfg.sample_rate
        y = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.2 * np.sin(2 * np.pi * 1310 * t))
        mag = np.abs(ap._stft(y))

        def sc_err(sig):
            m2 = np.abs(ap._stft(np.asarray(sig, np.float64)))
            return np.linalg.norm(mag - m2[:, : mag.shape[1]]) \
                / np.linalg.norm(mag)

        y_slow = ap.griffin_lim(mag, np.random.default_rng(4))
        y_fast = ap.griffin_lim_fast(mag, np.random.default_rng(4))
        assert y_fast.dtype == np.float32
        assert len(y_fast) == len(y_slow)
        assert sc_err(y_fast) <= sc_err(y_slow) * 1.02 + 1e-6

    def test_inv_mel_spectrogram_fast_default(self, cfg):
        """The vocoder entry point defaults to the fast GL and produces a
        waveform equivalent in quality to the slow path."""
        ap = AudioProcessor(cfg)
        t = np.arange(int(0.4 * cfg.sample_rate)) / cfg.sample_rate
        y = 0.5 * np.sin(2 * np.pi * 330 * t)
        mel = ap.melspectrogram(y)
        w_fast = ap.inv_mel_spectrogram(mel, np.random.default_rng(7))
        w_slow = ap.inv_mel_spectrogram(mel, np.random.default_rng(7),
                                        fast=False)
        assert w_fast.shape == w_slow.shape
        # both reconstructions carry the tone: dominant FFT bin within 1 bin
        for w in (w_fast, w_slow):
            spec = np.abs(np.fft.rfft(w))
            f = np.argmax(spec) * cfg.sample_rate / len(w)
            assert abs(f - 330) < 10


def test_roundtrip_report_runs(cfg_module=None):
    """The mel->linear diagnostic (reference Audio.test, audio.py:48-72)
    reports a small relative error for a pure tone."""
    from vaenar_tts_tpu.audio import AudioProcessor
    from vaenar_tts_tpu.configs import get_config
    ap = AudioProcessor(get_config("ljspeech").audio)
    y = np.sin(2 * np.pi * 440 * np.arange(22050) / 22050).astype(np.float32)
    err = ap.roundtrip_report(y)
    # mel->linear via pinv is lossy by construction; relative to the ~255
    # peak magnitude this is sub-percent
    assert err < 2.0

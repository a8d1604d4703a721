"""On-device mel frontend vs the NumPy reference DSP (bit-level parity
within fp32 tolerance)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vaenar_tts_tpu.audio.dsp import AudioProcessor
from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.ops.stft import (
    batched_melspectrogram,
    batched_stft_magnitude,
    preemphasis,
)


@pytest.fixture
def cfg():
    # small n_fft config keeps CPU test time low while exercising the chain
    base = get_config("ljspeech").audio
    import dataclasses
    return dataclasses.replace(base, num_freq=257, frame_length_sample=256,
                               frame_shift_sample=64)


def _signal(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 22050
    return (0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


class TestJaxDSP:
    def test_preemphasis_matches_scipy(self, cfg):
        ap = AudioProcessor(cfg)
        y = _signal()
        ref = ap.preemphasize(y)
        out = np.asarray(preemphasis(jnp.asarray(y), cfg.preemphasize))
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_stft_magnitude_matches_numpy(self, cfg):
        ap = AudioProcessor(cfg)
        y = _signal()
        ref = np.abs(ap._stft(y)).T  # [F, bins]
        out = np.asarray(batched_stft_magnitude(
            jnp.asarray(y)[None], cfg.n_fft, cfg.frame_shift_sample,
            cfg.frame_length_sample, cfg.center))[0]
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_melspectrogram_matches_numpy(self, cfg):
        ap = AudioProcessor(cfg)
        y = _signal()
        ref = ap.melspectrogram(ap.preemphasize(y)).T  # [F, mels]
        out = np.asarray(batched_melspectrogram(jnp.asarray(y)[None], cfg))[0]
        assert out.shape == ref.shape
        # normalized [0,1] mels: absolute tolerance is meaningful
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_batched_matches_individual(self, cfg):
        y1, y2 = _signal(seed=1), _signal(seed=2)
        batch = jnp.stack([jnp.asarray(y1), jnp.asarray(y2)])
        both = np.asarray(batched_melspectrogram(batch, cfg))
        one = np.asarray(batched_melspectrogram(jnp.asarray(y2)[None], cfg))[0]
        np.testing.assert_allclose(both[1], one, atol=1e-5)

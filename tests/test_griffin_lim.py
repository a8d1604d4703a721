"""On-device Griffin-Lim vs the NumPy reference: iSTFT round-trip exactness
and spectral-convergence parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaenar_tts_tpu.audio.dsp import AudioProcessor
from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.ops.griffin_lim import (
    _istft_ola,
    _stft_ri,
    griffin_lim_jax,
    mel_to_wav_jax,
)


@pytest.fixture
def cfg():
    base = get_config("ljspeech").audio
    return dataclasses.replace(base, num_freq=129, frame_length_sample=128,
                               frame_shift_sample=32, griffin_lim_iters=16)


def _tone(cfg, dur=0.25, f=440.0):
    t = np.arange(int(dur * cfg.sample_rate)) / cfg.sample_rate
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


class TestISTFT:
    def test_roundtrip(self, cfg):
        """istft(stft(y)) == y through the conv/conv_transpose pair."""
        y = _tone(cfg)
        n_fft, hop, win = cfg.n_fft, cfg.frame_shift_sample, cfg.frame_length_sample
        yp = jnp.pad(jnp.asarray(y)[None], ((0, 0), (n_fft // 2, n_fft // 2)),
                     mode="reflect")
        spec = _stft_ri(yp, n_fft, hop, win)
        n_frames = spec.shape[-1]
        y2 = _istft_ola(spec, n_fft, hop, win, n_frames)
        y2 = np.asarray(y2)[0][n_fft // 2: n_fft // 2 + len(y)]
        np.testing.assert_allclose(y2, y, atol=1e-4)


class TestOverlapAddVariants:
    def test_concat_matches_sliceadd(self, cfg):
        """The scatter-free concat overlap-add (device-fault workaround
        candidate, VERDICT r2 #3) is numerically identical to the
        dynamic-update-slice formulation."""
        y = _tone(cfg)
        n_fft, hop, win = (cfg.n_fft, cfg.frame_shift_sample,
                           cfg.frame_length_sample)
        yp = jnp.pad(jnp.asarray(np.stack([y, y * 0.3]))  # batch of 2
                     , ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
        spec = _stft_ri(yp, n_fft, hop, win)
        n_frames = spec.shape[-1]
        a = _istft_ola(spec, n_fft, hop, win, n_frames, ola_mode="sliceadd")
        b = _istft_ola(spec, n_fft, hop, win, n_frames, ola_mode="concat")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_griffin_lim_concat_mode(self, cfg):
        ap = AudioProcessor(cfg)
        y = _tone(cfg)
        mag = jnp.asarray(np.abs(ap._stft(y)).T, jnp.float32)[None]
        w1 = np.asarray(griffin_lim_jax(mag, cfg, jax.random.key(0),
                                        n_iters=4))
        w2 = np.asarray(griffin_lim_jax(mag, cfg, jax.random.key(0),
                                        n_iters=4, ola_mode="concat"))
        np.testing.assert_allclose(w1, w2, atol=1e-4)


class TestGriffinLim:
    def test_spectral_convergence(self, cfg):
        ap = AudioProcessor(cfg)
        y = _tone(cfg)
        mag_np = np.abs(ap._stft(y))  # [bins, F]
        mag = jnp.asarray(mag_np.T, jnp.float32)[None]  # [1, F, bins]
        wav = np.asarray(griffin_lim_jax(mag, cfg, jax.random.key(0)))[0]
        mag2 = np.abs(ap._stft(wav[: len(y)]))
        F = min(mag_np.shape[1], mag2.shape[1])
        err = (np.linalg.norm(mag_np[:, :F] - mag2[:, :F])
               / np.linalg.norm(mag_np[:, :F]))
        assert err < 0.35  # 16 iters; numpy reference reaches ~same level
        # compare against the numpy GL at the same iteration count
        wav_np = ap.griffin_lim(mag_np, np.random.default_rng(0))
        mag3 = np.abs(ap._stft(wav_np[: len(y)]))
        err_np = (np.linalg.norm(mag_np[:, :F] - mag3[:, :F & -1])
                  / np.linalg.norm(mag_np[:, :F]))
        assert err < err_np * 2.0 + 0.1  # same quality ballpark

    def test_mel_to_wav_shapes(self, cfg):
        ap = AudioProcessor(cfg)
        y = _tone(cfg)
        mel = ap.melspectrogram(y).T[None]  # [1, F, mels]
        wav = mel_to_wav_jax(jnp.asarray(mel, jnp.float32), cfg,
                             jax.random.key(1))
        assert wav.shape[0] == 1
        assert np.isfinite(np.asarray(wav)).all()
        # energy present
        assert float(jnp.abs(wav).max()) > 1e-3

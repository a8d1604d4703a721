"""Neural ISTFT-head vocoder (models/vocoder.py, training/vocoder.py):
head semantics, perfect-reconstruction property of the ISTFT path, training
convergence on a tone, and checkpoint round-trip. (New capability beyond the
reference, which vocodes only via Griffin-Lim: audio/audio.py:95-102.)"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaenar_tts_tpu.audio.dsp import AudioProcessor
from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.models.vocoder import (MelVocoder, VocoderConfig,
                                           load_vocoder, spec_to_wav, vocode)
from vaenar_tts_tpu.training.vocoder import (PairSampler, multires_stft_loss,
                                             train_vocoder)


@pytest.fixture
def audio():
    base = get_config("ljspeech").audio
    return dataclasses.replace(base, num_freq=129, frame_length_sample=128,
                               frame_shift_sample=32)


@pytest.fixture
def cfg():
    return VocoderConfig(hidden=32, n_blocks=1, mlp_ratio=2,
                         segment_frames=40, batch_size=4, steps=300,
                         learning_rate=5e-3,
                         stft_loss_scales=((128, 32, 128), (256, 64, 256)))


def _tone(audio, dur=1.5, f=440.0):
    t = np.arange(int(dur * audio.sample_rate)) / audio.sample_rate
    return (0.5 * np.sin(2 * np.pi * f * t)
            + 0.2 * np.sin(2 * np.pi * 2 * f * t)).astype(np.float32)


class TestModel:
    def test_output_shapes_and_wav_length(self, audio, cfg):
        model = MelVocoder(cfg, audio)
        B, T = 2, 40
        mel = jnp.zeros((B, T, audio.num_mels), jnp.float32)
        params = model.init(jax.random.key(0), mel)["params"]
        spec = model.apply({"params": params}, mel)
        n_bins = 1 + audio.n_fft // 2
        assert spec.shape == (B, 2 * n_bins, T)
        wav = spec_to_wav(spec, audio)
        assert wav.shape == (B, audio.frame_shift_sample * (T - 1))
        assert np.isfinite(np.asarray(wav)).all()

    def test_istft_path_perfectly_reconstructs_oracle_spec(self, audio):
        """Feeding the TRUE STFT frames of a signal through spec_to_wav must
        reproduce the signal (NOLA perfect reconstruction, center-trimmed) —
        the head only has to learn the spectra, not fix ISTFT errors."""
        from vaenar_tts_tpu.audio.dsp import stft as np_stft
        y = _tone(audio, dur=0.3)
        S = np_stft(y, audio.n_fft, audio.frame_shift_sample,
                    audio.frame_length_sample)  # [bins, F]
        spec_ri = np.concatenate([S.real, S.imag], axis=0)[None].astype(
            np.float32)  # [1, 2*bins, F]
        wav = np.asarray(spec_to_wav(jnp.asarray(spec_ri), audio))[0]
        n = min(len(wav), len(y))
        np.testing.assert_allclose(wav[:n], y[:n], atol=2e-3)

    def test_host_istft_matches_device_istft(self, audio, cfg):
        """The capability-probe fallback (istft_ri_host) must agree with the
        compiled ISTFT path on identical predicted spectra."""
        from vaenar_tts_tpu.models.vocoder import istft_ri_host
        model = MelVocoder(cfg, audio)
        rng = np.random.default_rng(5)
        mel = jnp.asarray(rng.random((2, 24, audio.num_mels)), jnp.float32)
        params = model.init(jax.random.key(2), mel)["params"]
        spec = model.apply({"params": params}, mel)
        dev = np.asarray(spec_to_wav(spec, audio))
        host = istft_ri_host(np.asarray(spec, np.float32), audio)
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, atol=2e-4)

    def test_phasor_head_is_unit_magnitude(self, audio, cfg):
        """Predicted spectra magnitude must equal exp(clipped log-mag):
        the (re,im) head contributes phase only."""
        model = MelVocoder(cfg, audio)
        mel = jnp.asarray(
            np.random.default_rng(0).random((1, 8, audio.num_mels)),
            jnp.float32)
        params = model.init(jax.random.key(1), mel)["params"]
        spec = np.asarray(model.apply({"params": params}, mel))
        n_bins = 1 + audio.n_fft // 2
        re, im = spec[:, :n_bins], spec[:, n_bins:]
        mag = np.sqrt(re ** 2 + im ** 2)
        assert mag.max() <= np.exp(cfg.log_magnitude_clip) * 1.001
        assert (mag > 0).all()


class TestTraining:
    def test_sampler_crop_alignment(self, audio, cfg):
        """Sampled wav crops must be the exact samples under the mel crop
        (frame f centered at f*hop)."""
        y = _tone(audio)
        s = PairSampler([y], audio, cfg.segment_frames, seed=3)
        pre, mel = s.pairs[0]
        hop = audio.frame_shift_sample
        mels, wavs = s.sample(2)
        assert mels.shape == (2, cfg.segment_frames, audio.num_mels)
        assert wavs.shape == (2, hop * (cfg.segment_frames - 1))
        # locate the crop by matching the wav slice against the source
        w = wavs[0]
        found = False
        for st in range(0, len(pre) - len(w) + 1, hop):
            if np.allclose(pre[st: st + len(w)], w):
                frame = st // hop
                np.testing.assert_allclose(
                    mels[0], mel[frame: frame + cfg.segment_frames])
                found = True
                break
        assert found, "wav crop not aligned to a frame boundary"

    def test_loss_zero_for_identical_signals(self, audio, cfg):
        y = jnp.asarray(_tone(audio, dur=0.2))[None]
        loss = multires_stft_loss(y, y, cfg.stft_loss_scales)
        assert float(loss) < 1e-5

    def test_trains_to_reconstruct_tone(self, audio, cfg, tmp_path):
        """300 steps on a single tone must cut the STFT loss by >60% and the
        vocoded waveform's re-extracted mel must land much closer to the
        ground-truth mel than the untrained model's. Also covers config
        persistence + checkpoint restore via load_vocoder."""
        y = _tone(audio)
        sampler = PairSampler([y], audio, cfg.segment_frames, seed=0)
        mels0, wavs0 = sampler.sample(cfg.batch_size)

        model = MelVocoder(cfg, audio)
        p0 = model.init(jax.random.key(0), jnp.asarray(mels0))["params"]
        loss0 = float(multires_stft_loss(
            spec_to_wav(model.apply({"params": p0}, jnp.asarray(mels0)),
                        audio),
            jnp.asarray(wavs0), cfg.stft_loss_scales))

        model, params, last = train_vocoder(
            cfg, audio, sampler, str(tmp_path / "voc"), log_every=100,
            save_every=10_000)
        assert last < loss0 * 0.4, (loss0, last)

        # restore round-trip; quality = mel L1 of the re-extracted vocoded
        # wav vs ground truth, trained must beat untrained by >2x
        model2, params2 = load_vocoder(str(tmp_path / "voc"))
        ap = AudioProcessor(audio)
        pre = np.asarray(ap.preemphasize(y), np.float32)
        mel = ap.melspectrogram(pre).T.astype(np.float32)[None]

        def mel_l1(params_):
            wav = np.asarray(vocode(model2, params_, jnp.asarray(mel)))[0]
            m2 = ap.melspectrogram(wav, clip_norm=True).T
            n = min(m2.shape[0], mel.shape[1])
            return float(np.abs(m2[:n] - mel[0, :n]).mean())

        err_trained, err_untrained = mel_l1(params2), mel_l1(p0)
        assert err_trained < err_untrained * 0.5, (err_trained, err_untrained)

    def test_resume_continues_from_saved_step(self, audio, cfg, tmp_path):
        short = dataclasses.replace(cfg, steps=20)
        y = _tone(audio, dur=0.8)
        sampler = PairSampler([y], audio, cfg.segment_frames, seed=0)
        train_vocoder(short, audio, sampler, str(tmp_path / "v"),
                      log_every=10, save_every=10)
        longer = dataclasses.replace(cfg, steps=25)
        _, _, _ = train_vocoder(longer, audio, sampler, str(tmp_path / "v"),
                                log_every=10, save_every=100)


class TestBF16:
    def test_bf16_forward_close_to_fp32_and_trains(self, audio, cfg):
        """The on-chip dtype (bf16 conv stack, fp32 heads) must track the
        fp32 forward closely and optimize: mirrors the acoustic model's bf16
        CI contract (tests/test_round2_fixes.py)."""
        import dataclasses as dc

        from vaenar_tts_tpu.training.vocoder import make_vocoder_train_step
        import optax

        y = _tone(audio, dur=0.8)
        sampler = PairSampler([y], audio, cfg.segment_frames, seed=0)
        mels, wavs = sampler.sample(cfg.batch_size)
        mels_j, wavs_j = jnp.asarray(mels), jnp.asarray(wavs)

        out = {}
        for dt in ("float32", "bfloat16"):
            c = dc.replace(cfg, compute_dtype=dt)
            model = MelVocoder(c, audio)
            params = model.init(jax.random.key(0), mels_j)["params"]
            spec = model.apply({"params": params}, mels_j)
            out[dt] = {"spec": np.asarray(spec, np.float32)}
            opt = optax.adam(c.learning_rate)
            step = make_vocoder_train_step(c, model, opt)
            p, o = params, opt.init(params)
            losses = []
            for _ in range(8):
                p, o, loss = step(p, o, mels_j, wavs_j)
                losses.append(float(loss))
            out[dt]["losses"] = losses
        # forward spectra agree to bf16 tolerance on the log-magnitude scale
        a, b = out["float32"]["spec"], out["bfloat16"]["spec"]
        rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
        assert rel < 0.15, rel
        # both optimize, with commensurate losses
        for dt in out:
            assert out[dt]["losses"][-1] < out[dt]["losses"][0]
        assert abs(out["bfloat16"]["losses"][-1]
                   - out["float32"]["losses"][-1]) \
            < 0.35 * out["float32"]["losses"][0]


class TestCLI:
    def test_train_vocoder_cli_toy(self, tmp_path, capsys):
        from vaenar_tts_tpu.cli import train_vocoder as cli
        cli.main(["--dataset", "ljspeech", "--toy",
                  "--model_dir", str(tmp_path / "voc"),
                  "--n_toy_utterances", "2", "--steps", "3",
                  "--batch_size", "2", "--segment_frames", "24",
                  "--hidden", "16", "--n_blocks", "1", "--log_every", "1",
                  "--save_every", "100"])
        out = capsys.readouterr().out
        assert "vocoder step" in out
        assert (tmp_path / "voc" / "vocoder_config.json").exists()

    def test_auto_vocoder_prefers_configured_neural(self, tmp_path, audio):
        """TestUtils(neural_vocoder_dir=...) routes the auto wav path (the
        one the training loop's test intervals call) through the neural
        vocoder."""
        from vaenar_tts_tpu.audio.export import TestUtils
        from vaenar_tts_tpu.cli import train_vocoder as cli
        from vaenar_tts_tpu.configs import get_config

        voc = str(tmp_path / "voc")
        cli.main(["--dataset", "ljspeech", "--toy", "--model_dir", voc,
                  "--n_toy_utterances", "2", "--steps", "2",
                  "--batch_size", "2", "--segment_frames", "24",
                  "--hidden", "16", "--n_blocks", "1", "--log_every", "1",
                  "--save_every", "100"])
        hp = get_config("ljspeech")
        tester = TestUtils(hp, str(tmp_path / "out"), neural_vocoder_dir=voc)
        mels = np.random.default_rng(0).random(
            (2, 40, hp.audio.num_mels)).astype(np.float32)
        paths = tester.synthesize_and_save_wavs_auto(
            1, mels, np.asarray([40, 30]), ["a", "b"])
        assert len(paths) == 2
        assert all(p.endswith(".wav") for p in paths)
        # neural loader was engaged (cached on the tester)
        assert tester._nv_dir == voc

    def test_mismatched_audio_config_fails_fast(self, tmp_path, audio, cfg):
        """A vocoder trained under a different audio geometry must be
        rejected at TestUtils construction, not silently mis-vocode."""
        import dataclasses as dc

        from vaenar_tts_tpu.audio.export import TestUtils
        from vaenar_tts_tpu.configs import get_config
        from vaenar_tts_tpu.training.vocoder import PairSampler, train_vocoder

        y = _tone(audio, dur=0.5)
        short = dc.replace(cfg, steps=2)
        train_vocoder(short, audio, PairSampler([y], audio, cfg.segment_frames),
                      str(tmp_path / "v"), log_every=1, save_every=100)
        hp = get_config("ljspeech")  # full config: n_fft 2048 != fixture 256
        with pytest.raises(ValueError, match="different audio config"):
            TestUtils(hp, str(tmp_path / "out"),
                      neural_vocoder_dir=str(tmp_path / "v"))

    def test_cli_requires_exactly_one_source(self, tmp_path):
        from vaenar_tts_tpu.cli import train_vocoder as cli
        with pytest.raises(SystemExit):
            cli.main(["--model_dir", str(tmp_path)])

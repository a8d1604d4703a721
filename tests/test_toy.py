"""Toy alignment corpus (data/toy.py) and the alignment-diagonality metric
(utils/metrics.py) that scripts/alignment_proof.py asserts on."""

import numpy as np
import pytest

from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.data.loader import BucketedLoader
from vaenar_tts_tpu.data.records import list_shards
from vaenar_tts_tpu.data.toy import (ToySpec, generate_corpus, random_text,
                                     synthesize_utterance)
from vaenar_tts_tpu.utils.metrics import (alignment_diagonality,
                                          batch_diagonality)

HP = get_config("ljspeech")


class TestToySynthesis:
    def test_symbols_are_spectrally_distinct(self):
        """Different letters must land energy in different mel bands --
        otherwise the corpus carries no text->audio information."""
        from vaenar_tts_tpu.audio.dsp import AudioProcessor
        ap = AudioProcessor(HP.audio)
        mel_a = ap.melspectrogram(synthesize_utterance("aaaa", HP)).T
        mel_z = ap.melspectrogram(synthesize_utterance("zzzz", HP)).T
        # compare band-energy centroids over the voiced middle frames
        def centroid(m):
            mid = m[m.shape[0] // 4: -m.shape[0] // 4]
            w = mid.mean(axis=0)
            w = w - w.min()
            return float((w * np.arange(len(w))).sum() / w.sum())
        assert centroid(mel_z) > centroid(mel_a) + 2.0

    def test_duration_is_deterministic_per_symbol(self):
        spec = ToySpec()
        w1 = synthesize_utterance("abc", HP, spec)
        w2 = synthesize_utterance("abc", HP, spec)
        np.testing.assert_array_equal(w1, w2)
        # length = sum of per-letter frames + 2x2 pad frames
        shift = HP.audio.frame_shift_sample
        expect = sum(spec.frames(k) for k in range(3)) + 4
        assert len(w1) == expect * shift

    def test_random_text_alphabet(self, rng):
        for _ in range(20):
            t = random_text(rng)
            assert set(t) <= set("abcdefghijklmnopqrstuvwxyz ")
            letters = t.replace(" ", "")
            assert 8 <= len(letters) <= 22


class TestCorpusGeneration:
    def test_generate_and_load(self, tmp_path):
        stats = generate_corpus(str(tmp_path), HP, n_train=6, n_dev=2,
                                n_test=2, train_split=2)
        assert stats["n_train"] == 6
        assert 4.0 < stats["mel_text_len_ratio"] < 16.0
        train_shards = list_shards(str(tmp_path), "train")
        assert len(train_shards) == 2
        loader = BucketedLoader(train_shards, batch_size=2, mel_bucket=120,
                                text_bucket=32, shuffle=False)
        batch = next(iter(loader))
        assert batch.mels.shape[2] == HP.audio.num_mels
        assert batch.texts.max() < HP.encoder.vocab_size
        assert (batch.mel_lengths > 0).all()


class TestDiagonalityMetric:
    def _diag_alignment(self, mel_len, text_len, noise=0.0, rng=None):
        """Synthetic sharp diagonal alignment [1, mel_len, text_len]."""
        a = np.zeros((1, mel_len, text_len))
        for t in range(mel_len):
            j = int(t * text_len / mel_len)
            a[0, t, j] = 1.0
        if noise and rng is not None:
            a = a + noise * rng.random(a.shape)
        return a / a.sum(axis=-1, keepdims=True)

    def test_perfect_diagonal_scores_high(self):
        a = self._diag_alignment(50, 10)
        s = alignment_diagonality(a, 50, 10)
        assert s["diagonality"] > 0.97
        assert s["focus"] > 0.9

    def test_uniform_scores_low(self):
        a = np.full((2, 40, 8), 1.0 / 8)
        s = alignment_diagonality(a, 40, 8)
        assert abs(s["diagonality"]) < 0.1
        assert s["focus"] == pytest.approx(1.0 / 8)

    def test_antidiagonal_scores_negative(self):
        a = self._diag_alignment(50, 10)[:, ::-1, :]
        s = alignment_diagonality(a, 50, 10)
        assert s["diagonality"] < -0.97

    def test_crops_padding(self, rng):
        """Padded rows/cols beyond the valid region must not affect the score."""
        a = self._diag_alignment(30, 8, noise=0.02, rng=rng)
        padded = np.zeros((1, 48, 16))
        padded[:, :30, :8] = a
        padded[:, 30:, 8:] = rng.random((1, 18, 8))  # junk in the pad region
        s_crop = alignment_diagonality(padded, 30, 8)
        s_ref = alignment_diagonality(a, 30, 8)
        assert s_crop["diagonality"] == pytest.approx(s_ref["diagonality"])

    def test_batch_aggregation_respects_n_valid(self, rng):
        good = self._diag_alignment(40, 8)
        bad = np.full((1, 40, 8), 1.0 / 8)
        batch = np.stack([good, good, bad])  # last row is repeat-padding
        s = batch_diagonality(batch, [40, 40, 40], [8, 8, 8], n_valid=2)
        assert s["n"] == 2
        assert s["diagonality"] > 0.97

    def test_full_diagonal_has_full_coverage(self):
        s = alignment_diagonality(self._diag_alignment(50, 10), 50, 10)
        assert s["coverage"] == pytest.approx(1.0)

    def test_uniform_has_zero_coverage(self):
        """Uniform attention's per-token peak is exactly 1/text_len, below
        the 2x-uniform coverage bar — unlearned attention covers nothing."""
        s = alignment_diagonality(np.full((2, 40, 8), 1.0 / 8), 40, 8)
        assert s["coverage"] == 0.0

    def test_truncated_render_keeps_diagonality_but_loses_coverage(self):
        """The failure mode multi-take selection must see (cli.inference
        scores_of): a render that walks the first 8 of 10 tokens perfectly
        monotonically — diagonality stays ~1, so only the coverage term
        can rank it below a full render. This is the measured free-text
        residual (ALIGNMENT.md: 1-2-letter tail truncations)."""
        full = alignment_diagonality(self._diag_alignment(50, 10), 50, 10)
        trunc = np.zeros((1, 50, 10))
        trunc[:, :, :8] = self._diag_alignment(50, 8)
        t = alignment_diagonality(trunc, 50, 10)
        assert t["diagonality"] > 0.97  # diagonality alone cannot rank them
        assert t["coverage"] == pytest.approx(0.8)
        score = lambda m: m["diagonality"] - (1.0 - m["coverage"])
        assert score(full) > score(t) + 0.15

    def test_skipped_token_loses_coverage(self):
        """A mid-utterance omission (prior-sample breakdown) shows up as an
        uncovered interior token."""
        a = self._diag_alignment(50, 10)
        a[:, :, 5] = 0.0  # token 5 never attended
        a = a / np.maximum(a.sum(axis=-1, keepdims=True), 1e-12)
        s = alignment_diagonality(a, 50, 10)
        assert s["coverage"] <= 0.9


class TestAlignmentProbe:
    def test_probe_exposes_every_cross_attention_site(self):
        """make_alignment_probe must surface alignments from the decoder, the
        posterior, and every flow-coupling transform (the sowed
        "intermediates"; models/attention.py CrossAttentionBlock)."""
        import jax
        import jax.numpy as jnp

        from vaenar_tts_tpu.configs.hparams import tiny_test_config
        from vaenar_tts_tpu.models import VAENAR
        from vaenar_tts_tpu.training.steps import (init_model,
                                                   make_alignment_probe)

        hp = tiny_test_config()
        model = VAENAR(hp)
        B, T_TEXT, T_MEL = 2, 16, 60
        params, bs = init_model(hp, model, 0, T_TEXT, T_MEL)
        probe = make_alignment_probe(hp, model)
        rng = np.random.default_rng(0)
        texts = jnp.asarray(
            rng.integers(1, hp.encoder.vocab_size, (B, T_TEXT)), jnp.int32)
        mels = jnp.asarray(rng.standard_normal((B, T_MEL, hp.audio.num_mels)),
                           jnp.float32)
        t_lens = jnp.asarray([T_TEXT, T_TEXT - 4], jnp.int32)
        m_lens = jnp.asarray([T_MEL, T_MEL - 10], jnp.int32)
        out_mels, post_mels, sites = probe(params, bs, texts, mels, t_lens,
                                           m_lens, jax.random.key(0),
                                           reduction_factor=2,
                                           max_mel_length=T_MEL)
        assert post_mels.shape == mels.shape
        assert np.isfinite(np.asarray(post_mels)).all()
        keys = set(sites)
        assert any(k.startswith("infer/decoder/") for k in keys), keys
        assert any(k.startswith("post/decoder/") for k in keys), keys
        assert any(k.startswith("post/posterior/") for k in keys), keys
        n_couplings = sum(1 for k in keys if "infer/prior/" in k)
        assert n_couplings == hp.prior.n_blk * hp.prior.n_transformer_blk
        for k, a in sites.items():
            a = np.asarray(a)
            assert a.ndim == 4, (k, a.shape)  # [B, H, Tq, Tk]
            assert a.shape[0] == B and a.shape[3] == T_TEXT, (k, a.shape)
            assert np.isfinite(a).all(), k


class TestToyV2:
    """Toy-v2 (ToySpecV2) must defeat the duration-counting shortcut that
    made v1 too easy (VERDICT round 2): durations random per utterance,
    coarticulated boundaries, pitch declination, noise floor."""

    def test_duration_not_a_function_of_text(self):
        from vaenar_tts_tpu.data.toy import synthesize_utterance_v2
        hp = get_config("ljspeech")
        text = "abc def gh"
        lens = {len(synthesize_utterance_v2(
            text, hp, np.random.default_rng(seed))) for seed in range(6)}
        assert len(lens) > 1, "same text must give different durations"

    def test_noise_floor_in_silence(self):
        from vaenar_tts_tpu.data.toy import synthesize_utterance_v2
        hp = get_config("ljspeech")
        wav = synthesize_utterance_v2("a a", hp, np.random.default_rng(0))
        # leading pad is silence + noise: nonzero but well below peak
        head = wav[: hp.audio.frame_shift_sample // 2]
        assert np.abs(head).max() > 0.0
        assert np.abs(head).max() < 0.2 * np.abs(wav).max()

    def test_pitch_declination(self):
        """The SAME letter repeated: later instances have lower f0."""
        from vaenar_tts_tpu.data.toy import ToySpecV2, synthesize_utterance_v2
        hp = get_config("ljspeech")
        spec = ToySpecV2(noise_db=-80.0,
                         declination_semitones=(4.0, 4.0))
        rng = np.random.default_rng(3)
        wav = synthesize_utterance_v2(" ".join(["m"] * 16), hp, rng, spec)
        sr = hp.audio.sample_rate
        # dominant frequency in a quarter-second window near each end
        def dom_freq(x):
            spec_mag = np.abs(np.fft.rfft(x * np.hanning(len(x))))
            freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
            lo = freqs > 60
            return freqs[lo][np.argmax(spec_mag[lo])]
        n, w = len(wav), sr // 4
        f_start = dom_freq(wav[n // 10: n // 10 + w])
        f_end = dom_freq(wav[-n // 10 - w: -n // 10])
        assert f_end < f_start * 0.93, (f_start, f_end)

    def test_coarticulation_smears_boundaries(self):
        """With coarticulation the amplitude envelope never jumps: the max
        per-sample amplitude-envelope step is bounded."""
        from vaenar_tts_tpu.data.toy import ToySpecV2, synthesize_utterance_v2
        hp = get_config("ljspeech")
        spec = ToySpecV2(noise_db=-120.0)
        wav = synthesize_utterance_v2("a z a z", hp,
                                      np.random.default_rng(1), spec)
        env = np.abs(wav)
        k = 64
        env = np.convolve(env, np.ones(k) / k, mode="same")
        assert np.abs(np.diff(env)).max() < 0.01

    def test_generate_corpus_v2_end_to_end(self, tmp_path):
        hp = get_config("ljspeech")
        stats = generate_corpus(str(tmp_path), hp, n_train=6, n_dev=2,
                                n_test=2, train_split=2, version=2)
        assert stats["version"] == 2
        shards = list_shards(str(tmp_path), "train")
        loader = BucketedLoader(shards, 2, mel_bucket=120, text_bucket=32)
        batch = next(iter(loader.epoch(0)))
        assert batch.mels.shape[-1] == hp.audio.num_mels
        assert np.isfinite(batch.mels).all()


class TestToyLetterDecoder:
    """The transcription decoder (the free-text intelligibility metric,
    scripts/freetext_toyv2_eval.py) must read toy-v2 renders back with a low
    letter error rate — this pins its calibrated floor."""

    def test_clean_render_transcription(self):
        from vaenar_tts_tpu.audio.dsp import AudioProcessor
        from vaenar_tts_tpu.data.toy import (ToyLetterDecoder,
                                             letter_error_rate, random_text,
                                             synthesize_utterance_v2)
        hp = get_config("ljspeech")
        dec = ToyLetterDecoder(hp)
        ap = AudioProcessor(hp.audio)
        rng = np.random.default_rng(321)
        lers = []
        for _ in range(4):
            text = random_text(rng)
            mel = ap.melspectrogram(synthesize_utterance_v2(text, hp, rng)).T
            hyp = dec.decode(mel)
            lers.append(letter_error_rate(hyp.replace(" ", ""),
                                          text.replace(" ", "")))
        assert float(np.mean(lers)) <= 0.15, lers

    def test_letter_error_rate(self):
        from vaenar_tts_tpu.data.toy import letter_error_rate
        assert letter_error_rate("abc", "abc") == 0.0
        assert letter_error_rate("axc", "abc") == pytest.approx(1 / 3)
        assert letter_error_rate("", "ab") == 1.0
        assert letter_error_rate("ab", "") == 1.0

"""Config override + metrics utility tests."""

import numpy as np
import pytest

from vaenar_tts_tpu.configs import get_config
from vaenar_tts_tpu.configs.overrides import apply_overrides
from vaenar_tts_tpu.utils.metrics import batch_summary, mcd, mel_l1


class TestOverrides:
    def test_nested_int(self):
        hp = apply_overrides(get_config("ljspeech"), ["prior.n_blk=12"])
        assert hp.prior.n_blk == 12
        assert hp.prior.n_transformer_blk == 2  # untouched siblings

    def test_float_and_bool(self):
        hp = apply_overrides(get_config("ljspeech"),
                             ["train.learning_rate=2e-4",
                              "train.use_pallas_attention=true"])
        assert hp.train.learning_rate == pytest.approx(2e-4)
        assert hp.train.use_pallas_attention is True

    def test_tuple(self):
        hp = apply_overrides(get_config("ljspeech"),
                             ["train.reduction_factors=4,2"])
        assert hp.train.reduction_factors == (4, 2)

    def test_string(self):
        hp = apply_overrides(get_config("ljspeech"),
                             ["train.compute_dtype=float32"])
        assert hp.train.compute_dtype == "float32"

    def test_bad_key_raises(self):
        with pytest.raises(AttributeError):
            apply_overrides(get_config("ljspeech"), ["nope.nothing=1"])


class TestMetrics:
    def test_mel_l1_identity(self):
        a = np.random.default_rng(0).standard_normal((50, 80))
        assert mel_l1(a, a) == 0.0
        assert mel_l1(a + 0.5, a) == pytest.approx(0.5)

    def test_length_mismatch_uses_overlap(self):
        a = np.ones((40, 80))
        b = np.ones((60, 80)) * 2.0
        assert mel_l1(a, b) == pytest.approx(1.0)

    def test_mcd_zero_for_identical(self):
        a = np.abs(np.random.default_rng(1).standard_normal((30, 80)))
        assert mcd(a, a) == pytest.approx(0.0, abs=1e-9)
        s = batch_summary([(a, a), (a, a + 0.1)])
        assert s["n"] == 2 and s["mel_l1"] == pytest.approx(0.05)

    def test_mcd_dtw_timing_invariance(self):
        from vaenar_tts_tpu.utils.metrics import mcd_dtw
        rng = np.random.default_rng(2)
        # two-segment "utterance": distinct spectra per segment
        seg_a = np.tile(rng.standard_normal((1, 80)), (10, 1))
        seg_b = np.tile(rng.standard_normal((1, 80)), (10, 1))
        ref = np.concatenate([seg_a, seg_b])
        # same content, different segment durations (time-warped)
        warped = np.concatenate([seg_a[:4], seg_b[:16]])
        assert mcd_dtw(ref, ref) == pytest.approx(0.0, abs=1e-9)
        assert mcd_dtw(warped, ref) == pytest.approx(0.0, abs=1e-9)
        # frame-wise MCD charges heavily for the same warp
        assert mcd(warped, ref) > 5.0

    def test_mcd_dtw_matches_mcd_when_aligned(self):
        from vaenar_tts_tpu.utils.metrics import mcd_dtw
        rng = np.random.default_rng(3)
        a = rng.standard_normal((25, 80))
        noisy = a + 0.01 * rng.standard_normal((25, 80))
        # small perturbation: DTW path should stay (near-)diagonal, so the
        # two metrics agree and DTW can only be <= frame-wise
        d_dtw, d_fw = mcd_dtw(noisy, a), mcd(noisy, a)
        assert d_dtw <= d_fw + 1e-9
        assert d_dtw == pytest.approx(d_fw, rel=0.35)

    def test_batch_summary_dtw_flag(self):
        from vaenar_tts_tpu.utils.metrics import mcd_dtw  # noqa: F401
        a = np.abs(np.random.default_rng(4).standard_normal((20, 80)))
        s = batch_summary([(a, a)], dtw=True)
        assert s["mcd_dtw_db"] == pytest.approx(0.0, abs=1e-9)
        assert "mcd_dtw_db" not in batch_summary([(a, a)])

    def test_medoid_take_rejects_outlier(self):
        from vaenar_tts_tpu.utils.metrics import medoid_take
        rng = np.random.default_rng(5)
        base = rng.standard_normal((40, 80))
        # three healthy takes: same content, differing timing + tiny noise
        takes = [base + 0.02 * rng.standard_normal(base.shape),
                 np.repeat(base, 2, axis=0)[::2]
                 + 0.02 * rng.standard_normal(base.shape),
                 np.concatenate([base[:10], base[8:]])]
        # one breakdown take: garbled second half (the failure mode
        # multi-take selection exists to catch)
        broken = base.copy()
        broken[20:] = rng.standard_normal((20, 80)) * 3.0
        for pos in range(4):  # outlier position must not matter
            cand = takes[:pos] + [broken] + takes[pos:]
            idx, d = medoid_take(cand, frame_stride=1)
            assert idx != pos
            assert d.shape == (4, 4) and d[pos].sum() == max(d.sum(1))

    def test_medoid_take_single(self):
        from vaenar_tts_tpu.utils.metrics import medoid_take
        idx, d = medoid_take([np.zeros((10, 80))])
        assert idx == 0 and d.shape == (1, 1)


class TestSerialize:
    def test_roundtrip(self, tmp_path):
        from vaenar_tts_tpu.configs.serialize import (load_hparams,
                                                      save_hparams)
        hp = apply_overrides(get_config("ljspeech"),
                             ["prior.n_blk=9", "train.reduction_factors=4,2"])
        save_hparams(hp, str(tmp_path))
        hp2 = load_hparams(str(tmp_path))
        assert hp2 == hp
        assert hp2.prior.n_blk == 9
        assert hp2.train.reduction_factors == (4, 2)

    def test_missing_returns_none(self, tmp_path):
        from vaenar_tts_tpu.configs.serialize import load_hparams
        assert load_hparams(str(tmp_path)) is None


class TestTuningKnobs:
    """hp.train.ring_min_seq / pallas_min_score_elements are the config
    form of the ring/Pallas crossovers (VERDICT r3 #7): --override-reachable
    and honored by the trace-time kernel selection."""

    def test_override_reachable(self):
        hp = apply_overrides(get_config("ljspeech"),
                             ["train.ring_min_seq=0",
                              "train.pallas_min_score_elements=123"])
        assert hp.train.ring_min_seq == 0
        assert hp.train.pallas_min_score_elements == 123

    def test_pallas_profitable_honors_override(self):
        from vaenar_tts_tpu.ops.flash_attention import (
            PALLAS_MIN_SCORE_ELEMENTS_BY_HEAD_DIM, pallas_profitable)
        t = 64  # far below every measured table entry
        assert not pallas_profitable(t, t, 64)
        assert pallas_profitable(t, t, 64, min_elements=1)
        assert not pallas_profitable(t, t, 64, min_elements=10 ** 9)
        # None/0 fall back to the measured table
        big = max(PALLAS_MIN_SCORE_ELEMENTS_BY_HEAD_DIM.values())
        assert pallas_profitable(4096, big // 4096 + 1, 64, min_elements=None)

    def test_tuning_threads_to_kernel_selection(self):
        """A pallas_min_score_elements=1 config makes use_pallas='auto'
        take the fused path even at tiny shapes — observable because the
        fused path does not materialize alignments."""
        import jax
        import jax.numpy as jnp

        from vaenar_tts_tpu.models.attention import (AttentionTuning,
                                                     MultiHeadAttention)

        x = jnp.ones((2, 16, 8), jnp.float32)
        lens = jnp.array([16, 12])

        def run(tuning):
            mha = MultiHeadAttention(8, 2, use_pallas="auto", tuning=tuning)
            params = mha.init(jax.random.key(0), x, x, lens, lens)
            _, ali = mha.apply(params, x, x, lens, lens)
            return ali

        assert run(None) is not None  # table says XLA at tiny shapes
        assert run(AttentionTuning(pallas_min_score_elements=1)) is None

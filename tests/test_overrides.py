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

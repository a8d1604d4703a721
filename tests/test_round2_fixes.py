"""Round-2 tail fixes: +80-pad clamp at the bucket edge, bf16 flagship dtype
in CI, streaming record-shard writer."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaenar_tts_tpu.configs.hparams import tiny_test_config
from vaenar_tts_tpu.models import VAENAR
from vaenar_tts_tpu.training.steps import (init_model, make_dev_step,
                                           make_inference_step,
                                           make_optimizer, make_train_step)

HP = tiny_test_config()
B, T_TEXT, T_MEL = 2, 16, 60


@pytest.fixture(scope="module")
def setup():
    model = VAENAR(HP)
    params, batch_stats = init_model(HP, model, 0, T_TEXT, T_MEL)
    rng = np.random.default_rng(7)
    texts = rng.integers(1, HP.encoder.vocab_size, (B, T_TEXT)).astype(np.int32)
    mels = rng.standard_normal((B, T_MEL, 80)).astype(np.float32) * 0.1 + 0.5
    t_lens = np.array([12, 16], np.int32)
    m_lens = np.array([50, 60], np.int32)
    return model, params, batch_stats, (texts, mels, t_lens, m_lens)


class TestPadClampEdge:
    def test_plus80_pad_clamps_to_bucket(self, setup):
        """Near-bucket predictions truncate to the static bucket where the
        reference (inference.py:136,143) extends dynamically (PARITY.md #2).
        With a 60-frame bucket, predicted(>=1)+80 always exceeds it, so every
        predicted length must come back exactly clamped — and the decode must
        still run and stay finite."""
        model, params, batch_stats, (texts, _, t_lens, _) = setup
        inf = make_inference_step(HP, model)
        mels_out, pred_lens, _ = inf(params, batch_stats, jnp.asarray(texts),
                                     jnp.asarray(t_lens), jax.random.key(3),
                                     reduction_factor=2, max_mel_length=60)
        pred_lens = np.asarray(pred_lens)
        assert (pred_lens == 60).all(), pred_lens
        assert mels_out.shape == (B, 60, 80)
        assert np.isfinite(np.asarray(mels_out, np.float32)).all()


class TestBF16Flagship:
    """The shipped LJ preset runs compute_dtype=bfloat16 (flow stays fp32);
    CI must exercise that configuration, not only fp32 (VERDICT weak #6)."""

    def _hp(self, dtype):
        hp = tiny_test_config()
        return hp.replace(train=dataclasses.replace(hp.train,
                                                    compute_dtype=dtype))

    def test_bf16_forward_matches_fp32_and_trains(self, setup):
        _, params, batch_stats, (texts, mels, t_lens, m_lens) = setup
        args = (jnp.asarray(texts), jnp.asarray(mels), jnp.asarray(t_lens),
                jnp.asarray(m_lens), jnp.float32(1e-5),
                jnp.asarray([1.0, 1.0]), jax.random.key(11))

        hp32, hp16 = self._hp("float32"), self._hp("bfloat16")
        m32 = make_dev_step(hp32, VAENAR(hp32))(params, batch_stats, *args,
                                                reduction_factor=2)
        m16 = make_dev_step(hp16, VAENAR(hp16))(params, batch_stats, *args,
                                                reduction_factor=2)
        for k in ("total", "mel_l2", "len_l2"):
            v32, v16 = float(m32[k]), float(m16[k])
            assert np.isfinite(v16), (k, v16)
            assert v16 == pytest.approx(v32, rel=0.08), (k, v32, v16)
        # kl is a small difference of large log-probs; check absolute scale
        assert abs(float(m16["kl"]) - float(m32["kl"])) < 60.0

        # and a few bf16 train steps stay finite
        model16 = VAENAR(hp16)
        optimizer = make_optimizer(hp16)
        step = make_train_step(hp16, model16, optimizer, donate=False)
        p, bs, os_ = params, batch_stats, optimizer.init(params)
        rng = jax.random.key(5)
        for _ in range(3):
            rng, sub = jax.random.split(rng)
            p, bs, os_, m = step(p, bs, os_, jnp.asarray(texts),
                                 jnp.asarray(mels), jnp.asarray(t_lens),
                                 jnp.asarray(m_lens), jnp.float32(1e-5), sub,
                                 reduction_factor=2)
            assert np.isfinite(float(m["total"]))
        # params stay fp32 under bf16 compute (mixed-precision policy)
        leaves = jax.tree_util.tree_leaves(p)
        assert all(l.dtype == jnp.float32 for l in leaves)


class TestStreamingShardWriter:
    def test_roundtrip_and_no_tmp_leftovers(self, tmp_path):
        from vaenar_tts_tpu.data.records import (RecordShardReader,
                                                 RecordShardWriter)
        path = str(tmp_path / "train-0.vrs")
        rng = np.random.default_rng(0)
        utts = []
        w = RecordShardWriter(path, num_mels=4)
        for i in range(5):
            text = rng.integers(0, 40, (3 + i,)).astype(np.int32)
            mel = rng.standard_normal((10 + 7 * i, 4)).astype(np.float32)
            utts.append((f"utt{i}", text, mel))
            w.add(*utts[-1])
        w.close()
        assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
        r = RecordShardReader(path)
        assert len(r) == 5
        for i, (fid, text, mel) in enumerate(utts):
            u = r.get(i)
            assert u.fid == fid
            np.testing.assert_array_equal(u.text, text)
            np.testing.assert_allclose(u.mel, mel)


def test_plots_variant_restores_alignments():
    """With the fused kernel forced on, MHA returns alignments=None; the
    plots twin (identical params, kernel off) must restore them — the train
    loop and inference CLI build artifact steps from it."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vaenar_tts_tpu.configs.hparams import tiny_test_config
    from vaenar_tts_tpu.models import VAENAR
    from vaenar_tts_tpu.training.steps import (init_model, make_test_step,
                                               plots_variant)

    hp_on = tiny_test_config().replace(
        train=dataclasses.replace(tiny_test_config().train,
                                  use_pallas_attention=True))
    hp_plots = plots_variant(hp_on)
    assert hp_plots.train.use_pallas_attention is False
    # identical param trees: trained params apply to either model
    model_on, model_plots = VAENAR(hp_on), VAENAR(hp_plots)
    params, bs = init_model(hp_on, model_on, 0, 16, 120)

    texts = jnp.zeros((2, 16), jnp.int32)
    t_lens = jnp.array([16, 10], jnp.int32)
    m_lens = jnp.array([120, 80], jnp.int32)
    rng = jax.random.key(0)

    mels_on, ali_on = make_test_step(hp_on, model_on)(
        params, bs, texts, t_lens, m_lens, rng, reduction_factor=2,
        max_mel_length=120)
    mels_p, ali_p = make_test_step(hp_plots, model_plots)(
        params, bs, texts, t_lens, m_lens, rng, reduction_factor=2,
        max_mel_length=120)
    # fused path: cross alignments vanish; plots twin: present and plottable
    assert all(a is None for a in ali_on.values())
    assert ali_p and all(a is not None for a in ali_p.values())
    # same synthesis up to kernel-order float noise
    np.testing.assert_allclose(np.asarray(mels_on), np.asarray(mels_p),
                               atol=2e-4)

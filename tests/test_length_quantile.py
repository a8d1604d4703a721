"""Length-predictor quantile head (beyond the reference; ROADMAP free-text
robustness item): a second Dense(1) trained with a pinball loss so inference
can use a learned p-quantile length instead of the mean, adding
text-conditional headroom against free-text truncation.

Covers: reference parity when disabled, pinball-loss math, that the head
actually learns the target quantile, full-model wiring (loss term, untouched
mean path, quantile-driven inference), and CLI source resolution."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaenar_tts_tpu.configs.hparams import tiny_test_config
from vaenar_tts_tpu.models.length_predictor import (DenseLengthPredictor,
                                                    pinball_log_loss)


def _hp(quantile: float):
    hp = tiny_test_config()
    return hp.replace(length_predictor=dataclasses.replace(
        hp.length_predictor, quantile=quantile))


class TestPinballLoss:
    def test_matches_numpy(self):
        pred = jnp.array([10.0, 10.0, 7.0])
        tgt = jnp.array([20.0, 5.0, 7.0])
        got = np.asarray(pinball_log_loss(pred, tgt, 0.9))
        r = np.log(np.asarray(tgt)) - np.log(np.asarray(pred))
        want = np.maximum(0.9 * r, -0.1 * r)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        red = float(pinball_log_loss(pred, tgt, 0.9, reduce=True))
        assert np.isclose(red, want.mean())

    def test_minimized_at_empirical_quantile(self):
        """Over a sample set, the pinball loss (as a function of a constant
        prediction) is minimized at the empirical tau-quantile — the property
        that makes the trained head a p90 predictor."""
        rs = np.random.RandomState(0)
        lengths = jnp.asarray(np.exp(rs.normal(4.0, 0.5, size=512)))
        candidates = np.linspace(20.0, 250.0, 400)
        losses = [float(pinball_log_loss(jnp.full_like(lengths, c), lengths,
                                         0.9, reduce=True))
                  for c in candidates]
        best = candidates[int(np.argmin(losses))]
        p90 = float(np.quantile(np.asarray(lengths), 0.9))
        assert abs(best - p90) / p90 < 0.1


class TestQuantileHead:
    def test_disabled_is_reference_exact(self):
        """quantile == 0 (default): the param tree is exactly the round-2
        module — one Dense named 'projection' (interop weight-map and
        checkpoint compatibility)."""
        m = DenseLengthPredictor(activation="identity")
        x = jnp.zeros((2, 4, 8), jnp.float32)
        v = m.init(jax.random.key(0), x, jnp.array([4, 2]))
        assert sorted(v["params"].keys()) == ["projection"]
        with pytest.raises(ValueError):
            m.apply(v, x, jnp.array([4, 2]),
                    method=DenseLengthPredictor.quantile_lengths)

    def test_invalid_quantile_rejected(self):
        x = jnp.zeros((1, 2, 4), jnp.float32)
        for bad in (1.0, -0.1, 1.5):
            with pytest.raises(ValueError):
                DenseLengthPredictor(quantile=bad).init(
                    jax.random.key(0), x, jnp.array([2]))

    def test_call_init_creates_both_heads(self):
        m = DenseLengthPredictor(activation="identity", quantile=0.9)
        x = jnp.zeros((2, 4, 8), jnp.float32)
        v = m.init(jax.random.key(0), x, jnp.array([4, 2]))
        assert sorted(v["params"].keys()) == ["projection", "q_projection"]
        q = m.apply(v, x, jnp.array([4, 2]),
                    method=DenseLengthPredictor.quantile_lengths)
        assert q.shape == (2,)

    def test_learns_the_quantile(self):
        """Train both heads jointly (log-L2 for the mean head, pinball for
        the quantile head — the same losses models/vaenar.py wires) on
        lengths whose log is N(mu, sigma) noise independent of the text:
        the mean head converges to exp(mu), the p90 head to
        exp(mu + 1.2816 sigma)."""
        rs = np.random.RandomState(1)
        B, T, D = 64, 6, 8
        x = jnp.asarray(rs.standard_normal((B, T, D)) * 0.0 + 1.0, jnp.float32)
        lens = jnp.full((B,), T, jnp.int32)
        mu_log, sigma = 3.5, 0.4
        tgt = jnp.asarray(np.exp(rs.normal(mu_log, sigma, size=B)),
                          jnp.float32)

        m = DenseLengthPredictor(activation="identity", quantile=0.9)
        params = m.init(jax.random.key(0), x, lens)["params"]
        opt = optax.adam(0.05)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                mean_pred = m.apply({"params": p}, x, lens)
                q_pred = m.apply({"params": p}, x, lens,
                                 method=DenseLengthPredictor.quantile_lengths)
                l2 = jnp.mean(jnp.square(jnp.log(mean_pred) - jnp.log(tgt)))
                pin = pinball_log_loss(q_pred, tgt, 0.9, reduce=True)
                return l2 + pin

            grads = jax.grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state

        for _ in range(400):
            params, opt_state = step(params, opt_state)

        mean_pred = float(m.apply({"params": params}, x, lens)[0])
        q_pred = float(m.apply(
            {"params": params}, x, lens,
            method=DenseLengthPredictor.quantile_lengths)[0])
        want_mean = np.exp(mu_log)
        want_p90 = np.exp(mu_log + 1.2816 * sigma)
        assert abs(mean_pred - want_mean) / want_mean < 0.15
        assert abs(q_pred - want_p90) / want_p90 < 0.15
        # the learned headroom is real: p90 head sits well above the mean
        assert q_pred > 1.2 * mean_pred


class TestModelWiring:
    def test_loss_term_and_mean_path_parity(self):
        """With the head enabled, length_loss gains a nonnegative pinball
        term while every other loss is BITWISE identical to the quantile=0
        model (same seed -> Flax derives identical params for all shared
        module paths; the head is additive)."""
        from vaenar_tts_tpu.models.vaenar import VAENAR
        from vaenar_tts_tpu.training.steps import init_model

        base = _hp(0.0)
        B, Tt, Tm = 2, base.dataset.text_bucket, base.dataset.mel_bucket
        rs = np.random.RandomState(2)
        texts = jnp.asarray(np.tile(np.arange(1, Tt + 1, dtype=np.int32),
                                    (B, 1)))
        mels = jnp.asarray(rs.standard_normal((B, Tm, base.audio.num_mels)),
                           jnp.float32)
        t_lens = jnp.full((B,), Tt, jnp.int32)
        m_lens = jnp.full((B,), Tm, jnp.int32)
        outs = {}
        for q in (0.0, 0.9):
            hp = _hp(q)
            model = VAENAR(hp)
            params, bs = init_model(hp, model, 7,
                                    text_max=hp.dataset.text_bucket,
                                    mel_max=hp.dataset.mel_bucket)
            _, l2, kl, len_loss, _ = model.apply(
                {"params": params, "batch_stats": bs},
                texts, mels, m_lens, t_lens,
                reduction_factor=hp.common.max_reduction_factor,
                train=False, reduce_loss=True,
                rngs={"sample": jax.random.key(3)})
            outs[q] = (float(l2), float(kl), float(len_loss))

        assert outs[0.9][0] == outs[0.0][0]  # mel L2 untouched
        assert outs[0.9][1] == outs[0.0][1]  # KL untouched
        assert outs[0.9][2] > outs[0.0][2]   # + pinball term (a.s. positive)

    def test_quantile_inference(self):
        """infer_with_length_prediction(use_length_quantile=True) drives
        synthesis length from the q head; lengths land in-range and the
        mel comes back at the static bucket."""
        from vaenar_tts_tpu.models.vaenar import VAENAR
        from vaenar_tts_tpu.training.steps import init_model, \
            make_inference_step

        hp = _hp(0.9)
        model = VAENAR(hp)
        params, bs = init_model(hp, model, 0,
                                text_max=hp.dataset.text_bucket,
                                mel_max=hp.dataset.mel_bucket)
        inf = make_inference_step(hp, model)
        B, Tt, Tm = 2, hp.dataset.text_bucket, hp.dataset.mel_bucket
        texts = jnp.ones((B, Tt), jnp.int32)
        t_lens = jnp.full((B,), Tt, jnp.int32)
        mel, lens, _ = inf(params, bs, texts, t_lens, jax.random.key(1),
                           reduction_factor=hp.common.final_reduction_factor,
                           max_mel_length=Tm, temperature=0.6,
                           length_headroom=0, use_length_quantile=True)
        assert mel.shape == (B, Tm, hp.audio.num_mels)
        lens = np.asarray(lens)
        assert ((1 <= lens) & (lens <= Tm)).all()


class TestCLIResolution:
    def test_length_source(self):
        from vaenar_tts_tpu.cli.inference import _resolve_length_source
        assert _resolve_length_source("auto", _hp(0.9)) is True
        assert _resolve_length_source("auto", _hp(0.0)) is False
        assert _resolve_length_source("mean", _hp(0.9)) is False
        assert _resolve_length_source("quantile", _hp(0.9)) is True
        with pytest.raises(SystemExit):
            _resolve_length_source("quantile", _hp(0.0))

"""Integration tests: tiny-config loss decreases over steps, data-dependent
init produces ~N(0,1) flow outputs, checkpoint save/restore round-trip,
inference produces mels of the right shape."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaenar_tts_tpu.configs.hparams import tiny_test_config
from vaenar_tts_tpu.models import VAENAR
from vaenar_tts_tpu.training.steps import (
    TrainState,
    init_model,
    make_dev_step,
    make_inference_step,
    make_optimizer,
    make_test_step,
    make_train_step,
    run_data_dependent_init,
)

HP = tiny_test_config()
B, T_TEXT, T_MEL = 2, 16, 60


@pytest.fixture(scope="module")
def setup():
    model = VAENAR(HP)
    params, batch_stats = init_model(HP, model, 0, T_TEXT, T_MEL)
    rng = np.random.default_rng(0)
    texts = rng.integers(1, HP.encoder.vocab_size, (B, T_TEXT)).astype(np.int32)
    mels = rng.standard_normal((B, T_MEL, 80)).astype(np.float32) * 0.1 + 0.5
    t_lens = np.array([12, 16], np.int32)
    m_lens = np.array([50, 60], np.int32)
    return model, params, batch_stats, (texts, mels, t_lens, m_lens)


class TestTrainStep:
    def test_loss_decreases(self, setup):
        model, params, batch_stats, (texts, mels, t_lens, m_lens) = setup
        optimizer = make_optimizer(HP.replace())
        # crank LR for a fast visible decrease on the tiny problem
        import optax
        optimizer = optax.adam(2e-3)
        opt_state = optimizer.init(params)
        step = make_train_step(HP, model, optimizer, donate=False)
        losses = []
        rng = jax.random.key(42)
        p, bs, os_ = params, batch_stats, opt_state
        for i in range(8):
            rng, sub = jax.random.split(rng)
            p, bs, os_, m = step(p, bs, os_, jnp.asarray(texts),
                                 jnp.asarray(mels), jnp.asarray(t_lens),
                                 jnp.asarray(m_lens), jnp.float32(1e-5), sub,
                                 reduction_factor=2)
            losses.append(float(m["total"]))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    def test_data_dependent_init_flow_unit_normal(self, setup):
        """After init_pass merging, a forward prior sample at the init batch
        should produce latents with roughly unit scale (the actnorms absorb
        the data statistics)."""
        model, params, batch_stats, (texts, mels, t_lens, m_lens) = setup
        new_params = run_data_dependent_init(
            HP, model, params, batch_stats, jnp.asarray(texts),
            jnp.asarray(t_lens), jnp.asarray(m_lens), max_mel_length=T_MEL)
        # the actnorm params must have changed
        old_ls = params["prior"]["actnorm_0"]["log_scale"]
        new_ls = new_params["prior"]["actnorm_0"]["log_scale"]
        assert not np.allclose(np.asarray(old_ls), np.asarray(new_ls))
        # and all flow steps got stats
        for i in range(HP.prior.n_blk):
            assert f"actnorm_{i}" in new_params["prior"]

    def test_dev_step_masks_padding(self, setup):
        model, params, batch_stats, (texts, mels, t_lens, m_lens) = setup
        dev_step = make_dev_step(HP, model)
        rng = jax.random.key(0)
        full = dev_step(params, batch_stats, jnp.asarray(texts),
                        jnp.asarray(mels), jnp.asarray(t_lens),
                        jnp.asarray(m_lens), jnp.float32(1e-5),
                        jnp.asarray([1.0, 1.0]), rng, reduction_factor=2)
        # poison example 1, mask it out -> metrics must equal masked-first-only
        texts2 = texts.copy()
        texts2[1] = 1
        only0 = dev_step(params, batch_stats, jnp.asarray(texts2),
                         jnp.asarray(mels), jnp.asarray(t_lens),
                         jnp.asarray(m_lens), jnp.float32(1e-5),
                         jnp.asarray([1.0, 0.0]), rng, reduction_factor=2)
        only0_ref = dev_step(params, batch_stats, jnp.asarray(texts),
                             jnp.asarray(mels), jnp.asarray(t_lens),
                             jnp.asarray(m_lens), jnp.float32(1e-5),
                             jnp.asarray([1.0, 0.0]), rng, reduction_factor=2)
        assert float(only0["mel_l2"]) == pytest.approx(
            float(only0_ref["mel_l2"]), rel=1e-5)

    def test_infer_shapes(self, setup):
        model, params, batch_stats, (texts, mels, t_lens, m_lens) = setup
        test_step = make_test_step(HP, model)
        out, ali = test_step(params, batch_stats, jnp.asarray(texts),
                             jnp.asarray(t_lens), jnp.asarray(m_lens),
                             jax.random.key(0), reduction_factor=2,
                             max_mel_length=T_MEL)
        assert out.shape == (B, T_MEL, 80)
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_inference_with_length_prediction(self, setup):
        model, params, batch_stats, (texts, mels, t_lens, m_lens) = setup
        inf = make_inference_step(HP, model)
        mels_out, pred_lens, ali = inf(params, batch_stats,
                                       jnp.asarray(texts), jnp.asarray(t_lens),
                                       jax.random.key(1), reduction_factor=2,
                                       max_mel_length=120)
        assert mels_out.shape == (B, 120, 80)
        assert np.all(np.asarray(pred_lens) > 0)
        assert np.all(np.asarray(pred_lens) <= 120)

    def test_reduction_factor_variants(self, setup):
        """All curriculum reduction factors must compile and run (mel time 60
        is divisible by each)."""
        model, params, batch_stats, (texts, mels, t_lens, m_lens) = setup
        optimizer = make_optimizer(HP)
        opt_state = optimizer.init(params)
        step = make_train_step(HP, model, optimizer, donate=False)
        # two factors keep the CPU compile budget sane; all four are exercised
        # on real hardware by the bench/train paths
        for r in (5, 3):
            _, _, _, m = step(params, batch_stats, opt_state,
                              jnp.asarray(texts), jnp.asarray(mels),
                              jnp.asarray(t_lens), jnp.asarray(m_lens),
                              jnp.float32(1e-5), jax.random.key(r),
                              reduction_factor=r)
            assert np.isfinite(float(m["total"]))


class TestCheckpoint:
    def test_roundtrip(self, setup, tmp_path):
        from vaenar_tts_tpu.utils.checkpoint import CheckpointManager
        model, params, batch_stats, _ = setup
        optimizer = make_optimizer(HP)
        opt_state = optimizer.init(params)
        state = TrainState(params, batch_stats, opt_state, epoch=3)
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        mgr.save(3, state.as_dict())
        assert mgr.latest_epoch() == 3
        restored = mgr.restore(state.as_dict())
        rs = TrainState.from_dict(restored)
        assert rs.epoch == 3
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b)),
            state.params, rs.params)
        mgr.close()


class TestMultiSample:
    def test_n_sample_2_forward(self):
        """num_samples=2 exercises the tile-to-batch*n paths
        (reference models.py:146-178)."""
        import dataclasses
        hp = tiny_test_config()
        hp = hp.replace(train=dataclasses.replace(hp.train, num_samples=2))
        model = VAENAR(hp)
        params, batch_stats = init_model(hp, model, 0, T_TEXT, T_MEL)
        rng = np.random.default_rng(1)
        texts = jnp.asarray(rng.integers(1, hp.encoder.vocab_size,
                                         (B, T_TEXT)), jnp.int32)
        mels = jnp.asarray(rng.standard_normal((B, T_MEL, 80)) * 0.1,
                           jnp.float32)
        t_lens = jnp.array([12, 16], jnp.int32)
        m_lens = jnp.array([50, 60], jnp.int32)
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            texts, mels, m_lens, t_lens, reduction_factor=2, train=True,
            reduce_loss=False,
            rngs={"dropout": jax.random.key(0), "sample": jax.random.key(1)},
            mutable=["batch_stats"])
        dec, mel_l2, kl, len_l2, _ = outs
        assert dec.shape == (B * 2, T_MEL, 80)
        assert mel_l2.shape == (B,)
        assert kl.shape == (B,)
        assert np.isfinite(np.asarray(mel_l2)).all()
        assert np.isfinite(np.asarray(kl)).all()


class TestRemat:
    """Activation checkpointing (TrainConfig.remat) must be a pure
    memory/compute trade: identical param tree, identical loss, identical
    gradients vs the unchecked model (same rng chain)."""

    @pytest.mark.parametrize("mode", ["on", "dots"])
    def test_remat_matches_no_remat(self, setup, mode):
        import dataclasses
        _, params, batch_stats, (texts, mels, t_lens, m_lens) = setup

        def loss_and_grads(hp):
            model = VAENAR(hp)
            p, bs = init_model(hp, model, 0, T_TEXT, T_MEL)
            # identical init across variants (remat does not change the tree)
            assert jax.tree_util.tree_structure(p) == \
                jax.tree_util.tree_structure(params)

            def loss_fn(p):
                outs, _ = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    jnp.asarray(texts), jnp.asarray(mels),
                    jnp.asarray(m_lens), jnp.asarray(t_lens),
                    reduction_factor=2, train=True, reduce_loss=True,
                    rngs={"dropout": jax.random.key(3),
                          "sample": jax.random.key(4)},
                    mutable=["batch_stats"])
                _dec, mel_l2, kl, len_l2, _ = outs
                return mel_l2 + 1e-3 * kl + len_l2

            return jax.value_and_grad(loss_fn)(params)

        base_loss, base_grads = loss_and_grads(HP)
        hp = HP.replace(train=dataclasses.replace(HP.train, remat=mode))
        re_loss, re_grads = loss_and_grads(hp)
        np.testing.assert_allclose(float(re_loss), float(base_loss),
                                   rtol=1e-5)
        flat_b = jax.tree_util.tree_leaves(base_grads)
        flat_r = jax.tree_util.tree_leaves(re_grads)
        for gb, gr in zip(flat_b, flat_r):
            np.testing.assert_allclose(np.asarray(gr), np.asarray(gb),
                                       rtol=2e-4, atol=1e-6)

    def test_remat_train_step_runs(self, setup):
        import dataclasses
        _, _, _, (texts, mels, t_lens, m_lens) = setup
        hp = HP.replace(train=dataclasses.replace(HP.train, remat="on"))
        model = VAENAR(hp)
        params, batch_stats = init_model(hp, model, 0, T_TEXT, T_MEL)
        optimizer = make_optimizer(hp)
        opt_state = optimizer.init(params)
        step = make_train_step(hp, model, optimizer, donate=False)
        _, _, _, m = step(params, batch_stats, opt_state,
                          jnp.asarray(texts), jnp.asarray(mels),
                          jnp.asarray(t_lens), jnp.asarray(m_lens),
                          jnp.float32(1e-5), jax.random.key(0),
                          reduction_factor=2)
        for v in m.values():
            assert np.isfinite(float(v))

    def test_bad_remat_value_raises(self):
        import dataclasses
        from vaenar_tts_tpu.models.attention import maybe_remat
        with pytest.raises(ValueError):
            maybe_remat(VAENAR, "bogus")

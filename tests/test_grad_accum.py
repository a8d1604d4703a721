"""Gradient accumulation (hp.train.grad_accum): the lax.scan'ed micro-batch
step must reproduce a hand-rolled Python accumulation loop exactly (same
per-micro-batch PRNG folding, same batch_stats threading, averaged grads,
one Adam update), and must reject batch sizes it cannot split.

Why this exists: the measured per-chip batch-scaling wall (README) is HBM
bandwidth past batch 32, so big global batches should run as micro-steps at
the batch-32 optimum. Reference semantics being preserved: one optimizer
update per global batch (reference train.py:120-146).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaenar_tts_tpu.configs.hparams import tiny_test_config
from vaenar_tts_tpu.models import VAENAR
from vaenar_tts_tpu.training.steps import (
    init_model,
    make_optimizer,
    make_train_step,
)

HP = tiny_test_config()
B, T_TEXT, T_MEL = 4, 16, 60
ACCUM = 2
KLW = jnp.float32(1e-5)
R = 2


@pytest.fixture(scope="module")
def setup():
    model = VAENAR(HP)
    params, batch_stats = init_model(HP, model, 0, T_TEXT, T_MEL)
    rng = np.random.default_rng(7)
    texts = rng.integers(1, HP.encoder.vocab_size, (B, T_TEXT)).astype(np.int32)
    mels = rng.standard_normal((B, T_MEL, 80)).astype(np.float32) * 0.1 + 0.5
    t_lens = np.array([12, 16, 10, 14], np.int32)
    m_lens = np.array([50, 60, 44, 56], np.int32)
    return model, params, batch_stats, (jnp.asarray(texts), jnp.asarray(mels),
                                        jnp.asarray(t_lens),
                                        jnp.asarray(m_lens))


def manual_accum_step(model, params, batch_stats, opt_state, optimizer,
                      texts, mels, t_lens, m_lens, rng):
    """Reference implementation: plain Python loop over micro-batches with
    the same key schedule as the scan body in training/steps.py."""
    length_weight = HP.train.length_weight
    mb = B // ACCUM

    def loss_fn(p, bstats, tx, me, tl, ml, k_d, k_s):
        outs, updated = model.apply(
            {"params": p, "batch_stats": bstats},
            tx, me, ml, tl, reduction_factor=R, train=True, reduce_loss=True,
            rngs={"dropout": k_d, "sample": k_s}, mutable=["batch_stats"])
        _dec, mel_l2, kl, len_l2, _ali = outs
        loss = (mel_l2 + KLW * jnp.maximum(kl, 0.0) + length_weight * len_l2)
        return loss, (mel_l2, kl, len_l2, updated["batch_stats"])

    gsum = jax.tree_util.tree_map(jnp.zeros_like, params)
    totals = []
    bstats = batch_stats
    for i in range(ACCUM):
        sl = slice(i * mb, (i + 1) * mb)
        k_d, k_s = jax.random.split(jax.random.fold_in(rng, i))
        (loss, (_m, _k, _l, bstats)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params, bstats, texts[sl], mels[sl],
                                   t_lens[sl], m_lens[sl], k_d, k_s)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        totals.append(float(loss))
    grads = jax.tree_util.tree_map(lambda g: g / ACCUM, gsum)
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, bstats, new_opt_state, float(np.mean(totals))


class TestGradAccum:
    def test_matches_manual_accumulation(self, setup):
        """Identity-SGD optimizer so new_params - params IS the averaged
        gradient: compares the scan's accumulated grads, threaded
        batch_stats, and mean loss against the Python loop exactly. (Adam is
        deliberately NOT the comparison optimizer: on zero-init params the
        gradient is ~1e-8, sqrt(v) << eps, and the update amplifies
        reassociation-level noise into visible relative differences.)"""
        model, params, batch_stats, batch = setup
        hp_a = HP.replace(train=dataclasses.replace(HP.train,
                                                    grad_accum=ACCUM))
        optimizer = optax.sgd(1.0)
        opt_state = optimizer.init(params)
        rng = jax.random.key(99)

        step = make_train_step(hp_a, model, optimizer, donate=False)
        p1, bs1, os1, m1 = step(params, batch_stats, opt_state, *batch,
                                KLW, rng, reduction_factor=R)
        p2, bs2, os2, total2 = manual_accum_step(
            model, params, batch_stats, opt_state, optimizer, *batch, rng)

        g1 = jax.tree_util.tree_map(lambda new, old: old - new, p1, params)
        g2 = jax.tree_util.tree_map(lambda new, old: old - new, p2, params)
        flat1 = jax.tree_util.tree_leaves(g1)
        flat2 = jax.tree_util.tree_leaves(g2)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(bs1),
                        jax.tree_util.tree_leaves(bs2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        assert abs(float(m1["total"]) - total2) < 1e-4

    def test_differs_from_full_batch_only_stochastically(self, setup):
        """Sanity: the accumulated step optimizes the same objective — one
        step from the same init lands near the full-batch step (different
        z/dropout draws per micro-batch, so not exact)."""
        model, params, batch_stats, batch = setup
        optimizer = make_optimizer(HP)
        opt_state = optimizer.init(params)
        rng = jax.random.key(3)
        hp_a = HP.replace(train=dataclasses.replace(HP.train,
                                                    grad_accum=ACCUM))
        step_full = make_train_step(HP, model, optimizer, donate=False)
        step_acc = make_train_step(hp_a, model, optimizer, donate=False)
        _, _, _, m_full = step_full(params, batch_stats, opt_state, *batch,
                                    KLW, rng, reduction_factor=R)
        _, _, _, m_acc = step_acc(params, batch_stats, opt_state, *batch,
                                  KLW, rng, reduction_factor=R)
        assert np.isfinite(float(m_acc["total"]))
        # same objective from the same init: losses within a few percent
        assert abs(float(m_acc["total"]) - float(m_full["total"])) < \
            0.1 * abs(float(m_full["total"])) + 0.5

    def test_composes_with_dp_mesh(self, setup):
        """grad_accum under data parallelism: the micro-batch reshape of a
        dp-sharded batch compiles and runs on the 8-device mesh and matches
        the single-device accumulated step (XLA inserts the resharding the
        [A, B/A] split needs; correctness is the contract, per-chip layout
        efficiency is a single-host concern — DP users scale at batch 32 per
        chip, README batch-scaling row)."""
        from vaenar_tts_tpu.parallel import (batch_sharding, make_mesh,
                                             replicated)
        model, params, batch_stats, batch = setup
        hp_a = HP.replace(train=dataclasses.replace(HP.train,
                                                    grad_accum=ACCUM))
        optimizer = make_optimizer(HP)
        opt_state = optimizer.init(params)
        step = make_train_step(hp_a, model, optimizer, donate=False)
        rng = jax.random.key(5)
        _, _, _, m_single = step(params, batch_stats, opt_state, *batch,
                                 KLW, rng, reduction_factor=R)

        mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        params_s = jax.device_put(params, rep)
        bs_s = jax.device_put(batch_stats, rep)
        opt_s = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                       opt_state)
        args = [jax.device_put(a, bsh) for a in batch]
        _, _, _, m_dp = step(params_s, bs_s, opt_s, *args, KLW,
                             jax.device_put(rng, rep), reduction_factor=R)
        for k in m_single:
            assert float(m_single[k]) == pytest.approx(float(m_dp[k]),
                                                       rel=1e-3, abs=1e-6), k

    def test_rejects_indivisible_batch(self, setup):
        model, params, batch_stats, batch = setup
        hp_a = HP.replace(train=dataclasses.replace(HP.train, grad_accum=3))
        optimizer = make_optimizer(HP)
        opt_state = optimizer.init(params)
        step = make_train_step(hp_a, model, optimizer, donate=False)
        with pytest.raises(AssertionError, match="grad_accum"):
            step(params, batch_stats, opt_state, *batch, KLW,
                 jax.random.key(0), reduction_factor=R)

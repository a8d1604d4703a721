"""Neural-module unit tests: positional encoding closed form, attention
masking (padding invariance + causality), block shapes, length predictor,
posterior log-prob vs scipy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from vaenar_tts_tpu.models import (
    CrossAttentionBlock,
    DenseLengthPredictor,
    MultiHeadAttention,
    SelfAttentionBlock,
    gaussian_log_probability,
    positional_encoding,
    reparameterize,
    sequence_mask,
)


class TestPositionalEncoding:
    def test_closed_form(self):
        """pe[p,i] = sin(p*step/10000^(i/d)) even i, cos(p*step/10000^((i-1)/d))
        odd i (reference utils.py:332-355)."""
        L, D, step = 7, 6, 2.5
        pe = np.asarray(positional_encoding(L, D, step))
        for p in range(L):
            for i in range(D):
                if i % 2 == 0:
                    want = np.sin(p * step / np.power(10000.0, i / D))
                else:
                    want = np.cos(p * step / np.power(10000.0, (i - 1) / D))
                assert pe[p, i] == pytest.approx(want, abs=1e-5)

    def test_step_scales_positions(self):
        pe1 = np.asarray(positional_encoding(10, 8, 1.0))
        pe2 = np.asarray(positional_encoding(5, 8, 2.0))
        # position p at step 2 == position 2p at step 1
        np.testing.assert_allclose(pe2[3], pe1[6], atol=1e-6)


class TestSequenceMask:
    def test_basic(self):
        m = np.asarray(sequence_mask(jnp.array([2, 4]), 5))
        assert m.tolist() == [[True, True, False, False, False],
                              [True, True, True, True, False]]


class TestAttentionMasking:
    def _mha(self):
        return MultiHeadAttention(attention_dim=16, num_heads=2)

    def test_padding_invariance(self, rng):
        """Changing memory content beyond memory_lengths must not change the
        outputs at valid query positions."""
        m = self._mha()
        q = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
        mem = jnp.asarray(rng.standard_normal((2, 7, 8)), jnp.float32)
        qlen = jnp.array([5, 3])
        mlen = jnp.array([4, 7])
        v = m.init(jax.random.key(0), q, mem, qlen, mlen)
        out1, _ = m.apply(v, q, mem, qlen, mlen)
        mem2 = mem.at[0, 4:].set(99.0)  # poison padded region of example 0
        out2, _ = m.apply(v, q, mem2, qlen, mlen)
        np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                                   atol=1e-5)

    def test_causal(self, rng):
        """With causality, changing future positions must not affect past
        outputs."""
        m = self._mha()
        x = jnp.asarray(rng.standard_normal((1, 6, 8)), jnp.float32)
        lens = jnp.array([6])
        v = m.init(jax.random.key(0), x, x, lens, lens, causal=True)
        out1, ali = m.apply(v, x, x, lens, lens, causal=True)
        x2 = x.at[0, 4:].set(-50.0)
        out2, _ = m.apply(v, x2, x2, lens, lens, causal=True)
        np.testing.assert_allclose(np.asarray(out1[0, :4]),
                                   np.asarray(out2[0, :4]), atol=1e-5)
        # alignment rows are lower-triangular
        a = np.asarray(ali[0, 0])
        assert np.all(a[0, 1:] < 1e-6)

    def test_alignments_sum_to_one(self, rng):
        m = self._mha()
        q = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)
        mem = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)
        v = m.init(jax.random.key(0), q, mem, jnp.array([4, 4]), jnp.array([6, 5]))
        _, ali = m.apply(v, q, mem, jnp.array([4, 4]), jnp.array([6, 5]))
        np.testing.assert_allclose(np.asarray(ali).sum(-1), 1.0, atol=1e-5)
        # masked keys get ~zero weight
        assert float(np.asarray(ali)[1, :, :, 5].max()) < 1e-6


class TestBlocks:
    def test_self_attention_block_shape(self, rng):
        blk = SelfAttentionBlock(input_dim=8, attention_dim=16,
                                 attention_heads=2, ffn_hidden=32)
        x = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
        lens = jnp.array([5, 3])
        v = blk.init(jax.random.key(0), x, x, lens, lens)
        out, _ = blk.apply(v, x, x, lens, lens)
        assert out.shape == (2, 5, 8)

    def test_cross_attention_block_shape(self, rng):
        blk = CrossAttentionBlock(input_dim=16, attention_dim=16,
                                  attention_heads=2, ffn_hidden=32)
        x = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
        mem = jnp.asarray(rng.standard_normal((2, 7, 12)), jnp.float32)
        v = blk.init(jax.random.key(0), x, mem, jnp.array([5, 4]),
                     jnp.array([7, 6]))
        out, ali = blk.apply(v, x, mem, jnp.array([5, 4]), jnp.array([7, 6]))
        assert out.shape == (2, 5, 16)
        assert ali.shape == (2, 2, 5, 7)


class TestLengthPredictor:
    def test_masked_sum_of_exp(self, rng):
        m = DenseLengthPredictor(activation="identity")
        x = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)
        lens = jnp.array([4, 2])
        v = m.init(jax.random.key(0), x, lens)
        out = m.apply(v, x, lens)
        k = np.asarray(v["params"]["projection"]["kernel"])
        b = np.asarray(v["params"]["projection"]["bias"])
        proj = np.asarray(x) @ k + b  # [2, 4, 1]
        expected = np.array([
            np.exp(proj[0, :4]).sum(),
            np.exp(proj[1, :2]).sum(),
        ])
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


class TestGaussianLogProb:
    def test_matches_scipy(self, rng):
        B, T, D, N = 2, 5, 3, 1
        mu = rng.standard_normal((B, T, D)).astype(np.float32)
        logvar = rng.standard_normal((B, T, D)).astype(np.float32) * 0.3
        samples, eps = reparameterize(jax.random.key(0), jnp.asarray(mu),
                                      jnp.asarray(logvar), N)
        lens = jnp.array([3, 5])
        lp = np.asarray(gaussian_log_probability(
            jnp.asarray(mu), jnp.asarray(logvar), eps=eps, seq_lengths=lens))
        z = np.asarray(samples)
        std = np.exp(0.5 * logvar)
        for b, L in enumerate([3, 5]):
            want = 0.0
            for t in range(L):
                want += stats.norm.logpdf(z[b, 0, t], mu[b, t], std[b, t]).sum()
            assert lp[b, 0] == pytest.approx(want, rel=1e-4)

    def test_z_and_eps_paths_agree(self, rng):
        B, T, D, N = 2, 4, 3, 2
        mu = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
        logvar = jnp.asarray(rng.standard_normal((B, T, D)) * 0.2, jnp.float32)
        samples, eps = reparameterize(jax.random.key(1), mu, logvar, N)
        lens = jnp.array([4, 2])
        lp_eps = gaussian_log_probability(mu, logvar, eps=eps, seq_lengths=lens)
        lp_z = gaussian_log_probability(mu, logvar, z=samples, seq_lengths=lens)
        np.testing.assert_allclose(np.asarray(lp_eps), np.asarray(lp_z),
                                   rtol=1e-3)

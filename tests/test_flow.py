"""Flow-prior property tests (SURVEY.md section 7 hard part #2):
fwd(bwd(x)) == x, logdet antisymmetry, masked log-prob correctness, and
data-dependent ActNorm init producing ~N(0,1) outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaenar_tts_tpu.models.flow import (
    ActNorm,
    InvertibleLinear,
    TransformerCoupling,
)
from vaenar_tts_tpu.models.prior import TransformerPrior

B, T, C = 2, 12, 8
COND_T, COND_D = 7, 16


@pytest.fixture
def lengths():
    return jnp.array([9, 12], dtype=jnp.int32)


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)


@pytest.fixture
def cond(rng):
    return jnp.asarray(rng.standard_normal((B, COND_T, COND_D)), jnp.float32)


@pytest.fixture
def cond_lengths():
    return jnp.array([5, 7], dtype=jnp.int32)


class TestActNorm:
    def test_invertible(self, x, lengths):
        m = ActNorm(C)
        v = m.init(jax.random.key(0), x, lengths)
        y, logdet_f = m.apply(v, x, lengths)
        x2, logdet_b = m.apply(v, y, lengths, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
        np.testing.assert_allclose(np.asarray(logdet_f), -np.asarray(logdet_b),
                                   atol=1e-4)

    def test_logdet_scales_with_length(self, x, lengths):
        m = ActNorm(C)
        v = m.init(jax.random.key(0), x, lengths)
        _, logdet = m.apply(v, x, lengths)
        ls = v["params"]["log_scale"]
        expected = np.asarray(lengths, np.float32) * float(jnp.sum(ls))
        np.testing.assert_allclose(np.asarray(logdet), expected, rtol=1e-5)

    def test_data_init_normalizes(self, x, lengths):
        m = ActNorm(C)
        v = m.init(jax.random.key(0), x, lengths)
        x_shifted = x * 3.0 + 5.0
        (y, _), aux = m.apply(v, x_shifted, lengths, data_init=True,
                              mutable=["flow_init"])
        flat = np.asarray(y).reshape(-1, C)
        np.testing.assert_allclose(flat.mean(0), 0.0, atol=1e-3)
        np.testing.assert_allclose(flat.std(0), 1.0, atol=1e-3)
        # sowed stats reproduce the transform when merged into params
        fi = aux["flow_init"]
        assert "log_scale" in fi and "bias" in fi


class TestInvertibleLinear:
    def test_init_is_orthogonal(self, x):
        m = InvertibleLinear(C)
        v = m.init(jax.random.key(0), x)
        w = np.asarray(v["params"]["weight"])
        np.testing.assert_allclose(w @ w.T, np.eye(C), atol=1e-5)

    def test_invertible(self, x, lengths):
        m = InvertibleLinear(C)
        v = m.init(jax.random.key(1), x, lengths)
        y, logdet_f = m.apply(v, x, lengths)
        x2, logdet_b = m.apply(v, y, lengths, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
        np.testing.assert_allclose(np.asarray(logdet_f), -np.asarray(logdet_b),
                                   atol=1e-4)

    def test_logdet_matches_numpy(self, x, lengths):
        m = InvertibleLinear(C)
        v = m.init(jax.random.key(1), x, lengths)
        # perturb the weight so logdet is nonzero
        w = np.asarray(v["params"]["weight"]) * 1.3
        v = {"params": {"weight": jnp.asarray(w)}}
        _, logdet = m.apply(v, x, lengths)
        expected = np.asarray(lengths, np.float32) * np.linalg.slogdet(w)[1]
        np.testing.assert_allclose(np.asarray(logdet), expected, rtol=1e-4)


class TestPrecomputedStack:
    """The Glow prior factors its whole InvertibleLinear stack with ONE
    batched LU (flow.py::precompute_invertible_stack). Same math as the
    per-layer inv/slogdet path — prove it, values and gradients."""

    def _stack(self, rng, n=5):
        ws = []
        for i in range(n):
            q, _ = np.linalg.qr(rng.standard_normal((C, C)))
            ws.append(q * (0.7 + 0.1 * i))  # non-unit |det|
        return jnp.asarray(np.stack(ws), jnp.float32)

    @pytest.mark.parametrize("reverse", [False, True])
    def test_matches_per_layer_inv_slogdet(self, rng, reverse):
        from vaenar_tts_tpu.models.flow import precompute_invertible_stack
        ws = self._stack(rng)
        mats, lds = precompute_invertible_stack(ws, reverse=reverse)
        for i in range(ws.shape[0]):
            w = np.asarray(ws[i], np.float64)
            expect = np.linalg.inv(w) if reverse else w
            np.testing.assert_allclose(np.asarray(mats[i]), expect,
                                       rtol=2e-5, atol=2e-6)
            np.testing.assert_allclose(float(lds[i]),
                                       np.linalg.slogdet(w)[1], rtol=2e-5,
                                       atol=1e-5)

    @pytest.mark.parametrize("reverse", [False, True])
    def test_gradients_match_per_layer_path(self, rng, x, lengths, reverse):
        from vaenar_tts_tpu.models.flow import precompute_invertible_stack
        ws = self._stack(rng, n=3)
        xs = jnp.asarray(rng.standard_normal((3, B, T, C)), jnp.float32)

        def loss_pre(ws):
            mats, lds = precompute_invertible_stack(ws, reverse=reverse)
            out = jnp.einsum("nbtc,ncd->nbtd", xs, mats)
            return jnp.sum(out ** 2) + jnp.sum(lds)

        def loss_ref(ws):
            total = 0.0
            for i in range(ws.shape[0]):
                w = ws[i]
                mat = jnp.linalg.inv(w) if reverse else w
                total += jnp.sum(jnp.matmul(xs[i], mat) ** 2)
                total += jnp.linalg.slogdet(w)[1]
            return total

        g_pre = jax.grad(loss_pre)(ws)
        g_ref = jax.grad(loss_ref)(ws)
        np.testing.assert_allclose(float(loss_pre(ws)), float(loss_ref(ws)),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_pre), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)

    def test_invertible_linear_accepts_precomputed(self, rng, x, lengths):
        from vaenar_tts_tpu.models.flow import precompute_invertible_stack
        m = InvertibleLinear(C)
        v = m.init(jax.random.key(1), x, lengths)
        w = jnp.asarray(np.asarray(v["params"]["weight"]) * 1.3)
        v = {"params": {"weight": w}}
        mats, lds = precompute_invertible_stack(w[None], reverse=True)
        y_ref, ld_ref = m.apply(v, x, lengths, reverse=True)
        y_pre, ld_pre = m.apply(v, x, lengths, reverse=True,
                                precomputed=(mats[0], lds[0]))
        np.testing.assert_allclose(np.asarray(y_pre), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ld_pre), np.asarray(ld_ref),
                                   rtol=1e-5)


class TestCoupling:
    @pytest.mark.parametrize("order", ["upper", "lower"])
    def test_invertible(self, x, cond, lengths, cond_lengths, order):
        m = TransformerCoupling(channels=C, nblk=1, attention_dim=8,
                                attention_heads=2, temperature=1.0,
                                ffn_hidden=16, order=order)
        v = m.init(jax.random.key(2), x, cond, lengths, cond_lengths)
        y, logdet_f = m.apply(v, x, cond, lengths, cond_lengths)
        x2, logdet_b = m.apply(v, y, cond, lengths, cond_lengths, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
        np.testing.assert_allclose(np.asarray(logdet_f), -np.asarray(logdet_b),
                                   atol=1e-3)

    def test_zero_init_is_near_identity_affine(self, x, cond, lengths,
                                               cond_lengths):
        """Zero-init heads => log_scale=0, shift=0 => scale=sigmoid(2),
        logdet = lengths * (C/2) * log(sigmoid(2))."""
        m = TransformerCoupling(channels=C, nblk=1, attention_dim=8,
                                attention_heads=2, temperature=1.0,
                                ffn_hidden=16, order="upper")
        v = m.init(jax.random.key(2), x, cond, lengths, cond_lengths)
        y, logdet = m.apply(v, x, cond, lengths, cond_lengths)
        s = 1.0 / (1.0 + np.exp(-2.0))
        expected_logdet = np.asarray(lengths, np.float32) * (C // 2) * np.log(s)
        np.testing.assert_allclose(np.asarray(logdet), expected_logdet,
                                   rtol=1e-4)
        # conditioning half unchanged
        np.testing.assert_allclose(np.asarray(y[..., : C // 2]),
                                   np.asarray(x[..., : C // 2]), atol=1e-6)


class TestPrior:
    def _make(self, **kw):
        return TransformerPrior(n_blk=2, channels=C, n_transformer_blk=1,
                                attention_dim=8, attention_heads=2,
                                temperature=1.0, ffn_hidden=16, **kw)

    def test_batched_lu_knob_is_numerically_inert(self, cond, lengths,
                                                  cond_lengths):
        """hp.prior.batched_lu toggles HOW the invertible linears factor
        (one batched lu_factor vs per-layer inv/slogdet), never WHAT they
        compute: sample and log_probability agree across the knob."""
        m_on, m_off = self._make(batched_lu=True), self._make(batched_lu=False)
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        v = m_on.init(rngs, lengths, cond, cond_lengths, max_length=T,
                      method=TransformerPrior.sample)
        z_on, lp_on = m_on.apply(v, lengths, cond, cond_lengths, max_length=T,
                                 method=TransformerPrior.sample,
                                 rngs={"sample": jax.random.key(7)})
        z_off, lp_off = m_off.apply(v, lengths, cond, cond_lengths,
                                    max_length=T,
                                    method=TransformerPrior.sample,
                                    rngs={"sample": jax.random.key(7)})
        np.testing.assert_allclose(np.asarray(z_on), np.asarray(z_off),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lp_on), np.asarray(lp_off),
                                   rtol=1e-5, atol=1e-3)
        rev_on = m_on.apply(v, z_on, cond, z_lengths=lengths,
                            condition_lengths=cond_lengths,
                            method=TransformerPrior.log_probability)
        rev_off = m_off.apply(v, z_on, cond, z_lengths=lengths,
                              condition_lengths=cond_lengths,
                              method=TransformerPrior.log_probability)
        np.testing.assert_allclose(np.asarray(rev_on), np.asarray(rev_off),
                                   rtol=1e-5, atol=1e-3)

    def test_sample_then_logprob_consistent(self, cond, lengths, cond_lengths):
        """log_probability(sample(eps)) must equal the log-prob accumulated
        during sampling: the reverse pass exactly inverts the forward pass."""
        m = self._make()
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        v = m.init(rngs, lengths, cond, cond_lengths, max_length=T,
                   method=TransformerPrior.sample)
        z, logprob_fwd = m.apply(v, lengths, cond, cond_lengths, max_length=T,
                                 method=TransformerPrior.sample,
                                 rngs={"sample": jax.random.key(7)})
        logprob_rev = m.apply(v, z, cond, z_lengths=lengths,
                              condition_lengths=cond_lengths,
                              method=TransformerPrior.log_probability)
        np.testing.assert_allclose(np.asarray(logprob_fwd),
                                   np.asarray(logprob_rev), rtol=1e-3,
                                   atol=1e-2)

    def test_temperature_zero_is_deterministic(self, cond, lengths,
                                               cond_lengths):
        m = self._make()
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        v = m.init(rngs, lengths, cond, cond_lengths, max_length=T,
                   method=TransformerPrior.sample)
        z1, _ = m.apply(v, lengths, cond, cond_lengths, max_length=T,
                        temperature=0.0, method=TransformerPrior.sample,
                        rngs={"sample": jax.random.key(3)})
        z2, _ = m.apply(v, lengths, cond, cond_lengths, max_length=T,
                        temperature=0.0, method=TransformerPrior.sample,
                        rngs={"sample": jax.random.key(99)})
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)

    def test_init_pass_sows_flow_init(self, cond, lengths, cond_lengths):
        m = self._make()
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        v = m.init(rngs, lengths, cond, cond_lengths, max_length=T,
                   method=TransformerPrior.sample)
        (_z, _lp), aux = m.apply(v, cond, lengths, cond_lengths, max_length=T,
                                 method=TransformerPrior.init_pass,
                                 rngs={"sample": jax.random.key(5)},
                                 mutable=["flow_init"])
        fi = aux["flow_init"]
        # one sowed pair per actnorm
        names = sorted(fi.keys())
        assert names == ["actnorm_0", "actnorm_1"]
        for k in names:
            assert set(fi[k].keys()) == {"log_scale", "bias"}

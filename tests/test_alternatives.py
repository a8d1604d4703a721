"""Alternative-module tests: shapes, masking, highway algebra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaenar_tts_tpu.models.alternatives import (
    BahdanauAttention,
    CBHGLayer,
    CBHLayer,
    ConvLengthPredictor,
    HighwayLayer,
    LSTMDecoder,
    TacotronDecoder,
    TacotronEncoder,
)


@pytest.fixture
def xs(rng):
    q = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((2, 7, 12)), jnp.float32)
    return q, mem


class TestBahdanau:
    def test_shapes_and_masking(self, xs, rng):
        q, mem = xs
        m = BahdanauAttention(attention_dim=16)
        v = m.init(jax.random.key(0), q, mem, jnp.array([7, 4]))
        ctx, ali = m.apply(v, q, mem, jnp.array([7, 4]))
        assert ctx.shape == (2, 5, 16)
        assert ali.shape == (2, 5, 7)
        np.testing.assert_allclose(np.asarray(ali).sum(-1), 1.0, atol=1e-5)
        assert float(np.asarray(ali)[1, :, 4:].max()) < 1e-6  # masked keys

    def test_padding_invariance(self, xs):
        q, mem = xs
        m = BahdanauAttention(attention_dim=16)
        lens = jnp.array([5, 3])
        v = m.init(jax.random.key(0), q, mem, lens)
        out1, _ = m.apply(v, q, mem, lens)
        mem2 = mem.at[1, 3:].set(77.0)
        out2, _ = m.apply(v, q, mem2, lens)
        np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]),
                                   atol=1e-5)


class TestSmallModules:
    def test_conv_length_predictor(self, xs):
        q, _ = xs
        m = ConvLengthPredictor(n_conv=1, conv_filter=8, conv_kernel=3)
        v = m.init(jax.random.key(0), q, jnp.array([5, 3]))
        out = m.apply(v, q, jnp.array([5, 3]))
        assert out.shape == (2,)
        assert np.all(np.asarray(out) > 0)

    def test_highway_identity_gate(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)
        m = HighwayLayer(out_dim=8)
        v = m.init(jax.random.key(0), x)
        # force the gate closed: sigmoid(-inf) = 0 -> output == input
        import flax
        p = flax.core.unfreeze(v["params"])
        p["highway_sigmoid"]["kernel"] = jnp.zeros_like(
            p["highway_sigmoid"]["kernel"])
        p["highway_sigmoid"]["bias"] = jnp.full_like(
            p["highway_sigmoid"]["bias"], -30.0)
        out = m.apply({"params": p}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_cbh_and_cbhg(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)
        cbh = CBHLayer(n_convbank=2, bank_filters=8, proj_filters=8,
                       proj_kernel=3, n_highwaylayer=1, highway_out_dim=8)
        v = cbh.init(jax.random.key(0), x)
        assert cbh.apply(v, x).shape == (2, 6, 8)
        cbhg = CBHGLayer(n_convbank=2, bank_filters=8, proj_filters=8,
                         proj_kernel=3, n_highwaylayer=1, highway_out_dim=8,
                         gru_hidden=4)
        v = cbhg.init(jax.random.key(0), x)
        assert cbhg.apply(v, x).shape == (2, 6, 8)  # 2*gru_hidden


class TestRecurrentStacks:
    def test_tacotron_encoder(self):
        m = TacotronEncoder(vocab_size=43, embd_dim=8, n_conv=1,
                            conv_filter=8, conv_kernel=3, lstm_hidden=4)
        ids = jnp.ones((2, 6), jnp.int32)
        v = m.init(jax.random.key(0), ids)
        out = m.apply(v, ids)
        assert out.shape == (2, 6, 8)  # 2 * lstm_hidden

    def test_lstm_decoder(self, xs):
        q, mem = xs
        m = LSTMDecoder(in_lstm_hidden=8, attention_dim=8,
                        attention_temperature=1.0, n_dec_lstm=2,
                        dec_lstm_hidden=8, out_dim=80)
        v = m.init(jax.random.key(0), q, mem)
        out, ali = m.apply(v, q, mem, text_lengths=jnp.array([7, 5]))
        assert out.shape == (2, 5, 80)
        assert ali.shape == (2, 5, 7)

    def test_tacotron_decoder(self, xs):
        q, mem = xs
        m = TacotronDecoder(in_lstm_hidden=8, attention_dim=8,
                            attention_temperature=1.0, dec_n_lstm=2,
                            dec_lstm_hidden=8, n_conv=2, conv_filters=8,
                            conv_kernel=3, out_dim=80)
        v = m.init(jax.random.key(0), q, mem)
        out, alis = m.apply(v, q, mem, text_lengths=jnp.array([7, 5]))
        assert out.shape == (2, 5, 80)
        assert len(alis) == 2


class TestLocationSensitiveAttention:
    def _run(self, cumulative, rng):
        import jax
        import jax.numpy as jnp

        from vaenar_tts_tpu.models.alternatives import (
            LocationSensitiveAttention)
        B, Tq, Tm = 2, 6, 9
        q = jnp.asarray(rng.standard_normal((B, Tq, 8)), jnp.float32)
        mem = jnp.asarray(rng.standard_normal((B, Tm, 12)), jnp.float32)
        mlens = jnp.asarray([9, 5], jnp.int32)
        mod = LocationSensitiveAttention(attention_dim=16, location_filter=4,
                                         location_kernel=5,
                                         cumulative_weights=cumulative)
        v = mod.init(jax.random.key(0), q, mem, memory_lengths=mlens)
        ctx, ali = mod.apply(v, q, mem, memory_lengths=mlens)
        return np.asarray(ctx), np.asarray(ali)

    def test_shapes_mask_and_normalization(self, rng):
        ctx, ali = self._run(True, rng)
        assert ctx.shape == (2, 6, 16) and ali.shape == (2, 6, 9)
        # rows are softmax-normalized and masked beyond memory_lengths
        np.testing.assert_allclose(ali.sum(-1), 1.0, atol=1e-5)
        assert np.abs(ali[1, :, 5:]).max() < 1e-6
        assert np.isfinite(ctx).all()

    def test_location_recurrence_feeds_forward(self, rng):
        """With cumulative weights the alignment at step t depends on all
        previous steps' alignments (the location conv), so zeroing the
        location kernel must change later steps, not the first."""
        import jax
        import jax.numpy as jnp

        from vaenar_tts_tpu.models.alternatives import (
            LocationSensitiveAttention)
        B, Tq, Tm = 1, 5, 8
        q = jnp.asarray(rng.standard_normal((B, Tq, 8)), jnp.float32)
        mem = jnp.asarray(rng.standard_normal((B, Tm, 12)), jnp.float32)
        mod = LocationSensitiveAttention(attention_dim=16, location_filter=4,
                                         location_kernel=5)
        v = mod.init(jax.random.key(1), q, mem)
        _, ali = mod.apply(v, q, mem)
        import flax
        v0 = flax.core.unfreeze(v)
        v0["params"]["location_conv_kernel"] = jnp.zeros_like(
            v0["params"]["location_conv_kernel"])
        _, ali0 = mod.apply(flax.core.freeze(v0), q, mem)
        ali, ali0 = np.asarray(ali), np.asarray(ali0)
        # first query step sees zero previous weights either way -> identical
        np.testing.assert_allclose(ali[:, 0], ali0[:, 0], atol=1e-6)
        # later steps diverge: the recurrence is real
        assert np.abs(ali[:, 1:] - ali0[:, 1:]).max() > 1e-6


def test_dcn_module_shapes_and_receptive_field(rng):
    """Stacked dilations 1,2,4: output at t depends on inputs within the
    composed receptive field and shapes are preserved."""
    import jax
    import jax.numpy as jnp

    from vaenar_tts_tpu.models.alternatives import DCNModule
    x = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    mod = DCNModule(n_block=3, filters=8, kernel=3)
    v = mod.init(jax.random.key(0), x)
    y = mod.apply(v, x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
    # perturb one frame: the effect must stay within the receptive field
    # (radius = sum of 2 convs per block * dilation * (k-1)/2 = 14)
    x2 = x.at[0, 16].add(10.0)
    y2 = mod.apply(v, x2)
    d = np.abs(np.asarray(y2 - y))[0].max(axis=-1)
    assert d[16] > 1e-3
    assert d[: 16 - 14].max() < 1e-5 and d[16 + 15:].max() < 1e-5

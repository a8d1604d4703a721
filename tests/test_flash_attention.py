"""Fused Pallas attention numerics vs the XLA reference implementation
(interpret mode on the CPU mesh; compiled Mosaic on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaenar_tts_tpu.models.attention import attention_mask, masked_attention_xla
from vaenar_tts_tpu.ops.flash_attention import masked_flash_attention

B, H, D = 2, 4, 16


def _inputs(tq, tk, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, tq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, tk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, tk, D)), jnp.float32)
    qlen = jnp.asarray(rng.integers(1, tq + 1, (B,)), jnp.int32)
    mlen = jnp.asarray(rng.integers(1, tk + 1, (B,)), jnp.int32)
    return q, k, v, qlen, mlen


@pytest.mark.parametrize("tq,tk,causal", [
    (64, 48, False),
    (64, 64, True),
    (128, 96, False),
    (120, 96, False),  # bucketed z-length: exercises the divisor blocking
])
def test_matches_xla_reference(tq, tk, causal):
    q, k, v, qlen, mlen = _inputs(tq, tk)
    scale = 1.0 / np.sqrt(D)
    fused = masked_flash_attention(q, k, v, qlen, mlen, scale, causal)
    mask = attention_mask(qlen, mlen, B, tq, tk, causal)
    ref, _ = masked_attention_xla(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_none_lengths_means_full():
    q, k, v, _, _ = _inputs(64, 64, seed=3)
    scale = 0.3
    fused = masked_flash_attention(q, k, v, None, None, scale, False)
    mask = attention_mask(None, None, B, 64, 64, False)
    ref, _ = masked_attention_xla(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_gradients_match_xla():
    q, k, v, qlen, mlen = _inputs(64, 48, seed=7)
    scale = 1.0 / np.sqrt(D)

    def loss_fused(q, k, v):
        return jnp.sum(masked_flash_attention(q, k, v, qlen, mlen, scale,
                                              False) ** 2)

    def loss_ref(q, k, v):
        mask = attention_mask(qlen, mlen, B, 64, 48, False)
        out, _ = masked_attention_xla(q, k, v, mask, scale)
        return jnp.sum(out ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.parametrize("tq,tk,causal", [
    (64, 64, True),    # causal band through the fused backward
    (128, 96, False),  # rectangular blocks
    (60, 48, False),   # ragged Tq: falls back to the XLA VJP
    (64, 60, False),   # ragged Tk: fused fwd, XLA bwd fallback
])
def test_fused_backward_matches_xla(tq, tk, causal):
    q, k, v, qlen, mlen = _inputs(tq, tk, seed=11)
    scale = 1.0 / np.sqrt(D)

    def loss_fused(q, k, v):
        return jnp.sum(masked_flash_attention(q, k, v, qlen, mlen, scale,
                                              causal) ** 3)

    def loss_ref(q, k, v):
        mask = attention_mask(qlen, mlen, B, tq, tk, causal)
        out, _ = masked_attention_xla(q, k, v, mask, scale)
        return jnp.sum(out ** 3)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_fully_masked_rows_gradient_parity():
    """Padded query rows degrade to uniform attention in BOTH directions:
    the fused backward recomputes exactly the XLA path's gradient."""
    q, k, v, _, _ = _inputs(64, 64, seed=13)
    qlen = jnp.array([8, 64])   # batch 0 has 56 fully-masked query rows
    mlen = jnp.array([64, 5])
    scale = 0.25

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return f

    fused = lambda q_, k_, v_: masked_flash_attention(
        q_, k_, v_, qlen, mlen, scale, False)

    def ref(q_, k_, v_):
        mask = attention_mask(qlen, mlen, B, 64, 64, False)
        out, _ = masked_attention_xla(q_, k_, v_, mask, scale)
        return out

    g_fused = jax.grad(loss(fused), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(ref), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_auto_selection_policy():
    from vaenar_tts_tpu.ops.flash_attention import pallas_profitable
    assert pallas_profitable(1024, 1024)   # measured 2.43x fwd (README table)
    assert pallas_profitable(2048, 2048)
    assert pallas_profitable(768, 768)     # measured 2.04x fwd
    assert not pallas_profitable(512, 512)  # measured: XLA wins below 640^2
    assert not pallas_profitable(60, 32)   # shipped short shapes stay on XLA
    assert not pallas_profitable(240, 64)


def test_auto_mode_keeps_alignments_on_short_shapes():
    """use_pallas='auto' routes short sequences to XLA, so alignments stay
    materialized (the plotted artifact path)."""
    from vaenar_tts_tpu.models.attention import MultiHeadAttention

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 16)), jnp.float32)
    mha = MultiHeadAttention(attention_dim=16, num_heads=2, use_pallas="auto")
    variables = mha.init(jax.random.key(0), x, x)
    _, ali = mha.apply(variables, x, x)
    assert ali is not None and ali.shape == (2, 2, 32, 32)


def test_module_level_equivalence():
    """A full CrossAttentionBlock produces the same outputs with the fused
    kernel and the XLA path, given identical params."""
    import flax
    from vaenar_tts_tpu.models.attention import CrossAttentionBlock

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((2, 32, 24)), jnp.float32)
    qlen = jnp.array([50, 64])
    mlen = jnp.array([32, 20])

    blk_xla = CrossAttentionBlock(input_dim=16, attention_dim=16,
                                  attention_heads=2, ffn_hidden=32,
                                  use_pallas=False)
    blk_pal = CrossAttentionBlock(input_dim=16, attention_dim=16,
                                  attention_heads=2, ffn_hidden=32,
                                  use_pallas=True)
    v = blk_xla.init(jax.random.key(0), x, mem, qlen, mlen)
    out_xla, _ = blk_xla.apply(v, x, mem, qlen, mlen)
    out_pal, _ = blk_pal.apply(v, x, mem, qlen, mlen)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               atol=5e-5)


class TestBlockedForward:
    """The k-blocked online-softmax forward (Tk past the full-K/V VMEM
    budget) must match the XLA reference and feed the blocked backward
    through the same (m, s) stats contract."""

    @pytest.fixture(autouse=True)
    def small_threshold(self, monkeypatch):
        import vaenar_tts_tpu.ops.flash_attention as fa
        monkeypatch.setattr(fa, "FULL_KV_MAX_LENGTH", 64)

    @pytest.mark.parametrize("tq,tk,causal", [
        (128, 128, False),
        (128, 128, True),
        (64, 96, False),   # tk > threshold, bk=32 blocks
        (120, 96, True),   # bucketed q, blocked k
    ])
    def test_values_match_xla(self, tq, tk, causal):
        q, k, v, qlen, mlen = _inputs(tq, tk, seed=11)
        scale = 1.0 / np.sqrt(D)
        fused = masked_flash_attention(q, k, v, qlen, mlen, scale, causal)
        mask = attention_mask(qlen, mlen, B, tq, tk, causal)
        ref, _ = masked_attention_xla(q, k, v, mask, scale)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=3e-5)

    def test_fully_masked_rows_uniform(self):
        """Rows past q_len attend uniformly (reference semantics) on the
        blocked path too."""
        q, k, v, _, _ = _inputs(128, 128, seed=5)
        qlen = jnp.asarray([4, 8], jnp.int32)
        mlen = jnp.asarray([128, 128], jnp.int32)
        scale = 1.0 / np.sqrt(D)
        fused = masked_flash_attention(q, k, v, qlen, mlen, scale, False)
        uniform = jnp.mean(v, axis=2, keepdims=True)
        np.testing.assert_allclose(np.asarray(fused[0, :, 10:12]),
                                   np.tile(np.asarray(uniform[0]), (2, 1)),
                                   atol=3e-5)

    def test_gradients_match_xla(self):
        q, k, v, qlen, mlen = _inputs(128, 128, seed=13)
        scale = 1.0 / np.sqrt(D)

        def loss(fn):
            def f(q, k, v):
                return jnp.sum(fn(q, k, v) ** 2)
            return f

        def fused_fn(q, k, v):
            return masked_flash_attention(q, k, v, qlen, mlen, scale, True)

        def ref_fn(q, k, v):
            mask = attention_mask(qlen, mlen, B, 128, 128, True)
            out, _ = masked_attention_xla(q, k, v, mask, scale)
            return out

        g_fused = jax.grad(loss(fused_fn), argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss(ref_fn), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)

"""Ring self-attention vs full masked attention on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vaenar_tts_tpu.models.attention import attention_mask, masked_attention_xla
from vaenar_tts_tpu.parallel.ring_attention import ring_self_attention

B, H, T, D = 2, 4, 64, 16


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:4]), ("sp",))


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    lengths = jnp.asarray(rng.integers(T // 2, T + 1, (B,)), jnp.int32)
    return q, k, v, lengths


@pytest.mark.parametrize("causal", [False, True])
def test_matches_full_attention(mesh, causal):
    q, k, v, lengths = _inputs()
    scale = 1.0 / np.sqrt(D)
    ring = ring_self_attention(q, k, v, lengths, mesh, scale=scale,
                               causal=causal, axis="sp")
    mask = attention_mask(lengths, lengths, B, T, T, causal)
    full, _ = masked_attention_xla(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(full), atol=2e-5)


def test_fully_masked_rows_are_uniform(mesh):
    """Query rows beyond the length must produce the uniform-attention value
    (mean of v), matching the single-device masked-softmax semantics."""
    q, k, v, _ = _inputs(seed=3)
    lengths = jnp.asarray([T // 4, T], jnp.int32)
    scale = 1.0 / np.sqrt(D)
    ring = ring_self_attention(q, k, v, lengths, mesh, scale=scale, axis="sp")
    mask = attention_mask(lengths, lengths, B, T, T, False)
    full, _ = masked_attention_xla(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(full), atol=2e-5)
    # padded query row == mean over all keys
    row = np.asarray(ring)[0, 0, T // 4 + 1]
    np.testing.assert_allclose(row, np.asarray(v)[0, 0].mean(0), atol=2e-5)


def test_gradients_flow(mesh):
    q, k, v, lengths = _inputs(seed=5)
    scale = 1.0 / np.sqrt(D)

    def loss_ring(q, k, v):
        return jnp.sum(ring_self_attention(q, k, v, lengths, mesh,
                                           scale=scale, axis="sp") ** 2)

    def loss_full(q, k, v):
        mask = attention_mask(lengths, lengths, B, T, T, False)
        out, _ = masked_attention_xla(q, k, v, mask, scale)
        return jnp.sum(out ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_missing_batch_axis_falls_back_to_replication(mesh):
    """A mesh WITHOUT the default 'data' batch axis must degrade to
    batch-replicated ring attention, not raise KeyError (round-2 review
    fix: user-supplied SP-only meshes)."""
    q, k, v, lengths = _inputs()
    scale = 1.0 / np.sqrt(D)
    ring = ring_self_attention(q, k, v, lengths, mesh, scale=scale,
                               causal=True, axis="sp", batch_axis="data")
    mask = attention_mask(lengths, lengths, B, T, T, True)
    full, _ = masked_attention_xla(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(full), atol=2e-5)

"""Attention-based VAE posterior q(z | mel, text)
(reference modules/posterior.py:90-138).

PreNet -> positional encoding (trainable weight) -> N CrossAttentionBlocks
attending to text -> zero-initialized mu / logvar heads. The reference's
caller unpacks the two heads swapped (models.py:136 vs posterior.py:130);
both are zero-init symmetric learned heads, so this build uses the straight
(mu, logvar) order (SURVEY.md section 2.1: do not replicate the confusion).

Reparameterization and diagonal-Gaussian masked log-prob are pure functions
(reference posterior.py:21-72) with explicit PRNG keys.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import CrossAttentionBlock, maybe_remat
from .layers import PreNet, positional_encoding, sequence_mask

Dtype = Any
LOG_2PI = math.log(2.0 * math.pi)


def reparameterize(rng: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray,
                   nsamples: int = 1, random: bool = True
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """samples = eps * std + mu, eps ~ N(0,1); returns
    (samples, eps) of shape [batch, nsamples, max_time, dim]
    (reference posterior.py:21-39)."""
    batch, max_time, dim = mu.shape
    std = jnp.exp(0.5 * logvar)
    if random:
        eps = jax.random.normal(rng, (batch, nsamples, max_time, dim),
                                dtype=mu.dtype)
    else:
        eps = jnp.zeros((batch, nsamples, max_time, dim), dtype=mu.dtype)
    samples = eps * std[:, None] + mu[:, None]
    return samples, eps


def gaussian_log_probability(mu: jnp.ndarray, logvar: jnp.ndarray,
                             z: Optional[jnp.ndarray] = None,
                             eps: Optional[jnp.ndarray] = None,
                             seq_lengths: Optional[jnp.ndarray] = None,
                             epsilon: float = 1e-8) -> jnp.ndarray:
    """Masked diagonal-Gaussian log-prob, [batch, nsamples]
    (reference posterior.py:41-72)."""
    batch, max_time, dim = mu.shape
    mu32 = mu.astype(jnp.float32)
    logvar32 = logvar.astype(jnp.float32)
    if eps is None:
        std = jnp.exp(0.5 * logvar32)
        eps = (z.astype(jnp.float32) - mu32[:, None]) / (std[:, None] + epsilon)
    else:
        eps = eps.astype(jnp.float32)
    expanded_logvar = logvar32[:, None]  # [batch, 1, max_time, dim]
    time_level = -0.5 * (float(dim) * LOG_2PI
                         + jnp.sum(expanded_logvar + eps ** 2, axis=3))
    if seq_lengths is not None:
        mask = sequence_mask(seq_lengths, max_time, dtype=jnp.float32)
    else:
        mask = jnp.ones((batch, max_time), dtype=jnp.float32)
    return jnp.sum(mask[:, None] * time_level, axis=2)


class TransformerPosterior(nn.Module):
    pre_hidden: int
    pre_drop_rate: float
    pre_activation: str
    pos_drop_rate: float
    nblk: int
    attention_dim: int
    attention_heads: int
    temperature: float
    ffn_hidden: int
    latent_dim: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    ring_mesh: Optional[Any] = None
    ring_axis: str = "model"
    tuning: Optional[Any] = None
    remat: Any = "off"

    @nn.compact
    def __call__(self, inputs, src_enc, src_lengths=None, target_lengths=None,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """inputs: reduced mels [batch, tgt_max_time, num_mels];
        src_enc: text encodings [batch, src_max_time, embd_dim].
        Returns (mu, logvar), each [batch, tgt_max_time, latent_dim]."""
        x = PreNet(units=self.pre_hidden, drop_rate=self.pre_drop_rate,
                   activation=self.pre_activation, dtype=self.dtype,
                   name="decoder_prenet")(inputs, train=train)
        max_time, dim = x.shape[1], x.shape[2]
        pos_weight = self.param("pos_weight", nn.initializers.ones, ())
        x = x + pos_weight * positional_encoding(max_time, dim, dtype=self.dtype)[None]
        x = nn.Dropout(self.pos_drop_rate, deterministic=not train)(x)
        block_cls = maybe_remat(CrossAttentionBlock, self.remat)
        for i in range(self.nblk):
            x, _ = block_cls(
                input_dim=self.pre_hidden, attention_dim=self.attention_dim,
                attention_heads=self.attention_heads,
                attention_temperature=self.temperature,
                ffn_hidden=self.ffn_hidden, dtype=self.dtype,
                use_pallas=self.use_pallas, ring_mesh=self.ring_mesh,
                ring_axis=self.ring_axis, tuning=self.tuning,
                name=f"attention_{i}")(
                x, src_enc, query_lengths=target_lengths,
                memory_lengths=src_lengths)
        mu = nn.Dense(self.latent_dim, kernel_init=nn.initializers.zeros,
                      name="mu_projection")(x)
        logvar = nn.Dense(self.latent_dim, kernel_init=nn.initializers.zeros,
                          name="logvar_projection")(x)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)

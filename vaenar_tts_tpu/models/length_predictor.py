"""Utterance length predictor
(reference modules/length_predictor.py:30-42, DenseLengthPredictor).

Per-token Dense(1) on (stop-gradient'd, by the caller) text embeddings;
predicted frame count = masked sum over tokens of exp(projection).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import get_activation, sequence_mask

Dtype = Any


def masked_exp_sum(proj: jnp.ndarray,
                   input_lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """[batch, max_time, 1] per-token logits -> [batch] predicted frame
    counts: fp32 masked sum of exp (reference length_predictor.py:35-42).
    One shared implementation for both predictor variants so masking/
    overflow changes cannot drift between them."""
    proj = proj.astype(jnp.float32)
    if input_lengths is not None:
        mask = sequence_mask(input_lengths, proj.shape[1],
                             dtype=jnp.float32)[..., None]
    else:
        mask = jnp.ones_like(proj)
    return jnp.sum(jnp.exp(proj) * mask, axis=(1, 2))


class DenseLengthPredictor(nn.Module):
    activation: str = "identity"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, input_lengths=None) -> jnp.ndarray:
        """inputs: [batch, max_time, dim] -> predicted lengths [batch] (float)."""
        act = get_activation(self.activation)
        proj = act(nn.Dense(1, dtype=self.dtype, name="projection")(inputs))
        return masked_exp_sum(proj, input_lengths)

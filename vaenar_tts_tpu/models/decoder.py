"""Non-autoregressive transformer mel decoder
(reference modules/decoder.py:156-199).

pre-projection to attention dim -> N CrossAttentionBlocks (z queries, text
memory; per-block alignments collected) -> linear head to
out_dim * max_reduction_factor sliced to reduction_factor * out_dim and
reshaped to expand time by reduction_factor -> PostNet residual refinement.
Returns (initial_outs, outputs, alignments).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .attention import CrossAttentionBlock, maybe_remat
from .layers import PostNet

Dtype = Any


class TransformerDecoder(nn.Module):
    nblk: int
    attention_dim: int
    attention_heads: int
    temperature: float
    ffn_hidden: int
    post_n_conv: int
    post_conv_filters: int
    post_conv_kernel: int
    post_drop_rate: float
    out_dim: int
    max_reduction_factor: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    ring_mesh: Optional[Any] = None
    ring_axis: str = "model"
    tuning: Optional[Any] = None
    remat: Any = "off"

    @nn.compact
    def __call__(self, inputs, text_embd, z_lengths=None, text_lengths=None,
                 reduction_factor: int = 2, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """inputs: latents [batch, reduced_time, latent_dim];
        reduction_factor is STATIC (recompile per curriculum stage).
        Returns (initial [B, reduced_time*r, out_dim], refined same, alignments)."""
        batch, max_len = inputs.shape[0], inputs.shape[1]
        x = nn.Dense(self.attention_dim, dtype=self.dtype,
                     name="pre_projection")(inputs)
        alignments: Dict[str, jnp.ndarray] = {}
        block_cls = maybe_remat(CrossAttentionBlock, self.remat)
        for i in range(self.nblk):
            x, ali = block_cls(
                input_dim=self.attention_dim, attention_dim=self.attention_dim,
                attention_heads=self.attention_heads,
                attention_temperature=self.temperature,
                ffn_hidden=self.ffn_hidden, dtype=self.dtype,
                use_pallas=self.use_pallas, ring_mesh=self.ring_mesh,
                ring_axis=self.ring_axis, tuning=self.tuning,
                name=f"decoder_attention_{i}")(
                x, text_embd, query_lengths=z_lengths,
                memory_lengths=text_lengths)
            if ali is not None:
                alignments[f"dec_{i}"] = ali
        full = nn.Dense(self.out_dim * self.max_reduction_factor,
                        dtype=self.dtype, name="linear_outputs")(x)
        initial = full[:, :, : reduction_factor * self.out_dim]
        initial = initial.reshape(batch, max_len * reduction_factor, self.out_dim)
        residual = PostNet(
            n_conv=self.post_n_conv, conv_filters=self.post_conv_filters,
            conv_kernel=self.post_conv_kernel, drop_rate=self.post_drop_rate,
            dtype=self.dtype, name="postnet")(initial, train=train)
        residual = nn.Dense(self.out_dim, dtype=self.dtype,
                            name="residual_outputs")(residual)
        outputs = residual + initial
        return initial, outputs, alignments

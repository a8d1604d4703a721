"""Transformer text encoder (reference modules/encoder.py:58-93).

Embedding -> ConvPreNet -> positional encoding scaled by a trainable
pos_weight and a fractional pos_step (= mel_text_len_ratio / reduction_factor,
set by the caller; reference models.py:129) -> N SelfAttentionBlocks.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .attention import SelfAttentionBlock, maybe_remat
from .layers import ConvPreNet, positional_encoding

Dtype = Any


class TransformerEncoder(nn.Module):
    vocab_size: int
    embd_dim: int
    pre_nconv: int
    pre_hidden: int
    pre_conv_kernel: int
    prenet_drop_rate: float
    pre_activation: str
    bn_before_act: bool
    pos_drop_rate: float
    nblk: int
    attention_dim: int
    attention_heads: int
    attention_temperature: float
    ffn_hidden: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    ring_mesh: Optional[Any] = None
    ring_axis: str = "model"
    tuning: Optional[Any] = None
    remat: Any = "off"

    @nn.compact
    def __call__(self, inputs, input_lengths=None, pos_step: float = 1.0,
                 train: bool = False):
        """inputs: [batch, max_time] int32 token ids -> [batch, max_time, pre_hidden]."""
        embs = nn.Embed(self.vocab_size, self.embd_dim, dtype=self.dtype,
                        name="text_init_encoding")(inputs)
        prenet_outs = ConvPreNet(
            nconv=self.pre_nconv, hidden=self.pre_hidden,
            conv_kernel=self.pre_conv_kernel, drop_rate=self.prenet_drop_rate,
            activation=self.pre_activation, bn_before_act=self.bn_before_act,
            dtype=self.dtype, name="EncoderPrenet")(embs, train=train)
        max_time, dim = prenet_outs.shape[1], prenet_outs.shape[2]
        pos_weight = self.param("pos_weight", nn.initializers.ones, ())
        pos = positional_encoding(max_time, dim, step=pos_step, dtype=self.dtype)
        x = prenet_outs + pos_weight * pos[None]
        x = nn.Dropout(self.pos_drop_rate, deterministic=not train)(x)
        block_cls = maybe_remat(SelfAttentionBlock, self.remat)
        for i in range(self.nblk):
            x, _ = block_cls(
                input_dim=self.pre_hidden, attention_dim=self.attention_dim,
                attention_heads=self.attention_heads,
                attention_temperature=self.attention_temperature,
                ffn_hidden=self.ffn_hidden, dtype=self.dtype,
                use_pallas=self.use_pallas, ring_mesh=self.ring_mesh,
                ring_axis=self.ring_axis, tuning=self.tuning,
                name=f"self_attention{i}")(
                x, x, query_lengths=input_lengths,
                memory_lengths=input_lengths)
        return x

"""Alternative (non-active-path) modules from the reference, kept for API
completeness.

The reference ships several modules its active VAENAR path never uses
(SURVEY.md section 2.4): Bahdanau additive attention (attention.py:44-113),
a Tacotron-style conv+BLSTM text encoder (encoder.py:25-55), LSTM and
Tacotron decoders (decoder.py:57-153), a convolutional length predictor
(length_predictor.py:5-27), and Highway/CBHG feature stacks
(utils.py:118-236). They are provided here - TPU-idiomatically (lax.scan
RNNs via flax nn.RNN, static shapes) - so users migrating experiments that
touched these variants find them; none are wired into the VAENAR model.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import MASK_VALUE
from .layers import Conv1D, PostNet, get_activation, sequence_mask

Dtype = Any


class BahdanauAttention(nn.Module):
    """Additive attention (reference attention.py:44-113): score =
    sum(v * tanh(Wq q + Wk k + b)); NOTE the reference attends over the
    PROJECTED memory as values (:111), reproduced here."""

    attention_dim: int
    temperature: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, memory, memory_lengths=None,
                 query_lengths=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        wq = nn.Dense(self.attention_dim, use_bias=False, dtype=self.dtype,
                      name="query_layer")(inputs)  # [B, Tq, D]
        wk = nn.Dense(self.attention_dim, use_bias=False, dtype=self.dtype,
                      name="memory_layer")(memory)  # [B, Tk, D]
        v = self.param("attention_v", nn.initializers.normal(1.0),
                       (self.attention_dim,))
        b = self.param("attention_b", nn.initializers.zeros,
                       (self.attention_dim,))
        # fp32 energies/softmax regardless of compute dtype (repo
        # convention, models/attention.py: near-tied logits collapse in bf16)
        energy = jnp.sum(
            (v * jnp.tanh(wq[:, :, None, :] + wk[:, None, :, :]
                          + b)).astype(jnp.float32),
            axis=-1) / self.temperature  # [B, Tq, Tk]
        B, Tq, Tk = energy.shape
        mask = jnp.ones((B, Tq, Tk), bool)
        if memory_lengths is not None:
            mask &= sequence_mask(memory_lengths, Tk)[:, None, :]
        if query_lengths is not None:
            mask &= sequence_mask(query_lengths, Tq)[:, :, None]
        energy = jnp.where(mask, energy, MASK_VALUE)
        alignments = jax.nn.softmax(energy, axis=2)
        contexts = jnp.einsum("bqk,bkd->bqd", alignments, wk)
        return contexts, alignments


class ConvLengthPredictor(nn.Module):
    """Conv-stack length predictor (reference length_predictor.py:5-27)."""

    n_conv: int = 2
    conv_filter: int = 256
    conv_kernel: int = 5
    drop_rate: float = 0.4
    activation: str = "relu"
    bn_before_act: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, input_lengths=None, train: bool = False):
        x = inputs
        for i in range(self.n_conv):
            x = Conv1D(self.conv_filter, self.conv_kernel, self.activation,
                       self.drop_rate, self.bn_before_act, dtype=self.dtype,
                       name=f"conv_{i}")(x, train=train)
        proj = nn.Dense(1, dtype=self.dtype, name="projection")(x)
        from .length_predictor import masked_exp_sum
        return masked_exp_sum(proj, input_lengths)


class HighwayLayer(nn.Module):
    """relu(W1 x) * sigmoid(W2 x) + x * (1 - sigmoid(W2 x))
    (reference utils.py:118-131)."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.out_dim, dtype=self.dtype,
                             name="highway_relu")(x))
        gate = nn.sigmoid(nn.Dense(self.out_dim, dtype=self.dtype,
                                   name="highway_sigmoid")(x))
        return h * gate + x * (1.0 - gate)


class CBHLayer(nn.Module):
    """Conv-bank + maxpool + projections + highway stack, no GRU
    (reference utils.py:189-236)."""

    n_convbank: int
    bank_filters: int
    proj_filters: int
    proj_kernel: int
    n_highwaylayer: int
    highway_out_dim: int
    drop_rate: float = 0.1
    bn_before_act: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bank = [Conv1D(self.bank_filters, k + 1, "relu", self.drop_rate,
                       self.bn_before_act, dtype=self.dtype,
                       name=f"conv_layer_{k}")(x, train=train)
                for k in range(self.n_convbank)]
        y = jnp.concatenate(bank, axis=-1)
        y = nn.max_pool(y, window_shape=(2,), strides=(1,), padding="SAME")
        y = Conv1D(self.proj_filters, self.proj_kernel, "relu",
                   self.drop_rate, self.bn_before_act, dtype=self.dtype,
                   name="projection1")(y, train=train)
        y = Conv1D(self.proj_filters, self.proj_kernel, None, self.drop_rate,
                   self.bn_before_act, dtype=self.dtype,
                   name="projection2")(y, train=train)
        h = y + x
        for i in range(self.n_highwaylayer):
            h = HighwayLayer(self.highway_out_dim, dtype=self.dtype,
                             name=f"highway{i}")(h)
        return h


class CBHGLayer(nn.Module):
    """CBH + bidirectional GRU (reference utils.py:134-186)."""

    n_convbank: int
    bank_filters: int
    proj_filters: int
    proj_kernel: int
    n_highwaylayer: int
    highway_out_dim: int
    gru_hidden: int
    drop_rate: float = 0.1
    bn_before_act: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = CBHLayer(self.n_convbank, self.bank_filters, self.proj_filters,
                     self.proj_kernel, self.n_highwaylayer,
                     self.highway_out_dim, self.drop_rate,
                     self.bn_before_act, dtype=self.dtype, name="cbh")(
            x, train=train)
        gru = nn.Bidirectional(
            nn.RNN(nn.GRUCell(self.gru_hidden)),
            nn.RNN(nn.GRUCell(self.gru_hidden)), name="bi_gru")
        return gru(h)


class TacotronEncoder(nn.Module):
    """Embedding -> conv stack -> BLSTM (reference encoder.py:25-55)."""

    vocab_size: int
    embd_dim: int
    n_conv: int
    conv_filter: int
    conv_kernel: int
    lstm_hidden: int
    drop_rate: float = 0.1
    bn_before_act: bool = False
    conv_activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, input_lengths=None, train: bool = False):
        x = nn.Embed(self.vocab_size, self.embd_dim, dtype=self.dtype,
                     name="text_init_encoding")(inputs)
        for i in range(self.n_conv):
            x = Conv1D(self.conv_filter, self.conv_kernel,
                       self.conv_activation, self.drop_rate,
                       self.bn_before_act, dtype=self.dtype,
                       name=f"conv_{i}")(x, train=train)
        blstm = nn.Bidirectional(
            nn.RNN(nn.OptimizedLSTMCell(self.lstm_hidden)),
            nn.RNN(nn.OptimizedLSTMCell(self.lstm_hidden)),
            name="blstm_layer")
        return blstm(x)


class LSTMDecoder(nn.Module):
    """LSTM -> Bahdanau attention -> 2x LSTM -> projection
    (reference decoder.py:115-153)."""

    in_lstm_hidden: int
    attention_dim: int
    attention_temperature: float
    n_dec_lstm: int
    dec_lstm_hidden: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, text_embd, z_lengths=None, text_lengths=None):
        h = nn.RNN(nn.OptimizedLSTMCell(self.in_lstm_hidden),
                   name="initial_lstm")(inputs)
        contexts, alignments = BahdanauAttention(
            self.attention_dim, self.attention_temperature, dtype=self.dtype,
            name="lstm_decoder_attention")(h, text_embd,
                                           memory_lengths=text_lengths)
        y = jnp.concatenate([h, contexts], axis=2)
        for i in range(self.n_dec_lstm):
            y = nn.RNN(nn.OptimizedLSTMCell(self.dec_lstm_hidden),
                       name=f"dec_lstm_{i}")(y)
        proj_in = jnp.concatenate([y, contexts], axis=2)
        outputs = nn.Dense(self.out_dim, dtype=self.dtype,
                           name="output_projection")(proj_in)
        return outputs, alignments


class TacotronDecoder(nn.Module):
    """LSTM -> attention -> 2x LSTM -> attention -> projection -> postnet
    residual (reference decoder.py:57-112)."""

    in_lstm_hidden: int
    attention_dim: int
    attention_temperature: float
    dec_n_lstm: int
    dec_lstm_hidden: int
    n_conv: int
    conv_filters: int
    conv_kernel: int
    out_dim: int
    drop_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, text_embd, z_lengths=None, text_lengths=None,
                 train: bool = False):
        h = nn.RNN(nn.OptimizedLSTMCell(self.in_lstm_hidden),
                   name="input_lstm")(inputs)
        ctx1, ali1 = BahdanauAttention(
            self.attention_dim, self.attention_temperature, dtype=self.dtype,
            name="dec_attention_1")(h, text_embd, memory_lengths=text_lengths)
        y = jnp.concatenate([h, ctx1], axis=2)
        for i in range(self.dec_n_lstm):
            y = nn.RNN(nn.OptimizedLSTMCell(self.dec_lstm_hidden),
                       name=f"dec_lstm_{i}")(y)
        ctx2, ali2 = BahdanauAttention(
            self.attention_dim, self.attention_temperature, dtype=self.dtype,
            name="dec_attention_2")(y, text_embd, memory_lengths=text_lengths)
        proj_in = jnp.concatenate([y, ctx2], axis=2)
        pre = nn.Dense(self.out_dim, dtype=self.dtype,
                       name="pre_projection")(proj_in)
        post = PostNet(self.n_conv, self.conv_filters, self.conv_kernel,
                       self.drop_rate, dtype=self.dtype,
                       name="decoder_postnet")(pre, train=train)
        residual = nn.Dense(self.out_dim, dtype=self.dtype,
                            name="post_projection")(post)
        return pre + residual, [ali1, ali2]


class LocationSensitiveAttention(nn.Module):
    """Stepwise location-sensitive additive attention
    (reference attention.py:249-389: LocationSensitiveAttention wrapping
    BahdanauAttentionCell in a keras RNN).

    Per query step t: the previous (optionally cumulative) alignment weights
    are convolved into location features, added into the additive score
    sum(v * tanh(Wk k + Wq q_t + loc + b)) / temperature, masked over key
    lengths, softmaxed, and the context is taken against the PROJECTED
    memory (a reference quirk shared with BahdanauAttention, :111).

    TPU-idiomatic: the recurrence is one lax.scan over query time with
    explicit parameters (the location conv is a lax.conv, not a submodule,
    so nothing is created inside the scan body); shapes are static, the
    reference's ``max_state_size`` padding trick is unnecessary.
    """

    attention_dim: int
    location_filter: int = 32
    location_kernel: int = 31
    cumulative_weights: bool = True
    temperature: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, memory, query_lengths=None,
                 memory_lengths=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """queries [B, Tq, Dq], memory [B, Tm, Dm] ->
        (contexts [B, Tq, attention_dim], alignments [B, Tq, Tm])."""
        B, Tq = queries.shape[0], queries.shape[1]
        Tm = memory.shape[1]
        A = self.attention_dim
        w_query = nn.Dense(A, use_bias=False, dtype=self.dtype,
                           name="query_layer")(queries)
        w_memory = nn.Dense(A, use_bias=False, dtype=self.dtype,
                            name="memory_layer")(memory)
        conv_kernel = self.param(
            "location_conv_kernel", nn.initializers.lecun_normal(),
            (self.location_kernel, 1, self.location_filter))
        loc_kernel = self.param(
            "location_features_kernel", nn.initializers.lecun_normal(),
            (self.location_filter, A))
        score_v = self.param("attention_v", nn.initializers.normal(1.0), (A,))
        score_b = self.param("attention_b", nn.initializers.zeros, (A,))

        if memory_lengths is None:
            key_mask = jnp.ones((B, Tm), bool)
        else:
            key_mask = sequence_mask(memory_lengths, Tm)
        w_mem32 = w_memory.astype(jnp.float32)
        wq32 = w_query.astype(jnp.float32)

        def step(prev_weights, q_t):
            # location features from the previous alignments
            f = jax.lax.conv_general_dilated(
                prev_weights[..., None], conv_kernel.astype(jnp.float32),
                window_strides=(1,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"))  # [B, Tm, filters]
            loc = f @ loc_kernel.astype(jnp.float32)      # [B, Tm, A]
            energy = jnp.sum(
                score_v * jnp.tanh(w_mem32 + q_t[:, None, :] + loc + score_b),
                axis=2) / self.temperature                # [B, Tm]
            energy = jnp.where(key_mask, energy, MASK_VALUE)
            ali = jax.nn.softmax(energy, axis=1)
            carry = ali + prev_weights if self.cumulative_weights else ali
            return carry, ali

        init = jnp.zeros((B, Tm), jnp.float32)
        _, alignments = jax.lax.scan(step, init,
                                     jnp.swapaxes(wq32, 0, 1))  # [Tq, B, Tm]
        alignments = jnp.swapaxes(alignments, 0, 1)             # [B, Tq, Tm]
        contexts = jnp.einsum("bqm,bmd->bqd",
                              alignments.astype(w_memory.dtype), w_memory)
        return contexts, alignments


class DCNResidualBlock(nn.Module):
    """Dilated-conv residual block (reference utils.py:276-306):
    two SAME dilated convs with relu+dropout, residual, then BatchNorm."""

    filters: int
    kernel: int
    dilation: int
    drop_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        h = nn.Conv(self.filters, (self.kernel,), padding="SAME",
                    kernel_dilation=(self.dilation,), dtype=self.dtype,
                    name="dilated_conv1")(inputs)
        h = nn.Dropout(self.drop_rate, deterministic=not train)(nn.relu(h))
        h = nn.Conv(self.filters, (self.kernel,), padding="SAME",
                    kernel_dilation=(self.dilation,), dtype=self.dtype,
                    name="dilated_conv2")(h)
        h = nn.Dropout(self.drop_rate, deterministic=not train)(nn.relu(h))
        return nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                            dtype=self.dtype,
                            name="batch_norm")(inputs + h)  # keras eps


class DCNModule(nn.Module):
    """Stack of DCN residual blocks with dilation 2^i
    (reference utils.py:309-325)."""

    n_block: int
    filters: int
    kernel: int
    drop_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs
        for i in range(self.n_block):
            x = DCNResidualBlock(self.filters, self.kernel, 2 ** i,
                                 self.drop_rate, dtype=self.dtype,
                                 name=f"DCN_residual_blk{i}")(x, train=train)
        return x

"""Shared neural layers (Flax): PreNet, ConvPreNet, FFN, Conv1D+BN, PostNet,
sinusoidal positional encoding with fractional step.

Behavior parity with reference modules/utils.py (PreNet :4-18, ConvPreNet
:21-38, FFN :41-53, Conv1D :56-95, PostNet :98-115, PositionalEncoding
:328-355). Pure functions + explicit RNG instead of Keras layer state; the
``dtype`` field is the computation dtype (params stay fp32).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_ACTIVATIONS = {
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
    None: lambda x: x,
}


def get_activation(name) -> Callable:
    if callable(name):
        return name
    return _ACTIVATIONS[name]


def sequence_mask(lengths: jnp.ndarray, maxlen: int,
                  dtype: Dtype = jnp.bool_) -> jnp.ndarray:
    """[batch, maxlen] mask: position < length (tf.sequence_mask analog)."""
    pos = jnp.arange(maxlen)[None, :]
    return (pos < lengths[:, None]).astype(dtype)


def positional_encoding(length: int, dim: int, step: float | jnp.ndarray = 1.0,
                        dtype: Dtype = jnp.float32) -> jnp.ndarray:
    """Sinusoidal PE with fractional position step (reference utils.py:332-355).

    pe[p, i] = sin(p*step / 10000^(i/dim))      for even i
               cos(p*step / 10000^((i-1)/dim))  for odd i

    ``step`` scales positions; the text encoder uses
    step = mel_text_len_ratio / reduction_factor so text positions advance at
    mel-frame rate (reference models.py:129, encoder.py:85-86).
    """
    pos = jnp.arange(length, dtype=jnp.float32) * step  # [L]
    idx = jnp.arange(dim, dtype=jnp.float32)  # [D]
    even_freq = jnp.power(10000.0, idx / dim)
    odd_freq = jnp.power(10000.0, (idx - 1.0) / dim)
    angle_even = pos[:, None] / even_freq[None, :]
    angle_odd = pos[:, None] / odd_freq[None, :]
    is_even = (jnp.arange(dim) % 2) == 0
    pe = jnp.where(is_even[None, :], jnp.sin(angle_even), jnp.cos(angle_odd))
    return pe.astype(dtype)


class PreNet(nn.Module):
    """2x (Dense -> act -> dropout) (reference utils.py:4-18). Dropout is
    applied after each dense, active only in training."""

    units: int
    drop_rate: float
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        x = act(nn.Dense(self.units, dtype=self.dtype, name="dense_1")(x))
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = act(nn.Dense(self.units, dtype=self.dtype, name="dense_2")(x))
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return x


class Conv1D(nn.Module):
    """Conv1D + BatchNorm + dropout with a bn_before_act switch
    (reference utils.py:56-95)."""

    filters: int
    kernel_size: int
    activation: Optional[str] = "relu"
    drop_rate: float = 0.0
    bn_before_act: bool = False
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        y = nn.Conv(self.filters, (self.kernel_size,), strides=(self.strides,),
                    padding="SAME", dtype=self.dtype, name="conv1d")(x)
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                          epsilon=1e-3, dtype=self.dtype, name="batch_norm")
        if self.bn_before_act:
            y = act(bn(y))
        else:
            y = bn(act(y))
        y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return y


class ConvPreNet(nn.Module):
    """N x Conv1D stack + linear projection (reference utils.py:21-38).
    The class default bn_before_act=True matches the reference's; the active
    configs pass False explicitly (reference hparams.py:72/83/105)."""

    nconv: int
    hidden: int
    conv_kernel: int
    drop_rate: float
    activation: str = "relu"
    bn_before_act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.nconv):
            x = Conv1D(self.hidden, self.conv_kernel, self.activation,
                       self.drop_rate, self.bn_before_act, dtype=self.dtype,
                       name=f"PreNetConv{i}")(x, train=train)
        return nn.Dense(self.hidden, dtype=self.dtype, name="projection")(x)


class FFN(nn.Module):
    """Position-wise feed-forward with residual + LayerNorm
    (reference utils.py:41-53): LN(x + W2 relu(W1 x))."""

    hidden1: int
    hidden2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden1, dtype=self.dtype, name="dense1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.hidden2, dtype=self.dtype, name="dense2")(y)
        # epsilon matches Keras LayerNormalization (the reference's LNs);
        # Flax's 1e-6 default costs ~2e-3 output parity per block
        return nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, name="layer_norm")(y + x)


class PostNet(nn.Module):
    """Conv stack: tanh activations except identity on the last conv, each with
    BN + dropout (reference utils.py:98-115)."""

    n_conv: int
    conv_filters: int
    conv_kernel: int
    drop_rate: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_conv):
            activation = "tanh" if i < self.n_conv - 1 else "identity"
            x = Conv1D(self.conv_filters, self.conv_kernel, activation,
                       self.drop_rate, bn_before_act=False, dtype=self.dtype,
                       name=f"conv_{i}")(x, train=train)
        return x

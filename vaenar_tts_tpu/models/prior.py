"""Glow-style flow prior p(z | text) (reference modules/prior.py:79-186).

A stack of n_blk steps, each (ActNorm -> InvertibleLinear ->
TransformerCoupling) with alternating coupling order. Three entry points:

  * ``sample``: noise ~ N(0, temperature^2) -> forward through the stack,
    logprob accumulates -logdet per layer (reference prior.py:154-169).
  * ``log_probability``: run the stack in REVERSE to recover the base noise,
    logprob = N(eps) + sum(logdet) (reference prior.py:119-152).
  * ``init_pass``: forward pass with ActNorm data-dependent init sowed into
    the 'flow_init' collection (reference prior.py:171-186).

All computation fp32 (see models/flow.py docstring).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .flow import (ActNorm, InvertibleLinear, TransformerCoupling,
                   precompute_invertible_stack)
from .layers import sequence_mask

LOG_2PI = math.log(2.0 * math.pi)


class TransformerPrior(nn.Module):
    n_blk: int
    channels: int
    n_transformer_blk: int
    attention_dim: int
    attention_heads: int
    temperature: float
    ffn_hidden: int
    use_pallas: bool = False
    dtype: Any = jnp.float32  # coupling-net compute dtype; flow math is fp32
    ring_mesh: Optional[Any] = None
    ring_axis: str = "model"
    tuning: Optional[Any] = None
    remat: Any = "off"
    # One batched lu_factor for the whole invertible-linear stack vs
    # per-layer inv/slogdet custom calls (hp.prior.batched_lu; A/B with
    # scripts/perf_ab_train.py --batched_lu). Same math either way; the
    # per-layer path measured 1.0 ms/step faster on TPU v5e, so off wins.
    batched_lu: bool = False

    def setup(self):
        actnorms, linears, couplings = [], [], []
        orders = ["upper", "lower"]
        for i in range(self.n_blk):
            actnorms.append(ActNorm(self.channels, name=f"actnorm_{i}"))
            linears.append(InvertibleLinear(
                self.channels, name=f"invertible_linear_{i}"))
            couplings.append(TransformerCoupling(
                channels=self.channels, nblk=self.n_transformer_blk,
                attention_dim=self.attention_dim,
                attention_heads=self.attention_heads,
                temperature=self.temperature, ffn_hidden=self.ffn_hidden,
                order=orders[i % 2], use_pallas=self.use_pallas,
                dtype=self.dtype, ring_mesh=self.ring_mesh,
                ring_axis=self.ring_axis, tuning=self.tuning, remat=self.remat,
                name=f"transformerCoupling{i}"))
        self.actnorms = actnorms
        self.linears = linears
        self.couplings = couplings

    def _initial_sample(self, targets_lengths, max_length: int,
                        temperature=1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Base noise + masked standard-normal log-prob
        (reference prior.py:26-42). ``max_length`` is static (bucketed)."""
        batch = targets_lengths.shape[0]
        rng = self.make_rng("sample")
        epsilon = jax.random.normal(
            rng, (batch, max_length, self.channels)) * temperature
        logprobs = -0.5 * (LOG_2PI + epsilon ** 2)
        mask = sequence_mask(targets_lengths, max_length,
                             dtype=jnp.float32)[..., None]
        logprobs = jnp.sum(mask * logprobs, axis=(1, 2))
        return epsilon, logprobs

    def _linear_precompute(self, reverse: bool):
        """ONE batched LU over the whole invertible-linear stack instead of
        2*n_blk serial 128x128 `inv`/`slogdet` custom calls per step
        (flow.py::precompute_invertible_stack). Exact same math; the TPU win
        is latency amortization of the tiny factorizations. Gated by
        ``batched_lu`` so the per-layer path stays A/B-able."""
        if not self.batched_lu:
            return [None] * self.n_blk
        weights = jnp.stack([lin.weight_matrix() for lin in self.linears])
        mats, logabsdets = precompute_invertible_stack(weights, reverse)
        return [(mats[i], logabsdets[i]) for i in range(self.n_blk)]

    def _forward_stack(self, z, logprobs, condition_inputs, targets_lengths,
                       condition_lengths, data_init: bool = False):
        pre = self._linear_precompute(reverse=False)
        for actnorm, linear, coupling, lin_pre in zip(
                self.actnorms, self.linears, self.couplings, pre):
            z, logdet = actnorm(z, targets_lengths, data_init=data_init)
            logprobs -= logdet
            z, logdet = linear(z, targets_lengths, precomputed=lin_pre)
            logprobs -= logdet
            z, logdet = coupling(z, condition_inputs,
                                 inputs_lengths=targets_lengths,
                                 condition_lengths=condition_lengths)
            logprobs -= logdet
        return z, logprobs

    def sample(self, targets_lengths, condition_inputs, condition_lengths=None,
               max_length: Optional[int] = None, temperature=1.0
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Draw z ~ p(z|text): [batch, max_length, channels], logprobs [batch]
        (reference prior.py:154-169)."""
        if max_length is None:
            raise ValueError("max_length must be provided (static shape)")
        epsilon, logprobs = self._initial_sample(
            targets_lengths, max_length, temperature=temperature)
        return self._forward_stack(epsilon, logprobs, condition_inputs,
                                   targets_lengths, condition_lengths)

    def log_probability(self, z, condition_inputs, z_lengths=None,
                        condition_lengths=None) -> jnp.ndarray:
        """log p(z|text): reverse the stack to the base distribution
        (reference prior.py:119-152)."""
        epsilon = z.astype(jnp.float32)
        batch, max_time = z.shape[0], z.shape[1]
        accum_logdet = jnp.zeros((batch,), dtype=jnp.float32)
        pre = self._linear_precompute(reverse=True)
        for actnorm, linear, coupling, lin_pre in zip(
                reversed(self.actnorms), reversed(self.linears),
                reversed(self.couplings), reversed(pre)):
            epsilon, logdet = coupling(epsilon, condition_inputs,
                                       inputs_lengths=z_lengths,
                                       condition_lengths=condition_lengths,
                                       reverse=True)
            accum_logdet += logdet
            epsilon, logdet = linear(epsilon, z_lengths, reverse=True,
                                     precomputed=lin_pre)
            accum_logdet += logdet
            epsilon, logdet = actnorm(epsilon, z_lengths, reverse=True)
            accum_logdet += logdet
        logprobs = -0.5 * (LOG_2PI + epsilon ** 2)
        mask = sequence_mask(z_lengths, max_time, dtype=jnp.float32)[..., None]
        logprobs = jnp.sum(mask * logprobs, axis=(1, 2))
        return logprobs + accum_logdet

    def init_pass(self, conditions, targets_lengths, condition_lengths=None,
                  max_length: Optional[int] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward pass with ActNorm data-dependent init
        (reference prior.py:171-186). Run under
        apply(..., mutable=['flow_init'])."""
        if max_length is None:
            raise ValueError("max_length must be provided (static shape)")
        epsilon, logprobs = self._initial_sample(targets_lengths, max_length)
        return self._forward_stack(epsilon, logprobs, conditions,
                                   targets_lengths, condition_lengths,
                                   data_init=True)

    def __call__(self, conditions, targets_lengths, condition_lengths=None,
                 max_length: Optional[int] = None, temperature=1.0):
        # default entry = sample (reference prior.py:101-117)
        return self.sample(targets_lengths, conditions, condition_lengths,
                           max_length=max_length, temperature=temperature)

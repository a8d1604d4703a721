"""Masked multi-head scaled-dot-product attention and transformer blocks.

Behavior parity with reference modules/attention.py:
  * MultiHeadAttention   <- MultiHeadScaledProductAttention (:149-246):
      length mask over keys AND queries, optional causal band, additive
      large-negative masking before softmax, per-head scale
      1/sqrt(attention_dim/num_heads), temperature divisor.
  * SelfAttentionBlock   <- SelfAttentionBLK (:392-415): the nonstandard
      concat(input, context) -> Dense -> residual+LN -> FFN topology.
  * CrossAttentionBlock  <- CrossAttentionBLK (:418-452): causal self-attn
      sublayer then cross-attn sublayer, each with concat-project-residual-LN,
      then FFN; returns the cross alignments.

TPU-first numerics: QK^T and PV matmuls run in the compute dtype (bf16 on TPU)
with fp32 accumulation; the softmax itself is fp32. The fused Pallas kernel
(ops/flash_attention.py) implements the same semantics for the hot path and is
selected with ``use_pallas`` when shapes qualify.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import FFN, sequence_mask

Dtype = Any

# Additive mask value (reference attention.py:240 uses -2^32+1; this constant
# is large enough to zero softmax weight in fp32 without overflowing bf16).
MASK_VALUE = -2.0 ** 32 + 1.0


def maybe_remat(block_cls, remat):
    """Optionally wrap a transformer-block module class in activation
    checkpointing (lifted jax.checkpoint). ``remat``: "off" (identity),
    "on" (save nothing, recompute the whole block in the backward), or
    "dots" (save matmul outputs, recompute elementwise ops). The param tree
    is unchanged, so trained checkpoints apply across settings."""
    if remat in (False, None, "off"):
        return block_cls
    if remat in (True, "on", "full"):
        policy = None  # jax.checkpoint default: nothing saveable
    elif remat == "dots":
        policy = jax.checkpoint_policies.dots_saveable
    else:
        raise ValueError(f"remat must be 'off', 'on' or 'dots'; got {remat!r}")
    # prevent_cse=False is safe under jit (per jax.checkpoint docs) and lets
    # XLA keep common subexpressions between the fwd and recompute passes
    return nn.remat(block_cls, policy=policy, prevent_cse=False)


def attention_mask(query_lengths: Optional[jnp.ndarray],
                   memory_lengths: Optional[jnp.ndarray],
                   batch: int, tq: int, tk: int,
                   causal: bool = False) -> jnp.ndarray:
    """[batch, 1, tq, tk] boolean mask (True = attend), combining query and
    key length masks (reference attention.py:192-209) and an optional lower-
    triangular causal band (:211-215)."""
    if memory_lengths is None:
        key_mask = jnp.ones((batch, 1, 1, tk), dtype=bool)
    else:
        key_mask = sequence_mask(memory_lengths, tk)[:, None, None, :]
    if query_lengths is None:
        q_mask = jnp.ones((batch, 1, tq, 1), dtype=bool)
    else:
        q_mask = sequence_mask(query_lengths, tq)[:, None, :, None]
    mask = jnp.logical_and(key_mask, q_mask)
    if causal:
        band = jnp.tril(jnp.ones((tq, tk), dtype=bool))
        mask = jnp.logical_and(mask, band[None, None, :, :])
    return mask


def masked_attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         mask: jnp.ndarray, scale: float
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-semantics attention on [B, H, T, Dh] tensors; returns
    (contexts [B,H,Tq,Dh], alignments fp32 [B,H,Tq,Tk])."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    logits = jnp.where(mask, logits, MASK_VALUE)
    alignments = jax.nn.softmax(logits, axis=-1)
    contexts = jnp.einsum("bhqk,bhkd->bhqd", alignments.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
    return contexts.astype(v.dtype), alignments


@dataclasses.dataclass(frozen=True)
class AttentionTuning:
    """Measured performance-crossover thresholds, threaded from config
    (hp.train.ring_min_seq / hp.train.pallas_min_score_elements,
    configs/hparams.py) down to every attention site as ONE static field.
    ``None`` entries fall back to the module defaults
    (parallel/ring_attention.RING_MIN_SEQ, the measured per-head_dim table
    in ops/flash_attention.py). Shapes are static under jit, so these only
    steer trace-time kernel selection — never runtime control flow."""

    ring_min_seq: Optional[int] = None
    pallas_min_score_elements: Optional[int] = None


class MultiHeadAttention(nn.Module):
    """Multi-head scaled-dot-product attention with length + causal masking
    (reference attention.py:149-246).

    Sequence parallelism: when ``ring_mesh`` is set and this is a
    self-attention call (inputs is memory) whose time length divides the
    ``ring_axis`` mesh size, the attention runs on the ppermute ring
    (parallel/ring_attention.py) with the time axis sharded over the mesh —
    k/v blocks rotate over ICI and only one score block lives in VMEM.
    Cross-attention (short text memory) stays on the XLA/Pallas path, which
    also keeps the plotted cross alignments materialized."""

    attention_dim: int
    num_heads: int
    temperature: float = 1.0
    dtype: Dtype = jnp.float32
    # False | True | "auto" ("auto": the fused Pallas kernel kicks in at the
    # measured long-sequence crossover, ops/flash_attention.pallas_profitable;
    # shapes are static so selection happens at trace time)
    use_pallas: Any = False
    ring_mesh: Optional[Any] = None
    ring_axis: str = "model"
    ring_batch_axis: Optional[str] = "data"
    tuning: Optional[AttentionTuning] = None

    @nn.compact
    def __call__(self, inputs, memory, query_lengths=None, memory_lengths=None,
                 causal: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert self.attention_dim % self.num_heads == 0
        head_dim = self.attention_dim // self.num_heads
        batch, tq = inputs.shape[0], inputs.shape[1]
        tk = memory.shape[1]

        q = nn.Dense(self.attention_dim, use_bias=False, dtype=self.dtype,
                     name="query_layer")(inputs)
        k = nn.Dense(self.attention_dim, use_bias=False, dtype=self.dtype,
                     name="key_layer")(memory)
        v = nn.Dense(self.attention_dim, use_bias=False, dtype=self.dtype,
                     name="value_layer")(memory)

        def split_heads(x, t):
            return x.reshape(batch, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = split_heads(q, tq), split_heads(k, tk), split_heads(v, tk)
        # python float (not jnp): the fused kernel takes it as a static value
        scale = 1.0 / (math.sqrt(float(head_dim)) * self.temperature)

        use_ring = False
        if self.ring_mesh is not None and inputs is memory:
            from ..parallel.ring_attention import ring_eligible
            use_ring = ring_eligible(
                self.ring_mesh, self.ring_axis, tq, tk,
                min_seq=self.tuning.ring_min_seq if self.tuning else None)
            if (query_lengths is not None and memory_lengths is not None
                    and query_lengths is not memory_lengths):
                # the ring carries ONE length per sequence (self-attention);
                # distinct query/key lengths are not representable there, so
                # honor the documented mask semantics on the XLA path
                use_ring = False
        if self.use_pallas in (True, "on"):
            use_fused = True
        elif self.use_pallas == "auto":
            from ..ops.flash_attention import pallas_profitable
            use_fused = pallas_profitable(
                tq, tk, head_dim,
                min_elements=(self.tuning.pallas_min_score_elements
                              if self.tuning else None))
        elif self.use_pallas in (False, "off", None):
            use_fused = False
        else:
            raise ValueError(
                f"use_pallas must be True/'on', False/'off'/None or 'auto'; "
                f"got {self.use_pallas!r}")
        if use_ring:
            from ..parallel.ring_attention import ring_self_attention
            lengths = query_lengths if query_lengths is not None \
                else memory_lengths
            lengths = (lengths if lengths is not None
                       else jnp.full((batch,), tq, jnp.int32))
            contexts = ring_self_attention(
                qh, kh, vh, lengths, self.ring_mesh, scale=scale,
                causal=causal, axis=self.ring_axis,
                batch_axis=self.ring_batch_axis)
            alignments = None
        elif use_fused:
            from ..ops.flash_attention import masked_flash_attention
            contexts = masked_flash_attention(
                qh, kh, vh, query_lengths, memory_lengths,
                scale=scale, causal=causal)
            # the fused kernel never materializes the [B,H,Tq,Tk] weights;
            # callers that need them (alignment plots) use the plots twin
            # (training/steps.py::plots_variant), which takes the XLA branch
            alignments = None
        else:
            mask = attention_mask(query_lengths, memory_lengths, batch, tq, tk,
                                  causal)
            contexts, alignments = masked_attention_xla(qh, kh, vh, mask, scale)

        merged = contexts.transpose(0, 2, 1, 3).reshape(batch, tq, self.attention_dim)
        return merged, alignments


class SelfAttentionBlock(nn.Module):
    """MHA(self) -> concat(input, ctx) -> Dense(input_dim) -> residual + LN
    -> FFN (reference attention.py:392-415)."""

    input_dim: int
    attention_dim: int
    attention_heads: int
    attention_temperature: float = 1.0
    ffn_hidden: int = 1024
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    ring_mesh: Optional[Any] = None
    ring_axis: str = "model"
    tuning: Optional[AttentionTuning] = None

    @nn.compact
    def __call__(self, inputs, memory, query_lengths=None, memory_lengths=None,
                 causal: bool = False):
        att_outs, alignments = MultiHeadAttention(
            self.attention_dim, self.attention_heads,
            self.attention_temperature, dtype=self.dtype,
            use_pallas=self.use_pallas, ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis, tuning=self.tuning, name="attention")(
            inputs, memory, query_lengths, memory_lengths, causal=causal)
        contexts = jnp.concatenate([inputs, att_outs], axis=-1)
        projected = nn.Dense(self.input_dim, dtype=self.dtype,
                             name="att_proj")(contexts)
        normed = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, name="layer_norm")(inputs + projected)
        ffn_outs = FFN(self.ffn_hidden, self.input_dim, dtype=self.dtype,
                       name="ffn")(normed)
        return ffn_outs, alignments


class CrossAttentionBlock(nn.Module):
    """Causal self-attention sublayer + cross-attention sublayer + FFN,
    each with the concat-project-residual-LN topology
    (reference attention.py:418-452). input_dim must equal attention_dim for
    the second residual, as in every reference usage."""

    input_dim: int
    attention_dim: int
    attention_heads: int
    attention_temperature: float = 1.0
    ffn_hidden: int = 1024
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    ring_mesh: Optional[Any] = None
    ring_axis: str = "model"
    tuning: Optional[AttentionTuning] = None

    @nn.compact
    def __call__(self, inputs, memory, query_lengths=None, memory_lengths=None):
        self_att, _self_ali = MultiHeadAttention(
            self.attention_dim, self.attention_heads,
            self.attention_temperature, dtype=self.dtype,
            use_pallas=self.use_pallas, ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis, tuning=self.tuning,
            name="self_attention")(
            inputs, inputs, query_lengths, query_lengths, causal=True)
        contexts = jnp.concatenate([inputs, self_att], axis=-1)
        h = nn.Dense(self.input_dim, dtype=self.dtype, name="att_proj1")(contexts)
        h = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, name="layer_norm1")(h + inputs)

        cross_att, cross_ali = MultiHeadAttention(
            self.attention_dim, self.attention_heads,
            self.attention_temperature, dtype=self.dtype,
            use_pallas=self.use_pallas, tuning=self.tuning,
            name="cross_attention")(
            h, memory, query_lengths, memory_lengths, causal=False)
        if cross_ali is not None:
            # captured only when callers make "intermediates" mutable (e.g.
            # the alignment probe, scripts/alignment_proof.py); a no-op in
            # normal train/infer applies
            self.sow("intermediates", "cross_alignments", cross_ali)
        contexts2 = jnp.concatenate([h, cross_att], axis=-1)
        h2 = nn.Dense(self.attention_dim, dtype=self.dtype, name="att_proj2")(contexts2)
        h2 = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, name="layer_norm2")(h2 + h)

        ffn_outs = FFN(self.ffn_hidden, self.attention_dim, dtype=self.dtype,
                       name="ffn")(h2)
        return ffn_outs, cross_ali

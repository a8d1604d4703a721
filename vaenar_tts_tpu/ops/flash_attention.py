"""Fused masked attention kernel (Pallas, TPU).

The single hottest code path: every transformer block in the encoder,
posterior, decoder, and the 6x2 coupling transforms funnels into masked MHA
(38 invocations per training step, SURVEY.md section 3.2). This kernel fuses
QK^T -> length/causal mask -> softmax -> PV entirely in VMEM, so the [Tq, Tk]
score matrix never round-trips to HBM.

Semantics match ``models.attention.masked_attention_xla``: additive
large-negative masking over key AND query length masks plus an optional
causal band; fully-masked query rows degrade to uniform attention (the
reference's behavior for padded rows, attention.py:240-242).

Shapes here are small (Tq, Tk <= ~512 after reduction-factor slicing), so a
row-blocked kernel with the full key range resident in VMEM is the
speed-of-light design - no online-softmax rescaling passes needed. The
backward pass delegates to the XLA reference implementation via custom_vjp
(flash backward = recompute anyway; XLA fuses it well).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -2.0 ** 32 + 1.0


def _attention_kernel(qlen_ref, mlen_ref, q_ref, k_ref, v_ref, o_ref, *,
                      scale: float, causal: bool, bq: int):
    """Grid: (batch, heads, q_blocks). Blocks: q [bq, d], k/v [tk, d]."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)  # [bq, d]
    k = k_ref[0, 0].astype(jnp.float32)  # [tk, d]
    v = v_ref[0, 0].astype(jnp.float32)  # [tk, d]
    tk = k.shape[0]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [bq, tk]

    q_len = qlen_ref[b]
    m_len = mlen_ref[b]
    row_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bq, tk), 1)
    mask = jnp.logical_and(row_ids < q_len, col_ids < m_len)
    if causal:
        mask = jnp.logical_and(mask, col_ids <= row_ids)
    logits = jnp.where(mask, logits, NEG)

    # stable softmax; fully-masked rows become uniform (reference semantics)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    align = p / s
    o_ref[0, 0] = jax.lax.dot_general(
        align, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _xla_reference(q, k, v, q_lengths, m_lengths, scale, causal):
    from ..models.attention import attention_mask, masked_attention_xla
    B, H, Tq, _ = q.shape
    Tk = k.shape[2]
    mask = attention_mask(q_lengths, m_lengths, B, Tq, Tk, causal)
    out, _ = masked_attention_xla(q, k, v, mask, scale)
    return out


def _pallas_forward(q, k, v, q_lengths, m_lengths, scale, causal):
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    # largest divisor of Tq up to 256 that keeps sublane alignment
    bq = 0
    for cand in range(min(Tq, 256), 7, -1):
        if Tq % cand == 0 and cand % 8 == 0:
            bq = cand
            break
    if bq == 0:  # ragged Tq: shapes are bucketed upstream, so this is cold
        return _xla_reference(q, k, v, q_lengths, m_lengths, scale, causal)
    n_q_blocks = Tq // bq

    if q_lengths is None:
        q_lengths = jnp.full((B,), Tq, jnp.int32)
    if m_lengths is None:
        m_lengths = jnp.full((B,), Tk, jnp.int32)

    kernel = functools.partial(_attention_kernel, scale=scale, causal=causal,
                               bq=bq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # qlen, mlen
        grid=(B, H, n_q_blocks),
        # index maps receive (grid..., scalar_prefetch_refs...)
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Tk, D), lambda b, h, i, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tk, D), lambda b, h, i, *_: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i, *_: (b, h, i, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tq * Tk * D * 2,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Tq * Tk,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=jax.default_backend() != "tpu",  # CPU tests use interpreter
    )(q_lengths.astype(jnp.int32), m_lengths.astype(jnp.int32), q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def masked_flash_attention(q, k, v, q_lengths, m_lengths,
                           scale: float = 1.0, causal: bool = False):
    """Fused masked attention. q,k,v: [B, H, T, D]; lengths: [B] or None.
    Returns contexts [B, H, Tq, D] (alignments are never materialized)."""
    return _pallas_forward(q, k, v, q_lengths, m_lengths, scale, causal)


def _fwd(q, k, v, q_lengths, m_lengths, scale, causal):
    out = _pallas_forward(q, k, v, q_lengths, m_lengths, scale, causal)
    return out, (q, k, v, q_lengths, m_lengths)


def _bwd(scale, causal, res, g):
    q, k, v, q_lengths, m_lengths = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference(q_, k_, v_, q_lengths, m_lengths,
                                          scale, causal), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


masked_flash_attention.defvjp(_fwd, _bwd)

"""Fused masked attention kernels (Pallas, TPU).

The single hottest code path: every transformer block in the encoder,
posterior, decoder, and the 6x2 coupling transforms funnels into masked MHA
(38 invocations per training step, SURVEY.md section 3.2). The forward kernel
fuses QK^T -> length/causal mask -> softmax -> PV entirely in VMEM, so the
[Tq, Tk] score matrix never round-trips to HBM; the backward is a real fused
flash backward (two Pallas kernels recomputing P from the saved softmax row
stats), so the [Tq, Tk] probability matrix never hits HBM in either
direction.

Semantics match ``models.attention.masked_attention_xla``: additive
large-negative masking over key AND query length masks plus an optional
causal band; fully-masked query rows degrade to uniform attention (the
reference's behavior for padded rows, attention.py:240-242). The backward
saves (row max m, row sum s) rather than lse so recomputed alignments equal
the forward bit-for-bit (NEG - NEG = 0 avoids the catastrophic cancellation
lse would hit on fully-masked rows), and ds is zeroed at masked positions
because autodiff of the reference's jnp.where passes no gradient through the
masked branch.

Profitability: at the shipped short shapes (heads=4, head_dim=64, T <= ~512
after reduction-factor slicing) XLA's fused attention wins - the narrow
head_dim half-fills the MXU lanes and XLA fuses the surrounding projections.
The kernel is a LONG-SEQUENCE specialist: ``pallas_profitable`` encodes the
measured crossover, and ``use_pallas_attention="auto"`` in the config selects
per trace-time shape (shapes are static, so this costs nothing at runtime).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -2.0 ** 32 + 1.0

# Measured on-chip crossovers (scripts/perf_ab_attn.py on v5e, B=16 bf16
# causal, pull-synced marginal protocol — see the script docstring for why
# per-call block_until_ready timings overstated XLA at long T), keyed by
# head_dim: arithmetic intensity per score element scales with D, so the
# profitability boundary moves with it.
#   D=64 (H=4, the flagship): XLA wins T<=512 (fwd 0.055 vs 0.096 ms), the
#   flash kernel wins from T=768 (fwd 2.04x, fwd+bwd 1.39x) through T=1024
#   (2.43x/1.71x), T=2048 (2.86x/1.69x) and T=4096 (6.14x/2.92x). Threshold
#   = 640^2 score elements, the midpoint of the measured 512..768 bracket.
#   D=128 (H=8, round-4 sweep, T in {256,384,512,768,1024}): the flash
#   forward wins from T=384 (2.05x) but the backward only joins at T=512
#   (fwd+bwd 1.28x; at 384 it loses 0.28x), then 768 (2.14x/1.52x) and
#   1024 (2.57x/1.61x). Threshold = 448^2, the midpoint of the measured
#   384..512 fwd+bwd bracket — engaging at the joint crossover keeps the
#   train step (fwd+bwd) from regressing at 384-class shapes while
#   synthesis loses at most the 384-512 fwd sliver. At T=4096 the XLA
#   backward fails to compile outright at this geometry (8.6 GB score
#   tensor), so past the crossover the kernel is the only option anyway.
PALLAS_MIN_SCORE_ELEMENTS_BY_HEAD_DIM = {64: 640 * 640, 128: 448 * 448}
PALLAS_MIN_SCORE_ELEMENTS = PALLAS_MIN_SCORE_ELEMENTS_BY_HEAD_DIM[64]

# Up to this Tk the single-pass kernel keeps the FULL [Tk, D] k/v plus two
# [bq, Tk] fp32 temporaries resident in VMEM (measured through 4096 at the
# shipped head dims; ~16 MB scoped budget). Beyond it the k-blocked
# online-softmax forward takes over (VMEM holds one [bq, bk] score block),
# so sequence length is bounded by HBM, not VMEM, and "auto" has no upper
# cutoff.
FULL_KV_MAX_LENGTH = 4096


def pallas_profitable(tq: int, tk: int, head_dim: int = 64,
                      min_elements: Optional[int] = None) -> bool:
    """Static (trace-time) auto-selection rule for ``use_pallas='auto'``.

    The threshold is per-head_dim (measured table above); an unmeasured
    head_dim borrows the nearest measured one, which keeps the rule
    conservative around the flagship geometries instead of extrapolating.
    ``min_elements`` (hp.train.pallas_min_score_elements via
    models.attention.AttentionTuning) overrides the table globally when set."""
    if min_elements is not None and min_elements > 0:
        return tq * tk >= min_elements
    nearest = min(PALLAS_MIN_SCORE_ELEMENTS_BY_HEAD_DIM,
                  key=lambda d: abs(d - head_dim))
    return tq * tk >= PALLAS_MIN_SCORE_ELEMENTS_BY_HEAD_DIM[nearest]


def _block_size(t: int, cap: int = 256) -> int:
    """Largest divisor of t up to ``cap`` that keeps sublane alignment;
    0 if none exists (ragged -> caller falls back to XLA)."""
    for cand in range(min(t, cap), 7, -1):
        if t % cand == 0 and cand % 8 == 0:
            return cand
    return 0


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# -- forward -----------------------------------------------------------------


def _fwd_kernel(qlen_ref, mlen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, s_ref,
                *, scale: float, causal: bool, bq: int):
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
    # softmax stats saved for the backward: (m, s) rather than lse so the
    # backward's exp(logits - m) reproduces the forward EXACTLY, including
    # fully-masked rows (NEG - NEG = 0 with no catastrophic cancellation)
    m_ref[0, 0, :, 0] = m[:, 0]
    s_ref[0, 0, :, 0] = s[:, 0]


def _fwd_kernel_blocked(qlen_ref, mlen_ref, q_ref, k_ref, v_ref, o_ref,
                        m_ref, s_ref, *, scale: float, causal: bool,
                        bq: int, bk: int, n_k_blocks: int):
    """Online-softmax forward. Grid: (batch, heads, q_blocks, k_blocks) with
    the k loop innermost ("arbitrary"): o/m/s output blocks ignore ki in
    their index maps, so Mosaic keeps them VMEM-resident and the kernel
    accumulates across k blocks — VMEM holds only [bq,d] + [bk,d] tiles and
    one [bq,bk] score block, so Tk is bounded by HBM, not the ~16 MB VMEM
    budget that caps the full-K/V kernel at ~4096.

    Masked-row semantics match the single-pass kernel exactly: the running
    max initializes to NEG, so a fully-masked row accumulates
    s = sum(exp(NEG-NEG)) = Tk and o = mean(v) — the reference's uniform
    attention — and the saved (m, s) stats are the same global quantities
    the blocked backward recomputes from."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    q = q_ref[0, 0].astype(jnp.float32)  # [bq, d]
    k = k_ref[0, 0].astype(jnp.float32)  # [bk, d]
    v = v_ref[0, 0].astype(jnp.float32)  # [bk, d]

    @pl.when(ki == 0)
    def _init():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])
        m_ref[0, 0] = jnp.full_like(m_ref[0, 0], NEG)
        s_ref[0, 0] = jnp.zeros_like(s_ref[0, 0])

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [bq, bk]
    q_len = qlen_ref[b]
    m_len = mlen_ref[b]
    row_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col_ids = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = jnp.logical_and(row_ids < q_len, col_ids < m_len)
    if causal:
        mask = jnp.logical_and(mask, col_ids <= row_ids)
    logits = jnp.where(mask, logits, NEG)

    m_prev = m_ref[0, 0, :, 0]                      # [bq]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
    alpha = jnp.exp(m_prev - m_new)                 # [bq]
    p = jnp.exp(logits - m_new[:, None])            # [bq, bk]
    s_ref[0, 0, :, 0] = (s_ref[0, 0, :, 0] * alpha
                         + jnp.sum(p, axis=-1))
    o_ref[0, 0] = (o_ref[0, 0] * alpha[:, None]
                   + jax.lax.dot_general(
                       p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32))
    m_ref[0, 0, :, 0] = m_new

    @pl.when(ki == n_k_blocks - 1)
    def _finalize():
        o_ref[0, 0] = o_ref[0, 0] / s_ref[0, 0]


def _pallas_forward_blocked(q, k, v, q_lengths, m_lengths, scale, causal,
                            bq: int, bk: int):
    """k-blocked forward; returns (o fp32, sm_m, sm_s)."""
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    n_q_blocks, n_k_blocks = Tq // bq, Tk // bk
    kernel = functools.partial(_fwd_kernel_blocked, scale=scale,
                               causal=causal, bq=bq, bk=bk,
                               n_k_blocks=n_k_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, n_q_blocks, n_k_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, *_: (b, h, j, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, *_: (b, h, j, 0)),
        ],
        out_specs=[
            # index maps ignore j: the accumulators stay VMEM-resident
            # across the inner k loop (fp32 accumulation; cast by caller)
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j, *_: (b, h, i, 0)),
        ],
    )
    o, sm_m, sm_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(q.shape, jnp.float32),
                   jax.ShapeDtypeStruct((B, H, Tq, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, Tq, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tq * Tk * D * 2,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Tq * Tk,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(q_lengths.astype(jnp.int32), m_lengths.astype(jnp.int32), q, k, v)
    return o, sm_m, sm_s


def _default_lengths(q_lengths, m_lengths, B, Tq, Tk):
    """Single source of the None-lengths materialization rule, shared by the
    primal and VJP paths so they cannot drift."""
    if q_lengths is None:
        q_lengths = jnp.full((B,), Tq, jnp.int32)
    if m_lengths is None:
        m_lengths = jnp.full((B,), Tk, jnp.int32)
    return q_lengths, m_lengths


def _pallas_forward(q, k, v, q_lengths, m_lengths, scale, causal,
                    with_stats: bool = False):
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    bq = _block_size(Tq)
    if bq == 0:  # ragged Tq: shapes are bucketed upstream, so this is cold
        out = _xla_reference(q, k, v, q_lengths, m_lengths, scale, causal)
        if with_stats:
            raise ValueError("ragged Tq has no fused path")
        return out
    n_q_blocks = Tq // bq

    q_lengths, m_lengths = _default_lengths(q_lengths, m_lengths, B, Tq, Tk)

    bk = _block_size(Tk)
    if Tk > FULL_KV_MAX_LENGTH:
        if bk == 0:  # ragged AND too big for full-resident K/V: cold XLA
            out = _xla_reference(q, k, v, q_lengths, m_lengths, scale, causal)
            if with_stats:
                raise ValueError("ragged oversize Tk has no fused path")
            return out
        # past the VMEM budget for full-resident K/V: the k-blocked
        # online-softmax forward (same (m, s) stats contract)
        o32, sm_m, sm_s = _pallas_forward_blocked(
            q, k, v, q_lengths, m_lengths, scale, causal, bq, bk)
        o = o32.astype(q.dtype)
        return (o, sm_m, sm_s) if with_stats else o

    kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal, bq=bq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # qlen, mlen
        grid=(B, H, n_q_blocks),
        # index maps receive (grid..., scalar_prefetch_refs...)
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Tk, D), lambda b, h, i, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tk, D), lambda b, h, i, *_: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, *_: (b, h, i, 0)),
            # stats ride a trailing singleton lane dim: Mosaic requires the
            # last two block dims to divide (8, 128) or equal the array dims
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, *_: (b, h, i, 0)),
        ],
    )
    o, sm_m, sm_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((B, H, Tq, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, Tq, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tq * Tk * D * 2,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Tq * Tk,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q_lengths.astype(jnp.int32), m_lengths.astype(jnp.int32), q, k, v)
    return (o, sm_m, sm_s) if with_stats else o


# -- backward ----------------------------------------------------------------


def _dq_kernel(qlen_ref, mlen_ref, q_ref, k_ref, v_ref, do_ref, m_ref,
               s_ref, delta_ref, dq_ref, *, scale: float, causal: bool,
               bq: int, bk: int):
    """Grid: (batch, heads, q_blocks, k_blocks); dq accumulates in VMEM
    across the inner k loop (the output block's index map ignores ki, so
    Mosaic keeps it resident). fp32 accumulator; VMEM holds only
    [bq, d] + [bk, d] tiles and one [bq, bk] score block, so sequence
    length is bounded by HBM, not VMEM.

    Gradient semantics exactly match autodiff of the XLA reference:
    align = exp(logits - m)/s reproduces the forward bit-for-bit (including
    uniform rows where everything was masked to NEG: NEG - NEG = 0), and ds
    is zeroed at masked positions because the reference's jnp.where passes
    no gradient through its masked branch."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    q = q_ref[0, 0].astype(jnp.float32)      # [bq, d]
    k = k_ref[0, 0].astype(jnp.float32)      # [bk, d]
    v = v_ref[0, 0].astype(jnp.float32)      # [bk, d]
    do = do_ref[0, 0].astype(jnp.float32)    # [bq, d]
    sm_m = m_ref[0, 0, :, 0]                 # [bq] row max of masked logits
    sm_s = s_ref[0, 0, :, 0]                 # [bq] row sum of exp
    delta = delta_ref[0, 0, :, 0]            # [bq]

    @pl.when(ki == 0)
    def _init():
        dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [bq, bk]
    q_len = qlen_ref[b]
    m_len = mlen_ref[b]
    row_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col_ids = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = jnp.logical_and(row_ids < q_len, col_ids < m_len)
    if causal:
        mask = jnp.logical_and(mask, col_ids <= row_ids)
    logits = jnp.where(mask, logits, NEG)
    align = jnp.exp(logits - sm_m[:, None]) / sm_s[:, None]
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [bq, bk]
    ds = jnp.where(mask, align * (dp - delta[:, None]), 0.0)
    dq_ref[0, 0] += jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale


def _dkv_kernel(qlen_ref, mlen_ref, q_ref, k_ref, v_ref, do_ref, m_ref,
                s_ref, delta_ref, dk_ref, dv_ref, *, scale: float,
                causal: bool, bk: int, bq: int):
    """Grid: (batch, heads, k_blocks, q_blocks); dk/dv accumulate in VMEM
    across the inner q loop (fp32 accumulators)."""
    b = pl.program_id(0)
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    q = q_ref[0, 0].astype(jnp.float32)      # [bq, d]
    k = k_ref[0, 0].astype(jnp.float32)      # [bk, d]
    v = v_ref[0, 0].astype(jnp.float32)      # [bk, d]
    do = do_ref[0, 0].astype(jnp.float32)    # [bq, d]
    sm_m = m_ref[0, 0, :, 0]                 # [bq]
    sm_s = s_ref[0, 0, :, 0]                 # [bq]
    delta = delta_ref[0, 0, :, 0]            # [bq]

    @pl.when(qi == 0)
    def _init():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    # transposed score block: [bk, bq]
    logits_t = jax.lax.dot_general(
        k, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    q_len = qlen_ref[b]
    m_len = mlen_ref[b]
    col_ids = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 0)
    row_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 1)
    mask = jnp.logical_and(row_ids < q_len, col_ids < m_len)
    if causal:
        mask = jnp.logical_and(mask, col_ids <= row_ids)
    logits_t = jnp.where(mask, logits_t, NEG)
    align_t = jnp.exp(logits_t - sm_m[None, :]) / sm_s[None, :]  # [bk, bq]
    dv_ref[0, 0] += jax.lax.dot_general(
        align_t, do, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp_t = jax.lax.dot_general(
        v, do, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [bk, bq]
    ds_t = jnp.where(mask, align_t * (dp_t - delta[None, :]), 0.0)
    dk_ref[0, 0] += jax.lax.dot_general(
        ds_t, q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale


def _pallas_backward(q, k, v, q_lengths, m_lengths, o, sm_m, sm_s, g, scale,
                     causal):
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    bq = _block_size(Tq)
    bk = _block_size(Tk)
    if bq == 0 or bk == 0:
        return None  # ragged: caller falls back to the XLA VJP

    # delta = rowsum(dO * O): one cheap fused elementwise-reduce in XLA
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)

    common = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )
    ql = q_lengths.astype(jnp.int32)
    ml = m_lengths.astype(jnp.int32)
    cost = pl.CostEstimate(
        flops=3 * 2 * B * H * Tq * Tk * D,
        bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
        transcendentals=B * H * Tq * Tk)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal, bq=bq,
                          bk=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            # inner loop over k blocks; dq block (indexed by qi only) stays
            # resident in VMEM and accumulates in fp32
            grid=(B, H, Tq // bq, Tk // bk),
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j, *_: (b, h, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, D),
                                   lambda b, h, i, j, *_: (b, h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.float32),
        cost_estimate=cost,
        **common,
    )(ql, ml, q, k, v, g, sm_m, sm_s, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal, bk=bk,
                          bq=bq),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            # inner loop over q blocks; dk/dv blocks accumulate in VMEM
            grid=(B, H, Tk // bk, Tq // bq),
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j, *_: (b, h, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, *_: (b, h, i, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct(k.shape, jnp.float32),
                   jax.ShapeDtypeStruct(v.shape, jnp.float32)],
        cost_estimate=cost,
        **common,
    )(ql, ml, q, k, v, g, sm_m, sm_s, delta)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# -- public entry with custom VJP ---------------------------------------------


def _xla_reference(q, k, v, q_lengths, m_lengths, scale, causal):
    from ..models.attention import attention_mask, masked_attention_xla
    B, H, Tq, _ = q.shape
    Tk = k.shape[2]
    mask = attention_mask(q_lengths, m_lengths, B, Tq, Tk, causal)
    out, _ = masked_attention_xla(q, k, v, mask, scale)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def masked_flash_attention(q, k, v, q_lengths, m_lengths,
                           scale: float = 1.0, causal: bool = False):
    """Fused masked attention. q,k,v: [B, H, T, D]; lengths: [B] or None.
    Returns contexts [B, H, Tq, D] (alignments are never materialized)."""
    return _pallas_forward(q, k, v, q_lengths, m_lengths, scale, causal)


def _fwd(q, k, v, q_lengths, m_lengths, scale, causal):
    B, Tq, Tk = q.shape[0], q.shape[2], k.shape[2]
    if _block_size(Tq) == 0 or (Tk > FULL_KV_MAX_LENGTH
                                and _block_size(Tk) == 0):
        out = _pallas_forward(q, k, v, q_lengths, m_lengths, scale, causal)
        return out, (q, k, v, q_lengths, m_lengths, None, None, None)
    ql, ml = _default_lengths(q_lengths, m_lengths, B, Tq, Tk)
    out, sm_m, sm_s = _pallas_forward(q, k, v, ql, ml, scale, causal,
                                      with_stats=True)
    return out, (q, k, v, ql, ml, out, sm_m, sm_s)


def _bwd(scale, causal, res, g):
    q, k, v, q_lengths, m_lengths, o, sm_m, sm_s = res
    if sm_m is not None and _block_size(k.shape[2]) != 0:
        grads = _pallas_backward(q, k, v, q_lengths, m_lengths, o, sm_m,
                                 sm_s, g, scale, causal)
        if grads is not None:
            dq, dk, dv = grads
            return dq, dk, dv, None, None
    # ragged shapes: delegate to the XLA reference VJP
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference(q_, k_, v_, q_lengths, m_lengths,
                                          scale, causal), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


masked_flash_attention.defvjp(_fwd, _bwd)

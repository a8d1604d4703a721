"""Ring self-attention: sequence parallelism over the device mesh.

Beyond-parity capability (the reference caps sequence length via the
reduction-factor trick; SURVEY.md section 5 marks sequence parallelism out of
parity scope). This shards the TIME axis of q/k/v over a mesh axis and runs
blockwise attention with an online-softmax accumulator while k/v blocks
rotate around the ring via ppermute - the collective rides ICI, VMEM holds
only one [T/n, T/n] score block per step, and the result is bitwise-comparable
(up to fp reassociation) to full masked attention.

Masking matches models/attention.py semantics: additive finite NEG over
length + causal masks, so fully-masked query rows degrade to uniform
attention exactly like the single-device path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.attention import MASK_VALUE


def _local_ring_attention(q_l, k_l, v_l, lengths, *, scale: float,
                          causal: bool, axis: str):
    """Per-shard body (inside shard_map). q_l/k_l/v_l: [B, H, Tl, D] local
    blocks of a T-sharded global array; lengths: [B] replicated."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    B, H, Tl, D = q_l.shape
    q32 = q_l.astype(jnp.float32)
    q_pos = idx * Tl + jnp.arange(Tl)  # global positions of local queries
    q_valid = q_pos[None, :] < lengths[:, None]  # [B, Tl]

    perm = [(j, (j + 1) % n) for j in range(n)]

    def accumulate(kb, vb, i, m, s, o):
        # the block we currently hold originated at shard (idx - i) mod n
        src = (idx - i) % n
        k_pos = src * Tl + jnp.arange(Tl)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q32, kb.astype(jnp.float32),
                            preferred_element_type=jnp.float32) * scale
        mask = (k_pos[None, :] < lengths[:, None])[:, None, None, :]
        mask = jnp.logical_and(mask, q_valid[:, None, :, None])
        if causal:
            mask = jnp.logical_and(
                mask, k_pos[None, None, None, :] <= q_pos[None, None, :, None])
        logits = jnp.where(mask, logits, MASK_VALUE)

        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        alpha = jnp.exp(m - m_new)  # rescale old accumulators
        p = jnp.exp(logits - m_new[..., None])
        s_new = s * alpha + jnp.sum(p, axis=-1)
        o_new = o * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vb.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return m_new, s_new, o_new

    def step(carry, i):
        kb, vb, m, s, o = carry
        m, s, o = accumulate(kb, vb, i, m, s, o)
        kb_next = jax.lax.ppermute(kb, axis, perm)
        vb_next = jax.lax.ppermute(vb, axis, perm)
        return (kb_next, vb_next, m, s, o), None

    m0 = jnp.full((B, H, Tl), MASK_VALUE, jnp.float32)
    s0 = jnp.zeros((B, H, Tl), jnp.float32)
    o0 = jnp.zeros((B, H, Tl, D), jnp.float32)
    # rotate only n-1 times: the last block needs no onward permute
    (kb, vb, m, s, o), _ = jax.lax.scan(
        step, (k_l, v_l, m0, s0, o0), jnp.arange(n - 1))
    m, s, o = accumulate(kb, vb, n - 1, m, s, o)
    out = o / jnp.maximum(s, 1e-30)[..., None]
    return out.astype(q_l.dtype)


def ring_self_attention(q, k, v, lengths, mesh: Mesh, *, scale: float = 1.0,
                        causal: bool = False, axis: str = "model",
                        batch_axis: Optional[str] = None):
    """Sequence-parallel masked self-attention.

    q, k, v: [B, H, T, D] with T divisible by mesh.shape[axis]; lengths [B].
    Returns contexts [B, H, T, D], time-sharded over ``axis``. When
    ``batch_axis`` is given (and B divides its size), the batch dim stays
    sharded over it inside the shard_map region, composing SP with DP instead
    of silently all-gathering DP activations.
    """
    n = mesh.shape[axis]
    assert q.shape[2] % n == 0, (q.shape, n)
    ba = batch_axis
    if ba is not None and (ba not in mesh.shape or mesh.shape[ba] <= 1
                           or q.shape[0] % mesh.shape[ba] != 0):
        ba = None  # unusable/absent batch axis: replicate batch instead
    fn = functools.partial(_local_ring_attention, scale=scale, causal=causal,
                           axis=axis)
    qkv_spec = P(ba, None, axis, None)
    shard = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P(ba)),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return shard(q, k, v, lengths)


# Minimum total sequence length for the ring to pay for its collectives:
# below this, a handful of tiny per-shard einsums plus 2 ppermutes per ring
# step per layer loses to one local fused attention (the analogue of the
# Pallas PALLAS_MIN_SCORE_ELEMENTS crossover; unmeasurable without real
# multi-chip ICI, so set where sequence sharding plausibly matters and kept
# overridable for tests/benchmarks).
RING_MIN_SEQ = 1024


def ring_eligible(mesh: Optional[Mesh], axis: str, tq: int, tk: int,
                  min_seq: Optional[int] = None) -> bool:
    """Static trace-time check: can/should this (self-)attention ring?"""
    if mesh is None or axis not in mesh.axis_names:
        return False
    n = mesh.shape[axis]
    min_seq = RING_MIN_SEQ if min_seq is None else min_seq
    return n > 1 and tq == tk and tq % n == 0 and tq >= min_seq

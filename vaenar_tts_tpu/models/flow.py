"""Normalizing-flow layers for the Glow-style prior.

Behavior parity with reference modules/flow.py:
  * ActNorm           (:156-196): per-channel scale/bias with data-dependent
    init from the first batch's mean/std.
  * InvertibleLinear  (:116-153): QR-initialized square weight; the backward
    pass multiplies by the inverse; logdet = lengths * slogdet(W).
  * TransformerCoupling (:199-262): split channels in half (alternating
    upper/lower order), text-conditioned transformer predicts scale/shift,
    scale = sigmoid(log_scale + 2.0), masked logdet.
  * TransformerTransform <- reference modules/transform.py:30-59: the
    conditioning net inside each coupling (pre-proj -> pos-enc -> N cross-
    attention blocks over text memory -> zero-init scale/shift heads).

All flow math is fp32: slogdet / inverse / log-prob accumulation are
precision-critical (SURVEY.md section 7 hard part #2). TPUs have no fp64, so
slogdet runs fp32 where the reference upcast to fp64 - the weight is
orthogonal at init and stays well-conditioned, keeping fp32 slogdet accurate.

Data-dependent ActNorm init is a *pure* pass (SURVEY hard part #3): run with
``data_init=True`` and a mutable 'flow_init' collection; the computed
log_scale/bias are sowed and merged into params by
``vaenar_tts_tpu.models.vaenar.merge_flow_init``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import CrossAttentionBlock, maybe_remat
from .layers import positional_encoding, sequence_mask



def _length_logdet(logdet_scalar: jnp.ndarray, lengths: Optional[jnp.ndarray],
                   batch: int, max_time: int) -> jnp.ndarray:
    """Per-example logdet = lengths * per-frame logdet
    (reference flow.py:130-134)."""
    if lengths is None:
        return jnp.full((batch,), float(max_time)) * logdet_scalar
    return lengths.astype(jnp.float32) * logdet_scalar


def _keep_last(_prev, new):
    return new


class ActNorm(nn.Module):
    """Per-channel affine y = x * exp(log_scale) + bias
    (reference flow.py:156-196)."""

    channels: int

    def setup(self):
        self.log_scale = self.param(
            "log_scale", nn.initializers.normal(stddev=0.05), (self.channels,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.channels,))

    def __call__(self, x, lengths=None, reverse: bool = False,
                 data_init: bool = False, init_scale: float = 1.0,
                 epsilon: float = 1e-8) -> Tuple[jnp.ndarray, jnp.ndarray]:
        batch, max_time = x.shape[0], x.shape[1]
        x = x.astype(jnp.float32)
        if data_init:
            # reference flow.py:189-196: stats over ALL positions (padding
            # included), assigned into the params.
            flat = x.reshape(-1, self.channels)
            mean = flat.mean(axis=0)
            std = flat.std(axis=0)
            log_scale = jnp.log(init_scale / (std + epsilon))
            bias = -mean / (std + epsilon)
            self.sow("flow_init", "log_scale", log_scale, reduce_fn=_keep_last)
            self.sow("flow_init", "bias", bias, reduce_fn=_keep_last)
        else:
            log_scale, bias = self.log_scale, self.bias

        if reverse:
            out = (x - bias) / (jnp.exp(log_scale) + epsilon)
            logdet_scalar = -jnp.sum(log_scale)
        else:
            out = x * jnp.exp(log_scale) + bias
            logdet_scalar = jnp.sum(log_scale)
        return out, _length_logdet(logdet_scalar, lengths, batch, max_time)


def precompute_invertible_stack(weights: jnp.ndarray, reverse: bool
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Factor a whole stack of invertible-linear weights with ONE batched LU.

    ``weights`` is [n_blk, C, C]. Returns (apply_mats, logabsdets): the
    matrix each layer should matmul by ([n_blk, C, C]; W forward, W^-1 in
    reverse) and the UNSIGNED log|det W| per layer ([n_blk]).

    Rationale (TPU): `jnp.linalg.inv` and `jnp.linalg.slogdet` each lower to
    their own LU custom call. The Glow stack (prior.py) used to issue
    2*n_blk of these tiny serial, latency-bound 128x128 factorizations per
    train step (plus their VJPs). One batched `lu_factor` amortizes the
    latency across the stack and shares the factorization between the
    inverse and the log-determinant — same LU kernels `inv`/`slogdet` use
    internally, so results match the per-layer path to float rounding.
    """
    weights = weights.astype(jnp.float32)
    lu, piv = jax.scipy.linalg.lu_factor(weights)
    # |det W| = prod |diag U| (permutation sign is irrelevant: only log|det|
    # enters the density, reference flow.py:130-134)
    logabsdets = jnp.sum(jnp.log(jnp.abs(
        jnp.diagonal(lu, axis1=-2, axis2=-1))), axis=-1)
    if reverse:
        eye = jnp.broadcast_to(jnp.eye(weights.shape[-1], dtype=jnp.float32),
                               weights.shape)
        apply_mats = jax.scipy.linalg.lu_solve((lu, piv), eye)
    else:
        apply_mats = weights
    return apply_mats, logabsdets


class InvertibleLinear(nn.Module):
    """Channel-mixing invertible 1x1 "convolution" (reference flow.py:116-153).

    The backward pass solves against W (one 128x128 inverse per step; XLA
    hoists it out of the batch) and uses logdet(W^-1) = -logdet(W) instead of
    re-factorizing the inverse as the reference does (flow.py:141-144).

    When the caller owns a whole stack of these (the Glow prior), it can
    factor every weight at once with :func:`precompute_invertible_stack` and
    pass this layer's slice via ``precomputed=(apply_mat, logabsdet)``,
    skipping the per-layer `inv`/`slogdet` custom calls.
    """

    channels: int

    def setup(self):
        self.weight = self.param(
            "weight", nn.initializers.orthogonal(), (self.channels, self.channels))

    def weight_matrix(self) -> jnp.ndarray:
        """The raw [C, C] weight, for stack-level precomputation."""
        return self.weight

    def __call__(self, x, lengths=None, reverse: bool = False,
                 precomputed: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        batch, max_time = x.shape[0], x.shape[1]
        x = x.astype(jnp.float32)
        if precomputed is not None:
            apply_mat, logabsdet = precomputed
            apply_mat = apply_mat.astype(jnp.float32)
        else:
            w = self.weight.astype(jnp.float32)
            # sign is irrelevant: only log|det| enters the density
            _, logabsdet = jnp.linalg.slogdet(w)
            apply_mat = jnp.linalg.inv(w) if reverse else w
        # HIGHEST precision: on TPU the default matmul precision is bf16,
        # which would break exact invertibility of the channel mix.
        out = jnp.matmul(x, apply_mat, precision=jax.lax.Precision.HIGHEST)
        logdet_scalar = -logabsdet if reverse else logabsdet
        return out, _length_logdet(logdet_scalar, lengths, batch, max_time)


class TransformerTransform(nn.Module):
    """Text-conditioned scale/shift net inside a coupling
    (reference modules/transform.py:30-59).

    The transformer net itself may run in the compute dtype (bf16): only its
    log_scale/shift OUTPUTS feed the precision-critical affine/logdet math,
    which the coupling casts back to fp32."""

    nblk: int
    attention_dim: int
    attention_heads: int
    temperature: float
    ffn_hidden: int
    out_dim: int
    use_pallas: bool = False
    dtype: Any = jnp.float32
    ring_mesh: Optional[Any] = None
    ring_axis: str = "model"
    tuning: Optional[Any] = None
    remat: Any = "off"

    @nn.compact
    def __call__(self, inputs, condition_inputs, condition_lengths=None,
                 target_lengths=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.Dense(self.attention_dim, dtype=self.dtype,
                     name="pre_projection")(inputs)
        max_time, dim = x.shape[1], x.shape[2]
        pos_weight = self.param("pos_weight", nn.initializers.ones, ())
        x = x + pos_weight * positional_encoding(max_time, dim,
                                                 dtype=self.dtype)[None]
        block_cls = maybe_remat(CrossAttentionBlock, self.remat)
        for i in range(self.nblk):
            x, _ = block_cls(
                input_dim=self.attention_dim,
                attention_dim=self.attention_dim,
                attention_heads=self.attention_heads,
                attention_temperature=self.temperature,
                ffn_hidden=self.ffn_hidden,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                ring_mesh=self.ring_mesh, ring_axis=self.ring_axis, tuning=self.tuning,
                name=f"attention_{i}")(
                x, condition_inputs, query_lengths=target_lengths,
                memory_lengths=condition_lengths)
        log_scale = nn.Dense(self.out_dim, kernel_init=nn.initializers.zeros,
                             dtype=self.dtype, name="log_scale_projection")(x)
        shift = nn.Dense(self.out_dim, kernel_init=nn.initializers.zeros,
                         dtype=self.dtype, name="shift_projection")(x)
        return log_scale, shift


class TransformerCoupling(nn.Module):
    """Affine coupling with a transformer conditioning net
    (reference flow.py:199-262)."""

    channels: int
    nblk: int
    attention_dim: int
    attention_heads: int
    temperature: float
    ffn_hidden: int
    order: str = "upper"  # 'upper': transform the second half; 'lower': first
    use_pallas: bool = False
    dtype: Any = jnp.float32  # conditioning-net compute dtype; affine is fp32
    ring_mesh: Optional[Any] = None
    ring_axis: str = "model"
    tuning: Optional[Any] = None
    remat: Any = "off"

    def setup(self):
        assert self.order in ("upper", "lower")
        self.net = TransformerTransform(
            nblk=self.nblk, attention_dim=self.attention_dim,
            attention_heads=self.attention_heads, temperature=self.temperature,
            ffn_hidden=self.ffn_hidden, out_dim=self.channels // 2,
            use_pallas=self.use_pallas, dtype=self.dtype,
            ring_mesh=self.ring_mesh, ring_axis=self.ring_axis, tuning=self.tuning,
            remat=self.remat)

    def __call__(self, inputs, condition_inputs, inputs_lengths=None,
                 condition_lengths=None, reverse: bool = False,
                 epsilon: float = 1e-12) -> Tuple[jnp.ndarray, jnp.ndarray]:
        inputs = inputs.astype(jnp.float32)
        half = self.channels // 2
        lower_pt, upper_pt = inputs[..., :half], inputs[..., half:]
        z, zp = ((lower_pt, upper_pt) if self.order == "upper"
                 else (upper_pt, lower_pt))
        log_scale, shift = self.net(
            z, condition_inputs, condition_lengths=condition_lengths,
            target_lengths=inputs_lengths)
        log_scale = log_scale.astype(jnp.float32)
        shift = shift.astype(jnp.float32)
        scale = jax.nn.sigmoid(log_scale + 2.0)  # reference flow.py:231
        if reverse:
            zp = (zp - shift) / (scale + epsilon)
            sign = -1.0
        else:
            zp = scale * zp + shift
            sign = 1.0
        max_time = inputs.shape[1]
        if inputs_lengths is not None:
            mask = sequence_mask(inputs_lengths, max_time,
                                 dtype=jnp.float32)[..., None]
        else:
            mask = jnp.ones_like(log_scale)
        logdet = sign * jnp.sum(jnp.log(scale) * mask, axis=(1, 2))
        out = (jnp.concatenate([z, zp], axis=-1) if self.order == "upper"
               else jnp.concatenate([zp, z], axis=-1))
        return out, logdet

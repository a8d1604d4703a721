"""Utterance length predictor
(reference modules/length_predictor.py:30-42, DenseLengthPredictor).

Per-token Dense(1) on (stop-gradient'd, by the caller) text embeddings;
predicted frame count = masked sum over tokens of exp(projection).

Beyond the reference: an optional *quantile head* (``quantile`` > 0) — a
second, independent Dense(1) trained with a pinball loss on log length, so
it learns the conditional p-quantile (e.g. p90) of the frame count instead
of the mean. Motivation (ALIGNMENT.md free-text table): the mean head's
under-predictions truncate the last 1-2 letters of free-text synthesis, and
a *fixed* headroom cannot fix that — the NAR decoder renders the whole text
at whatever rate the given length implies, so symmetric over-prediction is
benign while under-prediction loses content. A learned upper quantile adds
per-utterance, text-conditional headroom. The head is additive: it never
feeds gradients to the encoder (same stop-grad path as the mean head) and
the mean head's parameters/behavior are untouched, so reference parity
(PARITY_MEASURED.md) is preserved when ``quantile == 0`` (the default).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import get_activation, sequence_mask

Dtype = Any


def masked_exp_sum(proj: jnp.ndarray,
                   input_lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """[batch, max_time, 1] per-token logits -> [batch] predicted frame
    counts: fp32 masked sum of exp (reference length_predictor.py:35-42).
    One shared implementation for both predictor variants so masking/
    overflow changes cannot drift between them."""
    proj = proj.astype(jnp.float32)
    if input_lengths is not None:
        mask = sequence_mask(input_lengths, proj.shape[1],
                             dtype=jnp.float32)[..., None]
    else:
        mask = jnp.ones_like(proj)
    return jnp.sum(jnp.exp(proj) * mask, axis=(1, 2))


def pinball_log_loss(predicted_lengths: jnp.ndarray,
                     target_lengths: jnp.ndarray,
                     tau: float,
                     reduce: bool = False) -> jnp.ndarray:
    """Quantile (pinball) loss in log-length space.

    residual = log(target) - log(predicted); loss = max(tau*residual,
    (tau-1)*residual). Minimized when ``predicted`` is the conditional
    tau-quantile of the target length: under-prediction costs tau per unit,
    over-prediction (1-tau) — e.g. tau=0.9 penalizes coming up short 9x
    more than overshooting. Same log domain as the mean head's L2
    (reference models.py:96-103) so the two losses are commensurate.
    """
    log_tgt = jnp.log(target_lengths.astype(jnp.float32))
    log_pre = jnp.log(predicted_lengths)
    residual = log_tgt - log_pre
    loss = jnp.maximum(tau * residual, (tau - 1.0) * residual)
    return jnp.mean(loss) if reduce else loss


class DenseLengthPredictor(nn.Module):
    """Mean head (reference-parity) plus optional quantile head.

    ``quantile == 0`` (default): identical parameter tree and outputs to
    the round-2 module — a single Dense named ``projection``. ``quantile``
    in (0, 1): adds ``q_projection``, trained via :func:`pinball_log_loss`
    (wired in models/vaenar.py) and read at inference through
    :meth:`quantile_lengths`.
    """

    activation: str = "identity"
    dtype: Dtype = jnp.float32
    quantile: float = 0.0

    def setup(self):
        if not 0.0 <= self.quantile < 1.0:
            raise ValueError(f"quantile must be in [0, 1), got {self.quantile}")
        self.projection = nn.Dense(1, dtype=self.dtype)
        if self.quantile:
            self.q_projection = nn.Dense(1, dtype=self.dtype)

    def _lengths(self, head: nn.Dense, inputs, input_lengths) -> jnp.ndarray:
        act = get_activation(self.activation)
        proj = act(head(inputs))
        return masked_exp_sum(proj, input_lengths)

    def __call__(self, inputs, input_lengths=None) -> jnp.ndarray:
        """inputs: [batch, max_time, dim] -> predicted lengths [batch] (float)."""
        if self.quantile:
            # touch the quantile head so a __call__-based init creates its
            # params too; under apply the unused projection is DCE'd by XLA
            _ = self.q_projection(inputs)
        return self._lengths(self.projection, inputs, input_lengths)

    def quantile_lengths(self, inputs, input_lengths=None) -> jnp.ndarray:
        """Predicted tau-quantile frame counts [batch] (float)."""
        if not self.quantile:
            raise ValueError("quantile head disabled (quantile == 0)")
        return self._lengths(self.q_projection, inputs, input_lengths)

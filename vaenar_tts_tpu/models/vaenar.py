"""VAENAR: the composite model and ELBO (reference models/models.py:9-226).

Training forward (`__call__`, reference models.py:105-197):
  frame-reduce mels by stride slicing -> encode text (fractional pos step) ->
  predict lengths on stop-gradient text embeddings -> posterior mu/logvar ->
  reparameterize n_sample times -> decode (initial + postnet outs, L2 on both)
  -> prior log-prob of the samples via reverse flow -> KL as the mean log-prob
  difference.

`infer` (reference models.py:199-210): encode -> flow-prior sample
(temperature-controlled) -> decode, one parallel pass.

`init_pass` (reference models.py:212-226): data-dependent ActNorm init at
max_reduction_factor; pure - new params come back in the 'flow_init' mutable
collection and are merged with ``merge_flow_init``.

TPU-first: ``reduction_factor`` and the padded max lengths are static
(recompiles only at curriculum boundaries / per bucket); all shapes inside are
fixed. Mels are padded to a multiple of lcm(2..5)=60 by the loader so the
stride slice is exact.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs.hparams import HParams
from .decoder import TransformerDecoder
from .encoder import TransformerEncoder
from .layers import sequence_mask
from .length_predictor import DenseLengthPredictor, pinball_log_loss
from .posterior import (TransformerPosterior, gaussian_log_probability,
                        reparameterize)
from .prior import TransformerPrior


def compute_dtype_of(hp: HParams):
    return jnp.bfloat16 if hp.train.compute_dtype == "bfloat16" else jnp.float32


class VAENAR(nn.Module):
    """Composite model. ``seq_mesh``/``seq_axis`` (optional) turn on
    sequence parallelism: every self-attention whose time length divides the
    mesh axis runs on the ppermute ring (parallel/ring_attention.py), so long
    utterances shard their attention time over the 'model' axis end-to-end.
    Cross-attention (short text memory) and everything else stay on the
    GSPMD-sharded path, and the plotted cross alignments remain available."""

    hp: HParams
    seq_mesh: Optional[Any] = None
    seq_axis: str = "model"

    def setup(self):
        hp = self.hp
        dtype = compute_dtype_of(hp)
        use_pallas = hp.train.use_pallas_attention
        if isinstance(use_pallas, str):
            mapping = {"off": False, "false": False, "0": False,
                       "on": True, "true": True, "1": True, "auto": "auto"}
            if use_pallas.lower() not in mapping:
                raise ValueError(f"use_pallas_attention={use_pallas!r}")
            use_pallas = mapping[use_pallas.lower()]
        from .attention import AttentionTuning
        tuning = AttentionTuning(
            ring_min_seq=hp.train.ring_min_seq,
            pallas_min_score_elements=(
                hp.train.pallas_min_score_elements or None))
        ring = dict(ring_mesh=self.seq_mesh, ring_axis=self.seq_axis,
                    remat=hp.train.remat, tuning=tuning)
        self.n_sample = hp.train.num_samples
        self.mel_text_len_ratio = hp.common.mel_text_len_ratio
        self.max_reduction_factor = hp.common.max_reduction_factor
        self.text_encoder = TransformerEncoder(
            vocab_size=hp.encoder.vocab_size,
            embd_dim=hp.encoder.embd_dim,
            pre_nconv=hp.encoder.n_conv,
            pre_hidden=hp.encoder.pre_hidden,
            pre_conv_kernel=hp.encoder.conv_kernel,
            prenet_drop_rate=hp.encoder.pre_drop_rate,
            pre_activation=hp.encoder.pre_activation,
            bn_before_act=hp.encoder.bn_before_act,
            pos_drop_rate=hp.encoder.pos_drop_rate,
            nblk=hp.encoder.n_blk,
            attention_dim=hp.encoder.attention_dim,
            attention_heads=hp.encoder.attention_heads,
            attention_temperature=hp.encoder.attention_temperature,
            ffn_hidden=hp.encoder.ffn_hidden,
            dtype=dtype, use_pallas=use_pallas, **ring)
        self.decoder = TransformerDecoder(
            nblk=hp.decoder.nblk,
            attention_dim=hp.decoder.attention_dim,
            attention_heads=hp.decoder.attention_heads,
            temperature=hp.decoder.attention_temperature,
            ffn_hidden=hp.decoder.ffn_hidden,
            post_n_conv=hp.decoder.post_n_conv,
            post_conv_filters=hp.decoder.post_conv_filters,
            post_conv_kernel=hp.decoder.post_conv_kernel,
            post_drop_rate=hp.decoder.post_drop_rate,
            out_dim=hp.common.output_dim,
            max_reduction_factor=hp.common.max_reduction_factor,
            dtype=dtype, use_pallas=use_pallas, **ring)
        # quantile: optional p-quantile head for inference length headroom
        # (getattr: hparams.json files serialized before the field existed)
        self.length_quantile = float(
            getattr(hp.length_predictor, "quantile", 0.0))
        self.length_predictor = DenseLengthPredictor(
            activation=hp.length_predictor.activation, dtype=dtype,
            quantile=self.length_quantile)
        self.posterior = TransformerPosterior(
            pre_hidden=hp.posterior.pre_hidden,
            pre_drop_rate=hp.posterior.pre_drop_rate,
            pre_activation=hp.posterior.pre_activation,
            pos_drop_rate=hp.posterior.pos_drop_rate,
            nblk=hp.posterior.nblk,
            attention_dim=hp.posterior.attention_dim,
            attention_heads=hp.posterior.attention_heads,
            temperature=hp.posterior.temperature,
            ffn_hidden=hp.posterior.ffn_hidden,
            latent_dim=hp.common.latent_dim,
            dtype=dtype, use_pallas=use_pallas, **ring)
        self.prior = TransformerPrior(
            n_blk=hp.prior.n_blk,
            channels=hp.common.latent_dim,
            n_transformer_blk=hp.prior.n_transformer_blk,
            attention_dim=hp.prior.attention_dim,
            attention_heads=hp.prior.attention_heads,
            temperature=hp.prior.temperature,
            ffn_hidden=hp.prior.ffn_hidden,
            batched_lu=hp.prior.batched_lu,
            use_pallas=use_pallas, dtype=dtype, **ring)

    # -- loss helpers (reference models.py:67-103) ---------------------------

    def _compute_l2_loss(self, reconstructed, targets, lengths=None,
                         reduce: bool = False):
        """Masked per-frame L2, averaged over n_sample (reference
        models.py:67-86). reconstructed/targets: [batch*n_sample, T, D]."""
        n = self.n_sample
        max_time, dim = reconstructed.shape[1], reconstructed.shape[2]
        r = reconstructed.astype(jnp.float32).reshape(-1, n, max_time, dim)
        t = targets.astype(jnp.float32).reshape(-1, n, max_time, dim)
        if lengths is not None:
            mask = sequence_mask(lengths, max_time, dtype=jnp.float32)
            mask = mask.reshape(-1, n, max_time)
            lens = lengths.reshape(-1, n).astype(jnp.float32)
            per_t = jnp.mean(jnp.square(r - t), axis=-1)  # [B, n, T]
            l2 = jnp.mean(jnp.sum(per_t * mask, axis=-1) / lens, axis=-1)
        else:
            l2 = jnp.mean(jnp.square(r - t), axis=(1, 2, 3))
        return jnp.mean(l2) if reduce else l2

    @staticmethod
    def _kl_divergence(p, q, reduce: bool = False):
        """KL estimate = mean over samples of (log q_post - log p_prior)
        (reference models.py:88-94). p, q: [batch, n_sample]."""
        kl = jnp.mean(p - q, axis=1)
        return jnp.mean(kl) if reduce else kl

    @staticmethod
    def _length_l2_loss(predicted_lengths, target_lengths, reduce: bool = False):
        """Log-domain length L2 (reference models.py:96-103)."""
        log_tgt = jnp.log(target_lengths.astype(jnp.float32))
        log_pre = jnp.log(predicted_lengths)
        sq = jnp.square(log_pre - log_tgt)
        return jnp.mean(sq) if reduce else sq

    # -- training forward (reference models.py:105-197) ----------------------

    def __call__(self, inputs, mel_targets, mel_lengths, text_lengths=None,
                 reduction_factor: int = 2, train: bool = True,
                 reduce_loss: bool = True):
        hp = self.hp
        r = reduction_factor
        batch_size, mel_max_len = mel_targets.shape[0], mel_targets.shape[1]
        text_max_len = inputs.shape[1]
        n = self.n_sample

        # frame reduction by stride slice (reference models.py:123-126)
        reduced_mels = mel_targets[:, ::r, :]
        reduced_mel_lens = (mel_lengths + r - 1) // r
        reduced_mel_max_len = reduced_mels.shape[1]

        text_pos_step = self.mel_text_len_ratio / float(r)
        text_embd = self.text_encoder(inputs, text_lengths,
                                      pos_step=text_pos_step, train=train)
        predicted_lengths = self.length_predictor(
            jax.lax.stop_gradient(text_embd), text_lengths)
        length_loss = self._length_l2_loss(predicted_lengths, mel_lengths,
                                           reduce=reduce_loss)
        if self.length_quantile:
            # independent head, same stop-grad inputs: adds only its own
            # Dense(1) gradients, leaves every other loss term untouched
            q_lengths = self.length_predictor.quantile_lengths(
                jax.lax.stop_gradient(text_embd), text_lengths)
            pinball = pinball_log_loss(q_lengths, mel_lengths,
                                       self.length_quantile,
                                       reduce=reduce_loss)
            # sown so the train/dev steps can report the pinball term as its
            # own metric and keep the logged len_l2 curve comparable to
            # reference/mean-only runs (PARITY.md deviation 14); the loss
            # composition itself is unchanged
            self.sow("diagnostics", "pinball", pinball)
            length_loss = length_loss + pinball

        mu, logvar = self.posterior(reduced_mels, text_embd,
                                    src_lengths=text_lengths,
                                    target_lengths=reduced_mel_lens,
                                    train=train)
        samples, eps = reparameterize(self.make_rng("sample"), mu, logvar, n)
        posterior_logprobs = gaussian_log_probability(
            mu, logvar, eps=eps, seq_lengths=reduced_mel_lens)

        # tile everything to batch*n_sample (reference models.py:146-178)
        latent_dim = samples.shape[-1]
        batched_samples = samples.reshape(
            batch_size * n, reduced_mel_max_len, latent_dim)
        batched_text_embd = jnp.repeat(text_embd, n, axis=0) if n > 1 else text_embd
        batched_mel_targets = (jnp.repeat(mel_targets, n, axis=0)
                               if n > 1 else mel_targets)
        batched_mel_lengths = jnp.repeat(mel_lengths, n) if n > 1 else mel_lengths
        batched_r_mel_lens = (jnp.repeat(reduced_mel_lens, n)
                              if n > 1 else reduced_mel_lens)
        batched_text_lengths = (jnp.repeat(text_lengths, n)
                                if n > 1 else text_lengths)

        decoded_initial, decoded_outs, dec_alignments = self.decoder(
            batched_samples, batched_text_embd, z_lengths=batched_r_mel_lens,
            text_lengths=batched_text_lengths, reduction_factor=r, train=train)
        decoded_initial = decoded_initial[:, :mel_max_len, :]
        decoded_outs = decoded_outs[:, :mel_max_len, :]

        initial_l2 = self._compute_l2_loss(decoded_initial, batched_mel_targets,
                                           batched_mel_lengths, reduce_loss)
        l2_loss = self._compute_l2_loss(decoded_outs, batched_mel_targets,
                                        batched_mel_lengths, reduce_loss)
        l2_loss = l2_loss + initial_l2

        prior_logprobs = self.prior.log_probability(
            z=batched_samples, condition_inputs=batched_text_embd,
            z_lengths=batched_r_mel_lens,
            condition_lengths=batched_text_lengths)
        prior_logprobs = prior_logprobs.reshape(batch_size, n)
        kl_divergence = self._kl_divergence(posterior_logprobs, prior_logprobs,
                                            reduce_loss)
        return decoded_outs, l2_loss, kl_divergence, length_loss, dec_alignments

    # -- inference (reference models.py:199-210) -----------------------------

    def infer(self, inputs, mel_lengths, text_lengths=None,
              reduction_factor: int = 2, max_mel_length: Optional[int] = None,
              temperature=1.0):
        """Sample z from the flow prior and decode. ``max_mel_length`` is the
        static padded mel length (bucketed by the caller)."""
        r = reduction_factor
        if max_mel_length is None:
            raise ValueError("max_mel_length must be provided (static shape)")
        reduced_mel_lens = (mel_lengths + r - 1) // r
        reduced_max = -(-max_mel_length // r)
        text_pos_step = self.mel_text_len_ratio / float(r)
        text_embd = self.text_encoder(inputs, text_lengths,
                                      pos_step=text_pos_step, train=False)
        prior_latents, _prior_logprobs = self.prior.sample(
            reduced_mel_lens, text_embd, text_lengths,
            max_length=reduced_max, temperature=temperature)
        _, predicted_mel, dec_alignments = self.decoder(
            prior_latents, text_embd, z_lengths=reduced_mel_lens,
            text_lengths=text_lengths, reduction_factor=r, train=False)
        return predicted_mel, dec_alignments

    def predict_lengths(self, inputs, text_lengths,
                        reduction_factor: int = 2):
        """Length-prediction API: text -> (mean_lengths, quantile_lengths).

        ``quantile_lengths`` is None when the model was built without a
        quantile head (hp.length_predictor.quantile == 0) — a config-static
        choice, so the output pytree structure is stable under jit.
        Runs only the text encoder + Dense head(s); the cheap way to probe
        length calibration (scripts/quantile_headroom_eval.py)."""
        text_pos_step = self.mel_text_len_ratio / float(reduction_factor)
        text_embd = self.text_encoder(inputs, text_lengths,
                                      pos_step=text_pos_step, train=False)
        text_embd = jax.lax.stop_gradient(text_embd)
        mean = self.length_predictor(text_embd, text_lengths)
        q = (self.length_predictor.quantile_lengths(text_embd, text_lengths)
             if self.length_quantile else None)
        return mean, q

    def infer_with_length_prediction(self, inputs, text_lengths,
                                     max_mel_length: int,
                                     reduction_factor: int = 2,
                                     temperature=0.0,
                                     length_headroom: int = 80,
                                     use_length_quantile: bool = False):
        """Full CLI-style inference (reference inference.py:125-143): predict
        lengths from the text, add ``length_headroom`` frames (the
        reference's hard-coded +80, inference.py:136), clamp to the static
        bucket, sample, decode. Returns (mels, predicted_lengths,
        alignments).

        On headroom: a NAR attention decoder renders the WHOLE text within
        whatever z-length it is given (alignment adapts its rate; there is
        no truncation mode), while frames past the content the prior never
        trained to end decode to junk — so headroom only ever ADDS garbage.
        The CLI therefore passes 0 by default (PARITY.md deviation 13);
        pass 80 for exact reference behavior.

        ``use_length_quantile``: read the trained p-quantile head (learned,
        text-conditional headroom against truncation; see
        length_predictor.py docstring) instead of the mean head. Requires
        ``hp.length_predictor.quantile > 0`` at train time."""
        r = reduction_factor
        text_pos_step = self.mel_text_len_ratio / float(r)
        text_embd = self.text_encoder(inputs, text_lengths,
                                      pos_step=text_pos_step, train=False)
        if use_length_quantile:
            predicted = self.length_predictor.quantile_lengths(
                jax.lax.stop_gradient(text_embd), text_lengths)
        else:
            predicted = self.length_predictor(
                jax.lax.stop_gradient(text_embd), text_lengths)
        # clamp in float first: exp() of untrained logits can overflow, and
        # float->int conversion of inf/huge values is undefined in XLA
        predicted = jnp.clip(predicted, 1.0, float(max_mel_length))
        pred_m_l = predicted.astype(jnp.int32) + length_headroom
        pred_m_l = jnp.minimum(pred_m_l, max_mel_length)
        reduced_lens = (pred_m_l + r - 1) // r
        reduced_max = -(-max_mel_length // r)
        prior_latents, _ = self.prior.sample(
            reduced_lens, text_embd, text_lengths,
            max_length=reduced_max, temperature=temperature)
        _, predicted_mel, dec_alignments = self.decoder(
            prior_latents, text_embd, z_lengths=reduced_lens,
            text_lengths=text_lengths, reduction_factor=r, train=False)
        return predicted_mel, pred_m_l, dec_alignments

    # -- data-dependent init (reference models.py:212-226) -------------------

    def init_pass(self, text_inputs, mel_lengths, text_lengths=None,
                  max_mel_length: Optional[int] = None):
        """Run under apply(..., mutable=['flow_init', 'batch_stats']); merge
        the sowed ActNorm stats with ``merge_flow_init``."""
        if max_mel_length is None:
            raise ValueError("max_mel_length must be provided (static shape)")
        r = self.max_reduction_factor
        reduced_mel_lens = (mel_lengths + r - 1) // r
        reduced_max = -(-max_mel_length // r)
        text_pos_step = self.mel_text_len_ratio / float(r)
        text_embd = self.text_encoder(text_inputs, text_lengths,
                                      pos_step=text_pos_step, train=True)
        prior_latents, _ = self.prior.init_pass(
            conditions=text_embd, targets_lengths=reduced_mel_lens,
            condition_lengths=text_lengths, max_length=reduced_max)
        _, predicted_mel, _ = self.decoder(
            prior_latents, text_embd, z_lengths=reduced_mel_lens,
            text_lengths=text_lengths, reduction_factor=r, train=True)
        return predicted_mel


def merge_flow_init(params: Dict, flow_init: Dict) -> Dict:
    """Overlay the sowed 'flow_init' ActNorm stats onto the params tree
    (functional replacement for the reference's in-place assigns,
    flow.py:194-195)."""

    def merge(p, f):
        out = dict(p)
        for k, v in f.items():
            if isinstance(v, dict) and k in out and isinstance(out[k], dict):
                out[k] = merge(out[k], v)
            else:
                out[k] = v
        return out

    import flax
    p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    f = flax.core.unfreeze(flow_init) if hasattr(flow_init, "unfreeze") else dict(flow_init)
    return merge(p, f)

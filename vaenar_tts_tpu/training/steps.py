"""Pure jitted train/dev/test/init step builders.

Functional counterparts of the reference's tf.function steps
(train.py:120-179): explicit (params, batch_stats, opt_state) state threading,
optax Adam, PRNG keys per step. ``reduction_factor`` is a static argument -
the curriculum changes it only at epoch boundaries (4 recompiles total per
shape bucket).

The total loss is mel_l2 + kl_weight * max(kl, 0) + length_weight * len_l2
(reference train.py:135); the dev loss uses the unclamped kl
(reference train.py:154).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..configs.hparams import HParams
from ..models.vaenar import VAENAR, merge_flow_init


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: int = 0

    def as_dict(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats,
                "opt_state": self.opt_state, "epoch": self.epoch}

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainState":
        return cls(params=d["params"], batch_stats=d["batch_stats"],
                   opt_state=d["opt_state"], epoch=int(d["epoch"]))


def plots_variant(hp: HParams) -> HParams:
    """Same architecture with the fused Pallas attention disabled (so
    cross-attention alignments are materialized for plotting) and remat off
    (inference-only; sown intermediates must not sit under a checkpoint
    boundary); the param tree is identical, so trained params apply unchanged
    (fixes the silent alignment-plot dropout when the fused path is on)."""
    if hp.train.use_pallas_attention in (False, "off") and hp.train.remat == "off":
        return hp
    return hp.replace(train=dataclasses.replace(
        hp.train, use_pallas_attention=False, remat="off"))


def make_optimizer(hp: HParams) -> optax.GradientTransformation:
    # reference train.py:116-117: Adam(1.25e-4, 0.9, 0.999, eps=1e-7)
    return optax.adam(hp.train.learning_rate, b1=hp.train.adam_beta1,
                      b2=hp.train.adam_beta2, eps=hp.train.adam_eps)


def init_model(hp: HParams, model: VAENAR, seed: int,
               text_max: int, mel_max: int) -> Tuple[Any, Any]:
    """Initialize (params, batch_stats) with dummy shapes."""
    k = jax.random.key(seed)
    k_p, k_d, k_s = jax.random.split(k, 3)
    B = 2
    texts = jnp.zeros((B, text_max), jnp.int32)
    mels = jnp.zeros((B, mel_max, hp.audio.num_mels), jnp.float32)
    t_lens = jnp.full((B,), text_max, jnp.int32)
    m_lens = jnp.full((B,), mel_max, jnp.int32)
    variables = model.init(
        {"params": k_p, "dropout": k_d, "sample": k_s},
        texts, mels, m_lens, t_lens,
        reduction_factor=hp.common.max_reduction_factor, train=True)
    return variables["params"], variables.get("batch_stats", FrozenDict())


def make_train_step(hp: HParams, model: VAENAR,
                    optimizer: optax.GradientTransformation,
                    donate: bool = True) -> Callable:
    """Returns jitted fn(params, batch_stats, opt_state, texts, mels, t_lens,
    m_lens, kl_weight, rng) -> (params, batch_stats, opt_state, metrics).

    With ``hp.train.grad_accum = A > 1`` the batch is split into A equal
    micro-batches, fwd+bwd is lax.scan'ed over them (one micro-batch's
    activations live at a time - per-op working sets stay at the batch/A
    optimum, dodging the measured HBM-bandwidth wall past batch 32, README
    batch-scaling row), gradients are averaged, and ONE Adam update is
    applied - the same global-batch semantics as the reference's single
    tf.function step (reference train.py:120-146)."""

    length_weight = hp.train.length_weight
    accum = max(1, int(getattr(hp.train, "grad_accum", 1)))
    # static: quantile-head runs report the pinball term separately so the
    # logged len_l2 stays comparable to mean-only/reference runs (the model
    # sows it into "diagnostics"; ADVICE r3)
    has_pinball = float(getattr(hp.length_predictor, "quantile", 0.0)) > 0.0
    metric_keys = (("total", "mel_l2", "kl", "len_l2", "len_pinball")
                   if has_pinball else ("total", "mel_l2", "kl", "len_l2"))

    def loss_fn(p, bstats, texts, mels, t_lens, m_lens, kl_weight,
                k_d, k_s, reduction_factor):
        outs, updated = model.apply(
            {"params": p, "batch_stats": bstats},
            texts, mels, m_lens, t_lens,
            reduction_factor=reduction_factor, train=True,
            reduce_loss=True,
            rngs={"dropout": k_d, "sample": k_s},
            mutable=["batch_stats", "diagnostics"])
        _dec, mel_l2, kl, len_l2, _ali = outs
        loss = (mel_l2 + kl_weight * jnp.maximum(kl, 0.0)
                + length_weight * len_l2)
        pinball = (updated["diagnostics"]["pinball"][-1] if has_pinball
                   else jnp.zeros((), jnp.float32))
        return loss, (mel_l2, kl, len_l2 - pinball, pinball,
                      updated["batch_stats"])

    @partial(jax.jit, static_argnames=("reduction_factor",),
             donate_argnums=(0, 1, 2) if donate else ())
    def train_step(params, batch_stats, opt_state, texts, mels, t_lens,
                   m_lens, kl_weight, rng, reduction_factor: int = 2):
        if accum == 1:
            k_d, k_s = jax.random.split(rng)
            ((loss, (mel_l2, kl, len_l2, pinball, new_bs)),
             grads) = jax.value_and_grad(loss_fn, has_aux=True)(
                 params, batch_stats, texts, mels, t_lens, m_lens,
                 kl_weight, k_d, k_s, reduction_factor)
            metrics = {"total": loss, "mel_l2": mel_l2, "kl": kl,
                       "len_l2": len_l2}
            if has_pinball:
                metrics["len_pinball"] = pinball
        else:
            B = texts.shape[0]
            assert B % accum == 0, (
                f"grad_accum={accum} must divide batch size {B}")

            def micro(x):
                return x.reshape(accum, B // accum, *x.shape[1:])

            xs = (micro(texts), micro(mels), micro(t_lens), micro(m_lens),
                  jnp.arange(accum))

            def body(carry, x):
                bstats, gsum, msum = carry
                tx, me, tl, ml, i = x
                k_d, k_s = jax.random.split(jax.random.fold_in(rng, i))
                ((loss, (mel_l2, kl, len_l2, pinball, new_bs)),
                 g) = jax.value_and_grad(loss_fn, has_aux=True)(
                     params, bstats, tx, me, tl, ml, kl_weight,
                     k_d, k_s, reduction_factor)
                m = {"total": loss, "mel_l2": mel_l2, "kl": kl,
                     "len_l2": len_l2}
                if has_pinball:
                    m["len_pinball"] = pinball
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                msum = jax.tree_util.tree_map(jnp.add, msum, m)
                return (new_bs, gsum, msum), None

            gsum0 = jax.tree_util.tree_map(jnp.zeros_like, params)
            msum0 = {k: jnp.zeros((), jnp.float32) for k in metric_keys}
            (new_bs, gsum, msum), _ = jax.lax.scan(
                body, (batch_stats, gsum0, msum0), xs)
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            metrics = {k: v / accum for k, v in msum.items()}

        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt_state, metrics

    return train_step


def make_epoch_runner(train_step: Callable) -> Callable:
    """Whole-epoch executor over a DEVICE-RESIDENT batch cache.

    The streaming loop dispatches one ``train_step`` per batch and re-uploads
    the batch data every epoch; over a tunnel-attached chip that transfer
    dominates (measured round 5: 5.8 s/epoch wall vs ~0.9 s step compute).
    This wraps the SAME jitted ``train_step`` (inlined math, identical
    metrics/optimizer semantics) in one jitted ``lax.scan`` over the cached
    stacked batches: per epoch only the [n_steps] batch-order array crosses
    the link, and the device runs steps back to back.

    Returns jitted fn(params, batch_stats, opt_state, texts_all, mels_all,
    tlens_all, mlens_all, order, kl_weight, rng, reduction_factor) ->
    (params, batch_stats, opt_state, rng_out, metric_sums); the per-step RNG
    split sequence matches the streaming loop exactly (split off the epoch
    key in iteration order) so both paths train the same trajectory, and
    ``rng_out`` continues that stream for the dev eval that follows.
    """

    @partial(jax.jit, static_argnames=("reduction_factor",),
             donate_argnums=(0, 1, 2))
    def run_epoch(params, batch_stats, opt_state, texts_all, mels_all,
                  tlens_all, mlens_all, order, kl_weight, rng,
                  reduction_factor: int = 2):
        def body(carry, gi):
            p, bs, os_, k = carry
            k, sub = jax.random.split(k)
            p, bs, os_, m = train_step(
                p, bs, os_, texts_all[gi], mels_all[gi], tlens_all[gi],
                mlens_all[gi], kl_weight, sub,
                reduction_factor=reduction_factor)
            return (p, bs, os_, k), m

        (params, batch_stats, opt_state, rng), ms = jax.lax.scan(
            body, (params, batch_stats, opt_state, rng), order)
        sums = jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=0), ms)
        return params, batch_stats, opt_state, rng, sums

    return run_epoch


def make_dev_step(hp: HParams, model: VAENAR) -> Callable:
    """Eval step with per-example losses masked by n_valid (repeat-padded
    batches contribute nothing), matching reference dev loss semantics
    (train.py:148-155, kl unclamped)."""

    length_weight = hp.train.length_weight
    has_pinball = float(getattr(hp.length_predictor, "quantile", 0.0)) > 0.0

    @partial(jax.jit, static_argnames=("reduction_factor",))
    def dev_step(params, batch_stats, texts, mels, t_lens, m_lens, kl_weight,
                 valid_mask, rng, reduction_factor: int = 2):
        k_s = rng
        outs, updated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            texts, mels, m_lens, t_lens,
            reduction_factor=reduction_factor, train=False, reduce_loss=False,
            rngs={"sample": k_s}, mutable=["diagnostics"])
        _dec, mel_l2, kl, len_l2, _ali = outs
        n_valid = jnp.sum(valid_mask)

        def vmean(x):
            return jnp.sum(x * valid_mask) / n_valid

        mel_l2, kl, len_l2 = vmean(mel_l2), vmean(kl), vmean(len_l2)
        loss = mel_l2 + kl_weight * kl + length_weight * len_l2
        metrics = {"total": loss, "mel_l2": mel_l2, "kl": kl,
                   "len_l2": len_l2}
        if has_pinball:  # report separately; len_l2 stays the pure L2 curve
            pinball = vmean(updated["diagnostics"]["pinball"][-1])
            metrics["len_pinball"] = pinball
            metrics["len_l2"] = len_l2 - pinball
        return metrics

    return dev_step


def make_test_step(hp: HParams, model: VAENAR) -> Callable:
    """Synthesis step (reference train.py:158-169): prior sample -> decode."""

    @partial(jax.jit,
             static_argnames=("reduction_factor", "max_mel_length"))
    def test_step(params, batch_stats, texts, t_lens, m_lens, rng,
                  reduction_factor: int = 2,
                  max_mel_length: int = 1200, temperature: float = 0.0):
        mels, ali = model.apply(
            {"params": params, "batch_stats": batch_stats},
            texts, m_lens, t_lens,
            reduction_factor=reduction_factor,
            max_mel_length=max_mel_length, temperature=temperature,
            method=VAENAR.infer, rngs={"sample": rng})
        return mels, ali

    return test_step


def make_alignment_probe(hp: HParams, model: VAENAR) -> Callable:
    """Diagnostic step exposing EVERY cross-attention site's alignments via
    the sowed "intermediates" collection (models/attention.py
    CrossAttentionBlock): the decoder's, the posterior's, and the flow
    couplings'. Used by scripts/alignment_proof.py to measure where the
    text<->time alignment is learned — the quantitative version of the
    reference's eyeballed alignment plots (reference train.py:309-325).

    Returns fn(params, batch_stats, texts, mels, t_lens, m_lens, rng, ...)
    -> (infer_mels, post_mels, {site_path: alignments}): ``infer_mels`` is
    prior-sample synthesis (the product path, reference inference.py:138-142),
    ``post_mels`` is the decode of z ~ q(z|mel,text) (teacher-forced, the
    training path's reconstruction); sites from the synthesis pass are
    prefixed "infer/" and sites from the posterior pass "post/". Comparing
    the two MCDs isolates how much quality is lost crossing from posterior
    to prior samples.

    The probe always runs the plots variant (fused attention off): on the
    fused path alignments are not materialized and the sow is skipped, which
    would silently drop sites from the measurement. The param tree is
    identical, so the caller's params apply unchanged.
    """
    model = VAENAR(plots_variant(hp))

    @partial(jax.jit, static_argnames=("reduction_factor", "max_mel_length"))
    def probe(params, batch_stats, texts, mels, t_lens, m_lens, rng,
              reduction_factor: int = 2, max_mel_length: int = 1200,
              temperature: float = 0.0):
        (out_mels, _), inter_inf = model.apply(
            {"params": params, "batch_stats": batch_stats},
            texts, m_lens, t_lens, reduction_factor=reduction_factor,
            max_mel_length=max_mel_length, temperature=temperature,
            method=VAENAR.infer, rngs={"sample": rng},
            mutable=["intermediates"])
        post_outs, inter_post = model.apply(
            {"params": params, "batch_stats": batch_stats},
            texts, mels, m_lens, t_lens, reduction_factor=reduction_factor,
            train=False, reduce_loss=True, rngs={"sample": rng},
            mutable=["intermediates"])
        sites = {}
        for prefix, inter in (("infer", inter_inf), ("post", inter_post)):
            for path, vals in _flatten_sown(inter["intermediates"]):
                sites[f"{prefix}/{path}"] = vals
        return out_mels, post_outs[0], sites

    return probe


def _flatten_sown(tree, path=()):
    """Yield ('/'-joined module path, array) for sowed cross_alignments."""
    if isinstance(tree, (dict, FrozenDict)):
        for k, v in tree.items():
            if k == "cross_alignments":
                # sow appends a tuple per call; one call per apply here
                yield "/".join(path), v[-1]
            else:
                yield from _flatten_sown(v, path + (k,))


def make_inference_step(hp: HParams, model: VAENAR) -> Callable:
    """CLI-style inference with predicted lengths
    (reference inference.py:125-143)."""

    @partial(jax.jit,
             static_argnames=("reduction_factor", "max_mel_length",
                              "length_headroom", "use_length_quantile"))
    def inference_step(params, batch_stats, texts, t_lens, rng,
                       reduction_factor: int = 2, max_mel_length: int = 2400,
                       temperature: float = 0.0, length_headroom: int = 80,
                       use_length_quantile: bool = False):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            texts, t_lens, max_mel_length=max_mel_length,
            reduction_factor=reduction_factor, temperature=temperature,
            length_headroom=length_headroom,
            use_length_quantile=use_length_quantile,
            method=VAENAR.infer_with_length_prediction,
            rngs={"sample": rng})

    return inference_step


def run_data_dependent_init(hp: HParams, model: VAENAR, params, batch_stats,
                            texts, t_lens, m_lens, max_mel_length: int,
                            seed: int = 0, keys=None):
    """The reference's init_step (train.py:171-179, models.py:212-226):
    one forward pass whose ActNorm stats become the initial flow params.
    ``max_mel_length`` is the padded mel time of the init batch. Jitted:
    run once per cold start (eager apply would dispatch per-op).
    ``keys``: optional (sample_key, dropout_key) override — multi-process
    callers pass replicated global keys so the jit spans the global mesh."""

    @jax.jit
    def _init(params, batch_stats, texts, m_lens, t_lens, k1, k2):
        _, aux = model.apply(
            {"params": params, "batch_stats": batch_stats},
            texts, m_lens, t_lens, max_mel_length=max_mel_length,
            method=VAENAR.init_pass,
            rngs={"sample": k1, "dropout": k2},
            mutable=["flow_init", "batch_stats"])
        return aux.get("flow_init", {})

    k1, k2 = keys if keys is not None else (jax.random.key(seed),
                                            jax.random.key(seed + 1))
    flow_init = _init(params, batch_stats, texts, m_lens, t_lens, k1, k2)
    return merge_flow_init(params, flow_init)

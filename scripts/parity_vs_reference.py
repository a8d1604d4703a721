"""Measured output parity vs the reference implementation.

Runs the REFERENCE CODE ITSELF (TF2 + legacy Keras, from the read-only
reference checkout) as the ground-truth oracle:

  1. build the reference VAENAR with the LJSpeech hparams, run its
     data-dependent init (reference models.py:212-226), save a real
     ``tf.train.Checkpoint`` — the same artifact type as the published
     pretrained models (reference README.md:4);
  2. import that checkpoint with ``load_reference_checkpoint`` (pure-Python
     TensorBundle reader + weight map);
  3. drive BOTH models through every active-path subsystem on identical
     inputs and print max|diff| / relative errors per stage, plus the
     headline mel-L1 of the deterministic (temperature=0) synthesis path
     (reference inference.py:125-143).

Usage:
  TF_USE_LEGACY_KERAS=1 JAX_PLATFORM_NAME=cpu python scripts/parity_vs_reference.py \
      [--reference /root/reference] [--out PARITY_MEASURED.md]

The reference checkout is only *executed*, never copied.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tokenize_sentences(hp, sentences):
    from vaenar_tts_tpu.text.tokenizer import CharTokenizer
    tok = CharTokenizer(hp.text)
    ids = [tok.encode_english(s) for s in sentences]
    t_lens = np.array([len(i) for i in ids], np.int32)
    t_max = int(t_lens.max())
    texts = np.zeros((len(ids), t_max), np.int32)
    for i, seq in enumerate(ids):
        texts[i, :len(seq)] = seq
    return texts, t_lens


def run_reference(ref_dir, texts, t_lens, m_lens, mels, r, ckpt_prefix):
    """Build + init the reference model, save ckpt, return stage outputs."""
    sys.path.insert(0, ref_dir)
    import tensorflow as tf
    from configs.hparams import LJHPS
    from models.models import VAENAR as RefVAENAR

    tf.random.set_seed(1234)
    np.random.seed(1234)
    model = RefVAENAR(LJHPS)
    texts_t = tf.constant(texts)
    t_lens_t = tf.constant(t_lens)
    m_lens_t = tf.constant(m_lens)
    mels_t = tf.constant(mels)

    # data-dependent flow init (reference train.py:257-258)
    model.init(texts_t, m_lens_t, t_lens_t)
    # build every remaining layer (posterior, length predictor) with one
    # training call, then perturb all trainable weights: zero-initialized
    # heads (posterior mu/logvar, coupling scale/shift) would otherwise make
    # their stages trivially zero on both sides
    model(texts_t, mels_t, m_lens_t, t_lens_t, reduction_factor=r,
          training=True, reduce_loss=True)
    prng = np.random.default_rng(99)
    for v in model.trainable_variables:
        v.assign(v + prng.normal(0.0, 0.02, v.shape).astype(np.float32))

    out = {}
    pos_step = model.mel_text_len_ratio / tf.cast(r, tf.float32)
    text_embd = model.text_encoder(texts_t, t_lens_t, pos_step=pos_step,
                                   training=False)
    out["text_embd"] = np.asarray(text_embd)

    out["pred_lengths"] = np.asarray(model.length_predictor(
        tf.stop_gradient(text_embd), t_lens_t))

    reduced_lens = (m_lens_t + r - 1) // r
    z, prior_logprob = model.prior.sample(reduced_lens, text_embd, t_lens_t,
                                          temperature=0.0, training=False)
    out["z"] = np.asarray(z)
    out["prior_sample_logprob"] = np.asarray(prior_logprob)

    initial, mel_out, _ali = model.decoder(
        inputs=z, text_embd=text_embd, z_lengths=reduced_lens,
        text_lengths=t_lens_t, training=False, reduction_factor=r)
    out["decoder_initial"] = np.asarray(initial)
    out["mel"] = np.asarray(mel_out)

    # posterior on the provided mels (training path, no sampling): the
    # reference returns (mu_head_out, logvar_head_out, _) but USES them
    # swapped (models.py:136) — record them under their *roles*.
    reduced_mels = mels_t[:, ::r, :]
    head_mu, head_logvar, _ = model.posterior(
        reduced_mels, text_embd, src_lengths=t_lens_t,
        target_lengths=reduced_lens, training=False)
    out["posterior_logvar"] = np.asarray(head_mu)     # role: logvar
    out["posterior_mu"] = np.asarray(head_logvar)     # role: mu
    log_probs = model.prior.log_probability(
        z=z, condition_inputs=text_embd, z_lengths=reduced_lens,
        condition_lengths=t_lens_t, training=False)
    out["prior_logprob_of_z"] = np.asarray(log_probs)

    # save AFTER all stages so every lazily-built Keras layer has variables
    ckpt = tf.train.Checkpoint(model=model)
    ckpt.write(ckpt_prefix)
    return out


def run_ours(ckpt_prefix, texts, t_lens, m_lens, mels, r,
             compute_dtype="float32"):
    import dataclasses

    import jax
    # the axon TPU plugin initializes from startup env (a .pth hook), so
    # in-process env vars cannot force CPU — only this config call can.
    # CPU = deterministic fp32 matmuls; on the TPU the default bf16 matmul
    # precision would add ~2e-2 noise to every stage.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vaenar_tts_tpu.configs.hparams import LJSpeechConfig
    from vaenar_tts_tpu.interop import load_reference_checkpoint
    from vaenar_tts_tpu.models import VAENAR

    # the reference oracle computes in fp32; the flagship preset's bf16
    # compute dtype would dominate the comparison with rounding noise
    hp = LJSpeechConfig()
    hp = hp.replace(train=dataclasses.replace(hp.train,
                                              compute_dtype=compute_dtype))
    params, batch_stats = load_reference_checkpoint(ckpt_prefix, hp)
    model = VAENAR(hp)
    variables = {"params": params, "batch_stats": batch_stats}
    texts_j, t_lens_j = jnp.asarray(texts), jnp.asarray(t_lens)
    m_lens_j, mels_j = jnp.asarray(m_lens), jnp.asarray(mels)
    max_mel = mels.shape[1]

    out = {}
    pos_step = hp.common.mel_text_len_ratio / float(r)
    text_embd = model.apply(
        variables, texts_j, t_lens_j, pos_step=pos_step, train=False,
        method=lambda m, *a, **k: m.text_encoder(*a, **k))
    out["text_embd"] = np.asarray(text_embd, np.float32)

    out["pred_lengths"] = np.asarray(model.apply(
        variables, text_embd, t_lens_j,
        method=lambda m, te, tl: m.length_predictor(
            jax.lax.stop_gradient(te), tl)), np.float32)

    reduced_lens = (m_lens_j + r - 1) // r
    reduced_max = max_mel // r
    z, logprob = model.apply(
        variables, reduced_lens, text_embd, t_lens_j,
        rngs={"sample": jax.random.key(0)},
        method=lambda m, rl, te, tl: m.prior.sample(
            rl, te, tl, max_length=reduced_max, temperature=0.0))
    out["z"] = np.asarray(z, np.float32)
    out["prior_sample_logprob"] = np.asarray(logprob, np.float32)

    initial, mel_out, _ali = model.apply(
        variables, jnp.asarray(out["z"]), text_embd, reduced_lens, t_lens_j,
        method=lambda m, zz, te, rl, tl: m.decoder(
            zz, te, z_lengths=rl, text_lengths=tl, reduction_factor=r,
            train=False))
    out["decoder_initial"] = np.asarray(initial, np.float32)
    out["mel"] = np.asarray(mel_out, np.float32)

    reduced_mels = mels_j[:, ::r, :]
    mu, logvar = model.apply(
        variables, reduced_mels, text_embd, t_lens_j, reduced_lens,
        method=lambda m, rm, te, tl, rl: m.posterior(
            rm, te, src_lengths=tl, target_lengths=rl, train=False))
    out["posterior_mu"] = np.asarray(mu, np.float32)
    out["posterior_logvar"] = np.asarray(logvar, np.float32)

    logp = model.apply(
        variables, jnp.asarray(out["z"]), text_embd, reduced_lens, t_lens_j,
        method=lambda m, zz, te, rl, tl: m.prior.log_probability(
            z=zz, condition_inputs=te, z_lengths=rl, condition_lengths=tl))
    out["prior_logprob_of_z"] = np.asarray(logp, np.float32)
    return out


def compare(ref, ours, m_lens, t_lens, r):
    rows = []
    for key in ref:
        a, b = ref[key], ours[key]
        if a.shape != b.shape:
            rows.append((key, f"SHAPE MISMATCH {a.shape} vs {b.shape}", "", ""))
            continue
        # mask padded positions for sequence outputs
        if a.ndim == 3 and a.shape[1] in (m_lens.max(), m_lens.max() // r):
            lens = m_lens if a.shape[1] == m_lens.max() else (m_lens + r - 1) // r
            mask = (np.arange(a.shape[1])[None, :] < lens[:, None])[..., None]
            a, b = a * mask, b * mask
            denom = np.abs(a).mean() + 1e-12
        else:
            denom = np.abs(a).mean() + 1e-12
        max_abs = float(np.abs(a - b).max())
        l1 = float(np.abs(a - b).mean())
        rows.append((key, f"{max_abs:.3e}", f"{l1:.3e}", f"{l1 / denom:.3e}"))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=None,
                    help="write a PARITY_MEASURED.md section to this path")
    args = ap.parse_args()

    from vaenar_tts_tpu.configs.hparams import LJSpeechConfig
    hp = LJSpeechConfig()
    sentences = [
        "Printing, in the only sense with which we are at present concerned.",
        "The quick brown fox jumps over the lazy dog.",
        "In being comparatively modern.",
        "Scientists at the CERN laboratory say they have discovered a new particle.",
    ]
    texts, t_lens = tokenize_sentences(hp, sentences)
    rng = np.random.default_rng(0)
    m_lens = np.array([96, 64, 40, 120], np.int32)
    r = hp.common.final_reduction_factor
    mels = (rng.standard_normal((4, 120, 80)) * 0.3 + 0.4).astype(np.float32)

    with tempfile.TemporaryDirectory() as td:
        prefix = os.path.join(td, "ref-oracle")
        print("running reference oracle (TF)...")
        ref = run_reference(args.reference, texts, t_lens, m_lens, mels, r,
                            prefix)
        print("running our model with imported weights (JAX)...")
        ours = run_ours(prefix, texts, t_lens, m_lens, mels, r)

    rows = compare(ref, ours, m_lens, t_lens, r)
    header = f"{'stage':26s} {'max|diff|':>12s} {'L1':>12s} {'rel-L1':>12s}"
    print(header)
    lines = [header]
    for key, mx, l1, rel in rows:
        line = f"{key:26s} {mx:>12s} {l1:>12s} {rel:>12s}"
        print(line)
        lines.append(line)

    if args.out:
        with open(args.out, "a") as f:
            f.write("\n```\n" + "\n".join(lines) + "\n```\n")


if __name__ == "__main__":
    main()

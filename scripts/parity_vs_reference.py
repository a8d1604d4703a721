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

from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()  # pins jax_platforms=cpu under JAX_PLATFORM_NAME=cpu:
                       # this CPU oracle must never open a second TPU
                       # connection under a live training job (CLAUDE.md)

import numpy as np


def tokenize_sentences(hp, sentences, english=True):
    from vaenar_tts_tpu.text.tokenizer import CharTokenizer
    tok = CharTokenizer(hp.text)
    ids = [tok.encode_english(s) if english else tok.encode(s)
           for s in sentences]
    t_lens = np.array([len(i) for i in ids], np.int32)
    t_max = int(t_lens.max())
    texts = np.zeros((len(ids), t_max), np.int32)
    for i, seq in enumerate(ids):
        texts[i, :len(seq)] = seq
    return texts, t_lens


def run_reference(ref_dir, texts, t_lens, m_lens, mels, r, ckpt_prefix,
                  preset="ljspeech"):
    """Build + init the reference model, save ckpt, return stage outputs."""
    sys.path.insert(0, ref_dir)
    import tensorflow as tf
    from configs.hparams import LJHPS, DataBakerHPS
    from models.models import VAENAR as RefVAENAR

    tf.random.set_seed(1234)
    np.random.seed(1234)
    model = RefVAENAR(LJHPS if preset == "ljspeech" else DataBakerHPS)
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
    return out, model


def reference_restore_and_recompute(model, prefix, texts, t_lens, m_lens, r):
    """EXPORT direction: restore OUR exported TensorBundle into the live
    reference model via its own tf.train.Checkpoint.restore, then recompute
    the deterministic synthesis path (reference inference.py:125-143)."""
    import tensorflow as tf
    ckpt = tf.train.Checkpoint(model=model)
    status = ckpt.restore(prefix)
    status.expect_partial()
    texts_t, t_lens_t = tf.constant(texts), tf.constant(t_lens)
    m_lens_t = tf.constant(m_lens)
    pos_step = model.mel_text_len_ratio / tf.cast(r, tf.float32)
    text_embd = model.text_encoder(texts_t, t_lens_t, pos_step=pos_step,
                                   training=False)
    reduced_lens = (m_lens_t + r - 1) // r
    z, _ = model.prior.sample(reduced_lens, text_embd, t_lens_t,
                              temperature=0.0, training=False)
    _, mel_out, _ = model.decoder(
        inputs=z, text_embd=text_embd, z_lengths=reduced_lens,
        text_lengths=t_lens_t, training=False, reduction_factor=r)
    return {"text_embd": np.asarray(text_embd), "z": np.asarray(z),
            "mel": np.asarray(mel_out)}


def reference_grads(model, texts, t_lens, m_lens, mels, r, eps_np,
                    kl_weight=1e-5):
    """Train-step oracle on the reference side (train.py:127-137): loss
    components + per-submodule gradient norms under tf.GradientTape, with
    the posterior's reparameterization noise pinned to ``eps_np`` and
    training=False (the dev-mode forward: no dropout, frozen BN stats — the
    only deterministic basis for a cross-framework gradient comparison)."""
    import tensorflow as tf
    texts_t, t_lens_t = tf.constant(texts), tf.constant(t_lens)
    m_lens_t, mels_t = tf.constant(m_lens), tf.constant(mels)
    orig_normal = tf.random.normal
    tf.random.normal = lambda shape, *a, **k: tf.constant(eps_np, tf.float32)
    try:
        with tf.GradientTape() as tape:
            _pred, mel_l2, kl, len_l2, _ali = model(
                texts_t, mels_t, m_lens_t, t_lens_t, reduction_factor=r,
                training=False, reduce_loss=True)
            loss = mel_l2 + kl_weight * tf.maximum(kl, 0.0) + 1.0 * len_l2
        grads = tape.gradient(loss, model.trainable_variables)
    finally:
        tf.random.normal = orig_normal
    by_id = {id(v): g for v, g in zip(model.trainable_variables, grads)}
    groups = {"text_encoder": model.text_encoder, "decoder": model.decoder,
              "posterior": model.posterior, "prior": model.prior,
              "length_predictor": model.length_predictor}
    norms = {}
    for name, sub in groups.items():
        sq = 0.0
        for v in sub.trainable_variables:
            g = by_id.get(id(v))
            if g is not None:
                sq += float(tf.reduce_sum(tf.square(g)))
        norms[name] = sq ** 0.5
    total = sum(float(tf.reduce_sum(tf.square(g)))
                for g in grads if g is not None) ** 0.5
    return {"loss": float(loss), "mel_l2": float(mel_l2), "kl": float(kl),
            "len_l2": float(len_l2), "grad_norms": norms,
            "grad_global_norm": total}


def ours_grads(hp, params, batch_stats, texts, t_lens, m_lens, mels, r,
               eps_np, kl_weight=1e-5):
    """Our side of the train-step oracle: same pinned eps, same dev-mode
    forward, jax.value_and_grad; per-top-module grad norms match the
    reference grouping (params tree top level = submodule attribute)."""
    import jax
    import jax.numpy as jnp

    import vaenar_tts_tpu.models.vaenar as vm
    from vaenar_tts_tpu.models import VAENAR

    model = VAENAR(hp)
    eps_j = jnp.asarray(eps_np, jnp.float32)

    def pinned_reparameterize(rng, mu, logvar, nsamples=1, random=True):
        std = jnp.exp(0.5 * logvar)
        samples = eps_j * std[:, None] + mu[:, None]
        return samples, eps_j

    orig = vm.reparameterize
    vm.reparameterize = pinned_reparameterize
    try:
        def loss_fn(p):
            outs = model.apply(
                {"params": p, "batch_stats": batch_stats},
                jnp.asarray(texts), jnp.asarray(mels), jnp.asarray(m_lens),
                jnp.asarray(t_lens), reduction_factor=r, train=False,
                reduce_loss=True, rngs={"sample": jax.random.key(0)})
            _dec, mel_l2, kl, len_l2, _ali = outs
            loss = mel_l2 + kl_weight * jnp.maximum(kl, 0.0) + 1.0 * len_l2
            return loss, (mel_l2, kl, len_l2)

        (loss, (mel_l2, kl, len_l2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
    finally:
        vm.reparameterize = orig

    def group_norm(tree):
        return float(sum(
            float(jnp.sum(jnp.square(g)))
            for g in jax.tree_util.tree_leaves(tree))) ** 0.5

    norms = {name: group_norm(grads[name]) for name in
             ("text_encoder", "decoder", "posterior", "prior",
              "length_predictor")}
    total = group_norm(grads)
    return {"loss": float(loss), "mel_l2": float(mel_l2), "kl": float(kl),
            "len_l2": float(len_l2), "grad_norms": norms,
            "grad_global_norm": total}


def run_ours(ckpt_prefix, texts, t_lens, m_lens, mels, r,
             compute_dtype="float32", preset="ljspeech"):
    import dataclasses

    import jax
    # the axon TPU plugin initializes from startup env (a .pth hook), so
    # in-process env vars cannot force CPU — only this config call can.
    # CPU = deterministic fp32 matmuls; on the TPU the default bf16 matmul
    # precision would add ~2e-2 noise to every stage.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vaenar_tts_tpu.configs import get_config
    from vaenar_tts_tpu.interop import load_reference_checkpoint
    from vaenar_tts_tpu.models import VAENAR

    # the reference oracle computes in fp32; the flagship preset's bf16
    # compute dtype would dominate the comparison with rounding noise
    hp = get_config(preset)
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
    return out, hp, params, batch_stats


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


SENTENCES = {
    "ljspeech": [
        "Printing, in the only sense with which we are at present concerned.",
        "The quick brown fox jumps over the lazy dog.",
        "In being comparatively modern.",
        "Scientists at the CERN laboratory say they have discovered a new particle.",
    ],
    # pinyin with tone digits + prosody separators, the DataBaker frontend's
    # output alphabet (reference datasets.py:265-341, vocab hparams.py:378-382)
    "databaker": [
        "ka3 er3 pu3 pei2- wai4 sun1, wan2 hua2 ti1.",
        "ni2 hao3 shi4 jie4.",
        "zhe4 shi4 yi2 ge4- ce4 shi4 ju4 zi5.",
        "bao2 ma3 pei4 gua4 bo3 luo2 an1.",
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--preset", default="ljspeech",
                    choices=("ljspeech", "databaker"))
    ap.add_argument("--out", default=None,
                    help="write a PARITY_MEASURED.md section to this path")
    ap.add_argument("--skip_grads", action="store_true")
    ap.add_argument("--skip_export", action="store_true")
    args = ap.parse_args()

    from vaenar_tts_tpu.configs import get_config
    hp = get_config(args.preset)
    texts, t_lens = tokenize_sentences(hp, SENTENCES[args.preset],
                                       english=args.preset == "ljspeech")
    rng = np.random.default_rng(0)
    m_lens = np.array([96, 64, 40, 120], np.int32)
    r = hp.common.final_reduction_factor
    mels = (rng.standard_normal((4, 120, 80)) * 0.3 + 0.4).astype(np.float32)

    lines = [f"preset: {args.preset}"]

    with tempfile.TemporaryDirectory() as td:
        prefix = os.path.join(td, "ref-oracle")
        print(f"running reference oracle (TF, {args.preset})...")
        ref, ref_model = run_reference(args.reference, texts, t_lens, m_lens,
                                       mels, r, prefix, preset=args.preset)
        print("running our model with imported weights (JAX)...")
        ours, our_hp, params, batch_stats = run_ours(
            prefix, texts, t_lens, m_lens, mels, r, preset=args.preset)

        rows = compare(ref, ours, m_lens, t_lens, r)
        header = f"{'stage':26s} {'max|diff|':>12s} {'L1':>12s} {'rel-L1':>12s}"
        print(header)
        lines.append(header)
        for key, mx, l1, rel in rows:
            line = f"{key:26s} {mx:>12s} {l1:>12s} {rel:>12s}"
            print(line)
            lines.append(line)

        if not args.skip_export:
            # EXPORT direction: our params -> TensorBundle -> the reference's
            # own Checkpoint.restore -> recompute synthesis stages
            from vaenar_tts_tpu.interop import export_reference_checkpoint
            export_prefix = os.path.join(td, "our-export")
            export_reference_checkpoint(export_prefix, our_hp, params,
                                        batch_stats)
            print("reference restoring OUR export and recomputing (TF)...")
            re_out = reference_restore_and_recompute(
                ref_model, export_prefix, texts, t_lens, m_lens, r)
            lines.append("export direction (ref restores our TensorBundle):")
            for key, a in re_out.items():
                d = float(np.abs(a - ref[key]).max())
                line = (f"  export/{key:20s} max|diff| vs ref-original "
                        f"{d:.3e}")
                print(line)
                lines.append(line)

        if not args.skip_grads:
            print("gradient oracle (tf.GradientTape vs jax.grad)...")
            latent = our_hp.common.latent_dim
            eps_np = np.random.default_rng(7).standard_normal(
                (4, 1, (120 + r - 1) // r, latent)).astype(np.float32)
            g_ref = reference_grads(ref_model, texts, t_lens, m_lens, mels,
                                    r, eps_np)
            g_ours = ours_grads(our_hp, params, batch_stats, texts, t_lens,
                                m_lens, mels, r, eps_np)
            lines.append("train-step oracle (pinned eps, dev-mode forward):")
            for k in ("loss", "mel_l2", "kl", "len_l2", "grad_global_norm"):
                a, b = g_ref[k], g_ours[k]
                rel = abs(a - b) / (abs(a) + 1e-12)
                line = (f"  {k:18s} ref {a:+.6e}  ours {b:+.6e}  "
                        f"rel {rel:.3e}")
                print(line)
                lines.append(line)
            for mod in sorted(g_ref["grad_norms"]):
                a = g_ref["grad_norms"][mod]
                b = g_ours["grad_norms"][mod]
                rel = abs(a - b) / (abs(a) + 1e-12)
                line = (f"  grad|{mod:16s}| ref {a:.6e}  ours {b:.6e}  "
                        f"rel {rel:.3e}")
                print(line)
                lines.append(line)

    if args.out:
        with open(args.out, "a") as f:
            f.write("\n```\n" + "\n".join(lines) + "\n```\n")


if __name__ == "__main__":
    main()

"""Alignment-learning proof: train the full model on the procedural toy
corpus (data/toy.py) and ASSERT that cross-attention learns a monotonic
text<->time alignment (measured at every cross-attention site: decoder,
posterior, flow couplings) and synthesis quality improves materially.

This is the no-real-corpus substitute for the reference's LJSpeech training
evidence (reference train.py:182-204): the corpus has genuine text->audio
structure (each letter is a distinct deterministic acoustic segment), so a
model that learns it must have discovered the text<->time correspondence
through cross-attention.

Usage (real chip; ~20-60 min dominated by tunnel compiles):

    python scripts/alignment_proof.py [--workdir /tmp/vaenar_toy]
        [--epochs 300] [--fresh]

Writes <workdir>/alignment_proof.json and ALIGNMENT.md at the repo root.
Exits nonzero if diagonality or MCD-improvement thresholds are missed.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()

import jax.numpy as jnp
import numpy as np

DIAGONALITY_THRESHOLD = 0.80
MCD_IMPROVEMENT_DB = 2.0  # trained must beat untrained by at least this


def build_config(stats: dict, epochs: int, tiny: bool = False,
                 latent_dim: int = 16, kl_weight: float = 1e-3):
    """LJ architecture except: a SMALL latent and a real KL weight.

    With the full 128-dim latent the posterior can stuff the (spectrally
    simple) toy mels into z wholesale and the decoder reconstructs without
    ever consulting the text - synthesis gets accurate (MCD ~6 dB) while
    cross-attention stays diffuse (measured in round 2). Shrinking z and
    charging for it (KL weight 1e-3 instead of the reference's 1e-5) forces
    the content to flow text->attention->decoder, which is exactly the
    mechanism this proof must exercise (reference models/models.py:105-197).
    """
    from vaenar_tts_tpu.configs import get_config

    if tiny:  # CPU plumbing check: tiny architecture, same script flow
        from vaenar_tts_tpu.configs.hparams import tiny_test_config
        hp = tiny_test_config(vocab_size=43)
    else:
        hp = get_config("ljspeech")
    # one static shape: every batch pads to (text 32, mel <= one bucket) so the
    # tunnel pays ~10 compiles total instead of shapes x stages
    mel_bucket = ((stats["max_mel_len"] + 119) // 120) * 120
    stage = max(epochs // 5, 1)
    common = dataclasses.replace(
        hp.common, mel_text_len_ratio=round(stats["mel_text_len_ratio"], 2))
    if not tiny:
        common = dataclasses.replace(common, latent_dim=latent_dim)
    hp = hp.replace(
        common=common,
        dataset=dataclasses.replace(hp.dataset, mel_bucket=mel_bucket,
                                    text_bucket=32),
        train=dataclasses.replace(
            hp.train, epochs=epochs, test_interval=max(epochs // 4, 1),
            reduce_interval=(0, stage, 2 * stage, 3 * stage),
            kl_weight_init=kl_weight, kl_weight_end=kl_weight,
            checkpoint_every_n_epochs=50),
    )
    return hp


def evaluate(hp, model, params, batch_stats, test_loader, r, seed=0):
    """Synthesize the test batch; return diagonality + quality metrics.

    Diagonality is measured at EVERY cross-attention site (decoder blocks,
    posterior blocks, flow-coupling transforms; ``make_alignment_probe``):
    VAENAR learns the text<->time alignment implicitly wherever text is
    attended (reference models/models.py:105-197), and with a strong latent
    the burden can fall on p(z|text)'s couplings / q(z|mel,text) rather than
    the decoder — the proof asserts the alignment exists SOMEWHERE in the
    stack, and reports where.
    """
    from vaenar_tts_tpu.training.steps import make_alignment_probe
    from vaenar_tts_tpu.utils.metrics import batch_diagonality, batch_summary

    probe = make_alignment_probe(hp, model)
    batch = next(iter(test_loader.epoch(0)))
    mels, sites = probe(
        params, batch_stats, jnp.asarray(batch.texts),
        jnp.asarray(batch.mels), jnp.asarray(batch.text_lengths),
        jnp.asarray(batch.mel_lengths), jax.random.key(seed),
        reduction_factor=r, max_mel_length=batch.mels.shape[1])
    mels = np.asarray(mels, np.float32)
    pairs = [(mels[i][: int(batch.mel_lengths[i])],
              batch.mels[i][: int(batch.mel_lengths[i])])
             for i in range(batch.n_valid)]
    quality = batch_summary(pairs)

    reduced_lens = [(int(m) + r - 1) // r for m in batch.mel_lengths]
    diag = {}
    for k, a in sites.items():
        diag[k] = batch_diagonality(np.asarray(a, np.float32), reduced_lens,
                                    batch.text_lengths, batch.n_valid)
    best = max((d["diagonality"] for d in diag.values()), default=-1.0)
    best_site = max(diag, key=lambda k: diag[k]["diagonality"], default=None)
    dec_best = max((d["diagonality"] for k, d in diag.items()
                    if "decoder" in k), default=-1.0)
    return {"mcd_db": quality["mcd_db"], "mel_l1": quality["mel_l1"],
            "diagonality_best_block": best, "best_site": best_site,
            "diagonality_decoder_best": dec_best, "per_block": diag}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/vaenar_toy")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--fresh", action="store_true",
                    help="wipe workdir (corpus + checkpoints) first")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny architecture + corpus (CPU plumbing check; "
                         "does not assert thresholds)")
    ap.add_argument("--latent_dim", type=int, default=16)
    ap.add_argument("--kl_weight", type=float, default=1e-3)
    ap.add_argument("--eval_only", action="store_true",
                    help="skip training; re-evaluate the latest checkpoint "
                         "in --workdir/ckpt (e.g. after extending the "
                         "alignment probe)")
    args = ap.parse_args()

    from vaenar_tts_tpu.data.loader import BucketedLoader
    from vaenar_tts_tpu.data.records import list_shards
    from vaenar_tts_tpu.data.toy import generate_corpus
    from vaenar_tts_tpu.models import VAENAR
    from vaenar_tts_tpu.training.loop import train
    from vaenar_tts_tpu.training.steps import init_model

    if args.fresh and os.path.isdir(args.workdir):
        import shutil
        shutil.rmtree(args.workdir)
    data_dir = os.path.join(args.workdir, "records")
    stats_path = os.path.join(args.workdir, "corpus_stats.json")
    if not os.path.exists(stats_path):
        print("generating toy corpus ...")
        from vaenar_tts_tpu.configs import get_config
        counts = (dict(n_train=24, n_dev=4, n_test=4, train_split=2)
                  if args.tiny else {})
        stats = generate_corpus(data_dir, get_config("ljspeech"), **counts)
        with open(stats_path, "w") as f:
            json.dump(stats, f)
    with open(stats_path) as f:
        stats = json.load(f)
    print("corpus stats:", stats)

    hp = build_config(stats, args.epochs, tiny=args.tiny,
                      latent_dim=args.latent_dim, kl_weight=args.kl_weight)
    model = VAENAR(hp)
    final_r = hp.train.reduction_factor_at(args.epochs - 1)

    test_loader = BucketedLoader(
        list_shards(data_dir, "test"), hp.train.test_batch_size,
        mel_bucket=hp.dataset.mel_bucket, text_bucket=hp.dataset.text_bucket,
        shuffle=False, seed=0)

    # untrained baseline (fresh init, same architecture)
    params0, bs0 = init_model(hp, model, hp.train.random_seed,
                              hp.dataset.text_bucket, hp.dataset.mel_bucket)
    before = evaluate(hp, model, params0, bs0, test_loader, final_r)
    print(f"untrained: mcd {before['mcd_db']:.2f} dB, "
          f"diagonality {before['diagonality_best_block']:.3f}")

    if args.eval_only:
        from vaenar_tts_tpu.training.steps import make_optimizer
        from vaenar_tts_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(os.path.join(args.workdir, "ckpt"))
        full = {"params": params0, "batch_stats": bs0, "epoch": 0,
                "opt_state": make_optimizer(hp).init(params0)}
        restored = mgr.restore(full)
        mgr.close()
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {args.workdir}/ckpt")
        print(f"eval-only: restored epoch {int(restored['epoch'])}")
        trained_params = restored["params"]
        trained_bs = restored["batch_stats"]
        prev = os.path.join(args.workdir, "alignment_proof.json")
        train_secs = (json.load(open(prev)).get("train_seconds", 0.0)
                      if os.path.exists(prev) else 0.0)
    else:
        t0 = time.time()
        state = train(hp, data_dir, os.path.join(args.workdir, "ckpt"),
                      os.path.join(args.workdir, "logs"), log_every=100)
        train_secs = time.time() - t0
        trained_params, trained_bs = state.params, state.batch_stats

    after = evaluate(hp, model, trained_params, trained_bs, test_loader,
                     final_r)
    print(f"trained:   mcd {after['mcd_db']:.2f} dB, "
          f"diagonality {after['diagonality_best_block']:.3f}")

    result = {
        "epochs": args.epochs,
        "latent_dim": args.latent_dim,
        "kl_weight": args.kl_weight,
        "train_seconds": round(train_secs, 1),
        "device": jax.devices()[0].device_kind,
        "untrained": {k: v for k, v in before.items() if k != "per_block"},
        "trained": {k: v for k, v in after.items() if k != "per_block"},
        "trained_per_block": after["per_block"],
        "thresholds": {"diagonality": DIAGONALITY_THRESHOLD,
                       "mcd_improvement_db": MCD_IMPROVEMENT_DB},
    }
    ok_diag = after["diagonality_best_block"] >= DIAGONALITY_THRESHOLD
    ok_mcd = (before["mcd_db"] - after["mcd_db"]) >= MCD_IMPROVEMENT_DB
    result["pass"] = bool(ok_diag and ok_mcd)
    out = os.path.join(args.workdir, "alignment_proof.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print(f"wrote {out}; pass={result['pass']} "
          f"(diagonality ok={ok_diag}, mcd ok={ok_mcd})")
    if args.tiny:  # plumbing check only: tiny model is not expected to align
        return 0
    write_alignment_md(result)
    return 0 if result["pass"] else 1


def write_alignment_md(r: dict) -> None:
    """Commit-ready evidence doc at the repo root."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ALIGNMENT.md")
    u, t = r["untrained"], r["trained"]
    blocks = "\n".join(
        f"| {k} | {v['diagonality']:.3f} | {v['focus']:.3f} |"
        for k, v in r["trained_per_block"].items())
    with open(path, "w") as f:
        f.write(f"""# ALIGNMENT — measured attention-learning evidence

`scripts/alignment_proof.py` trains the full LJ-architecture model (latent
{r['latent_dim']}, kl_weight {r['kl_weight']}; see the script docstring for
why the latent is shrunk for this proof) on the procedural toy corpus
(`data/toy.py`: every letter is a distinct deterministic acoustic segment)
and ASSERTS that cross-attention learns a monotonic text<->time alignment
and synthesis quality improves — the quantitative version of the diagonal
alignment plots the reference eyeballs during LJSpeech training (reference
train.py:309-325).

Diagonality is measured at EVERY cross-attention site: VAENAR learns
alignment implicitly wherever text is attended (decoder p(mel|z,text),
posterior q(z|mel,text), and the flow prior p(z|text)'s coupling
transforms). The division of labor between those sites is free for the
optimizer to choose; the assertion is that a strong monotonic alignment
exists somewhere in the stack, and the per-site table reports where it
settled.

Run: {r['epochs']} epochs on {r['device']} ({r['train_seconds']:.0f} s train
wall time), full reduction-factor curriculum.

| Metric | untrained | trained |
|---|---|---|
| MCD (dB, vs ground-truth mels, prior-sample synthesis) | {u['mcd_db']:.2f} | **{t['mcd_db']:.2f}** |
| mel L1 | {u['mel_l1']:.3f} | **{t['mel_l1']:.3f}** |
| best-site diagonality (Pearson of attention-expected text position vs frame) | {u['diagonality_best_block']:.3f} | **{t['diagonality_best_block']:.3f}** |

Best trained site: `{t.get('best_site')}`; best decoder-block diagonality
{t.get('diagonality_decoder_best', -1):.3f}.

Per cross-attention site (trained):

| site | diagonality | focus (mean max weight/frame) |
|---|---|---|
{blocks}

Thresholds asserted: best-site diagonality >=
{r['thresholds']['diagonality']}, MCD improvement >=
{r['thresholds']['mcd_improvement_db']} dB.
**PASS = {r['pass']}.** Raw JSON: the run's workdir `alignment_proof.json`.
""")
    print(f"wrote {path}")


if __name__ == "__main__":
    sys.exit(main())

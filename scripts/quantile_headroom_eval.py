"""Measure the length-predictor quantile head's headroom on toy-v2.

The reference's length predictor regresses the conditional MEAN log-length
(reference modules/length_predictor.py:30-42 + models.py:96-103). On any
corpus whose durations are genuinely stochastic given the text — toy-v2
draws a per-utterance tempo from U(0.7, 1.4) plus per-letter jitter
(data/toy.py::ToySpecV2), like real speech — a calibrated mean head
UNDER-predicts roughly half of all utterances, and every under-prediction
is a truncation risk at synthesis time (ALIGNMENT.md free-text residuals).
The p-quantile head (PARITY.md deviation 14) is the fix: trained with a
pinball loss at p (default 0.9), it should under-predict only ~(1-p) of
held-out utterances while costing only proportional extra frames.

This script trains the tiny architecture on a freshly generated toy-v2
corpus (CPU, minutes) with the quantile head enabled, then scores BOTH
heads on the held-out dev split:

  * under-rate  — fraction of utterances with predicted < true length
                  (the truncation-risk rate; mean head ~0.5, p90 head
                  should land near 0.1)
  * rel-err     — mean |predicted - true| / true (calibration)
  * headroom    — median q_pred / mean_pred (the learned safety margin)

Writes <workdir>/quantile_headroom.json and exits nonzero if the gates
miss (q head must cut the truncation-risk rate by at least half and its
under-rate must land at or under (1-p) + 0.1 slack).

Usage (CPU, ~3-6 min):

    JAX_PLATFORM_NAME=cpu python scripts/quantile_headroom_eval.py \
        [--workdir /tmp/vaenar_qhead] [--epochs 40] [--quantile 0.9]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def build_config(stats: dict, epochs: int, quantile: float):
    """Tiny architecture (length calibration does not need model capacity),
    corpus-matched len ratio/buckets, quantile head enabled."""
    from vaenar_tts_tpu.configs.hparams import tiny_test_config

    hp = tiny_test_config(vocab_size=43)
    mel_bucket = ((stats["max_mel_len"] + 119) // 120) * 120
    stage = max(epochs // 5, 1)
    return hp.replace(
        common=dataclasses.replace(
            hp.common,
            mel_text_len_ratio=round(stats["mel_text_len_ratio"], 2)),
        dataset=dataclasses.replace(hp.dataset, mel_bucket=mel_bucket,
                                    text_bucket=32),
        train=dataclasses.replace(
            hp.train, epochs=epochs, train_batch_size=16, test_batch_size=16,
            test_interval=10 ** 9,  # no wav artifacts; this is a length probe
            reduce_interval=(0, stage, 2 * stage, 3 * stage),
            checkpoint_every_n_epochs=max(epochs // 2, 1)),
        length_predictor=dataclasses.replace(hp.length_predictor,
                                             quantile=quantile),
    )


def measure_heads(hp, model, params, batch_stats, loader):
    """Run predict_lengths over every dev batch; return per-utterance
    (true, mean_pred, q_pred) arrays."""
    from functools import partial

    from vaenar_tts_tpu.models.vaenar import VAENAR

    r = hp.common.final_reduction_factor

    @partial(jax.jit, static_argnames=("reduction_factor",))
    def heads(params, batch_stats, texts, t_lens, reduction_factor):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            texts, t_lens, reduction_factor=reduction_factor,
            method=VAENAR.predict_lengths)

    true, mean_pred, q_pred = [], [], []
    for batch in loader.epoch(0):
        m, q = heads(params, batch_stats, jnp.asarray(batch.texts),
                     jnp.asarray(batch.text_lengths), reduction_factor=r)
        n = batch.n_valid
        true.append(np.asarray(batch.mel_lengths[:n], np.float64))
        mean_pred.append(np.asarray(m, np.float64)[:n])
        q_pred.append(np.asarray(q, np.float64)[:n])
    return (np.concatenate(true), np.concatenate(mean_pred),
            np.concatenate(q_pred))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/vaenar_qhead")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--quantile", type=float, default=0.9)
    ap.add_argument("--n_train", type=int, default=192)
    ap.add_argument("--n_dev", type=int, default=96)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if not (0.0 < args.quantile < 1.0):
        ap.error(f"--quantile must be in (0, 1), got {args.quantile} "
                 "(the pinball loss is degenerate at the endpoints)")

    from vaenar_tts_tpu.configs.hparams import tiny_test_config
    from vaenar_tts_tpu.data.loader import BucketedLoader
    from vaenar_tts_tpu.data.records import list_shards
    from vaenar_tts_tpu.data.toy import generate_corpus
    from vaenar_tts_tpu.training.loop import train

    data_dir = os.path.join(args.workdir, "records")
    stats_path = os.path.join(args.workdir, "corpus_stats.json")
    # the cache is keyed on the generation parameters and only valid while
    # the records it describes still exist — a stale or orphaned stats file
    # silently trained on the wrong corpus before (ADVICE r3)
    cache_key = {"n_train": args.n_train, "n_dev": args.n_dev,
                 "seed": args.seed, "version": 2}
    stats = None
    if os.path.exists(stats_path) and os.path.isdir(data_dir):
        cached = json.load(open(stats_path))
        if cached.get("cache_key") == cache_key:
            stats = cached
    if stats is None:
        stats = generate_corpus(data_dir, tiny_test_config(vocab_size=43),
                                n_train=args.n_train, n_dev=args.n_dev,
                                n_test=16, seed=args.seed, version=2)
        stats["cache_key"] = cache_key
        os.makedirs(args.workdir, exist_ok=True)
        json.dump(stats, open(stats_path, "w"))
    hp = build_config(stats, args.epochs, args.quantile)

    state = train(hp, data_dir, os.path.join(args.workdir, "ckpt"),
                  os.path.join(args.workdir, "logs"),
                  test_dir=os.path.join(args.workdir, "test"),
                  max_epochs=args.epochs)

    from vaenar_tts_tpu.models.vaenar import VAENAR
    model = VAENAR(hp)
    dev_loader = BucketedLoader(list_shards(data_dir, "dev"), 16,
                                mel_bucket=hp.dataset.mel_bucket,
                                text_bucket=hp.dataset.text_bucket,
                                shuffle=False, seed=0)
    true, mean_pred, q_pred = measure_heads(
        hp, model, state.params, state.batch_stats, dev_loader)

    def under(pred):
        return float(np.mean(pred < true))

    def rel_err(pred):
        return float(np.mean(np.abs(pred - true) / true))

    result = {
        "quantile": args.quantile,
        "epochs": args.epochs,
        "n_dev_utterances": int(true.size),
        "mean_head": {"under_rate": under(mean_pred),
                      "rel_err": rel_err(mean_pred)},
        "quantile_head": {"under_rate": under(q_pred),
                          "rel_err": rel_err(q_pred)},
        "median_headroom_ratio": float(np.median(q_pred / mean_pred)),
    }
    # gates: the q head must cut the truncation-risk rate at least in half
    # and land near its nominal coverage ((1-p) + slack for the small dev set)
    gates = {
        "q_under_rate_le_nominal": (result["quantile_head"]["under_rate"]
                                    <= (1.0 - args.quantile) + 0.10),
        "q_halves_truncation_risk": (result["quantile_head"]["under_rate"]
                                     <= 0.5 * max(result["mean_head"]
                                                  ["under_rate"], 1e-9)),
        "headroom_is_real": result["median_headroom_ratio"] > 1.03,
    }
    result["gates"] = gates
    out = os.path.join(args.workdir, "quantile_headroom.json")
    json.dump(result, open(out, "w"), indent=2)
    print(json.dumps(result, indent=2))
    ok = all(gates.values())
    print("PASS" if ok else "FAIL", "->", out)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Sweep free-text transcription LER across a training run's checkpoints.

Round-4 finding (ALIGNMENT.md "Checkpoint selection"): alignment-proof
gates (diagonality / MCD-DTW) pick epoch 1200 of the re-trained toy-v2 run,
but the free-text product metric there is LER 0.40 vs the round-3 run's
0.15 — alignment formation in VAENAR-style models is run- and
epoch-sensitive (the reference ships ONE hand-picked checkpoint,
/root/reference/README.md:4; it never had to defend a selection rule).
This script makes the selection rule the product metric itself: it loads
EVERY persisted checkpoint into one jitted inference step (identical
shapes -> zero recompiles after the first) and scores letters-only LER on
the same held-out texts as scripts/freetext_toyv2_eval.py.

Cost: one tunnel compile (~2-5 min) + one device pass per (epoch, seed) —
the whole 20-checkpoint sweep is ~15 min where per-epoch CLI subprocess
runs would pay the compile 20 times.

Usage (chip):
    python scripts/freetext_epoch_sweep.py --workdir artifacts/toyv2_q90 \
        [--ckpt_dirs ckpt ckpt_post1200] [--n 16] [--sample_seeds 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="artifacts/toyv2_q90")
    ap.add_argument("--ckpt_dirs", nargs="+", default=["ckpt", "ckpt_post1200"],
                    help="checkpoint dirs under --workdir, searched in order")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--seed", type=int, default=4242,
                    help="held-out text seed (matches freetext_toyv2_eval)")
    ap.add_argument("--sample_seeds", type=int, default=1,
                    help="prior-sample seeds per epoch; LER is averaged "
                         "(stochastic synthesis -> less selection noise)")
    ap.add_argument("--temperature", type=float, default=0.6)
    ap.add_argument("--min_epoch", type=int, default=1)
    ap.add_argument("--out", default=None,
                    help="result json (default <workdir>/freetext_sweep.json)")
    args = ap.parse_args()

    from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()
    import jax
    import jax.numpy as jnp

    from vaenar_tts_tpu.configs.serialize import load_hparams
    from vaenar_tts_tpu.configs import get_config
    from vaenar_tts_tpu.data.corpus import CORPORA
    from vaenar_tts_tpu.data.loader import pad_to_multiple
    from vaenar_tts_tpu.data.toy import ToyLetterDecoder, letter_error_rate, \
        random_text
    from vaenar_tts_tpu.models.vaenar import VAENAR
    from vaenar_tts_tpu.training.steps import (init_model, make_inference_step,
                                               make_optimizer)
    from vaenar_tts_tpu.utils.checkpoint import CheckpointManager

    ckpt0 = os.path.join(args.workdir, args.ckpt_dirs[0])
    hp = load_hparams(ckpt0) or get_config("ljspeech")
    model = VAENAR(hp)
    inf_step = make_inference_step(hp, model)
    r = hp.common.final_reduction_factor
    dec = ToyLetterDecoder(hp)
    corpus = CORPORA["ljspeech"](None, None, hp)

    rng = np.random.default_rng(args.seed)
    texts = [random_text(rng) for _ in range(args.n)]
    seqs = [corpus.text_to_array(t) for t in texts]
    text_lens = np.asarray([len(s) for s in seqs], np.int32)
    text_max = pad_to_multiple(int(text_lens.max()), hp.dataset.text_bucket)
    batch = np.zeros((len(texts), text_max), np.int32)
    for i, s in enumerate(seqs):
        batch[i, :len(s)] = s
    batch = jnp.asarray(batch)
    tl = jnp.asarray(text_lens)
    max_mel = pad_to_multiple(
        int(text_max * hp.common.mel_text_len_ratio * 2) + 160,
        hp.dataset.mel_bucket)

    # one abstract state reused for every restore
    params0, bs0 = init_model(hp, model, hp.train.random_seed,
                              text_max=hp.dataset.text_bucket,
                              mel_max=hp.dataset.mel_bucket)
    full = {"params": params0, "batch_stats": bs0, "epoch": 0,
            "opt_state": make_optimizer(hp).init(params0)}

    def ler_of(params, bs, sseed: int) -> float:
        mels, lens, _ = inf_step(
            params, bs, batch, tl, jax.random.key(sseed),
            reduction_factor=r, max_mel_length=max_mel,
            temperature=args.temperature, length_headroom=0,
            use_length_quantile=False)
        mels = np.asarray(mels, np.float32)
        lens = np.asarray(lens)
        vals = []
        for b, text in enumerate(texts):
            hyp = dec.decode(mels[b, :max(int(lens[b]), 1)])
            vals.append(letter_error_rate(hyp.replace(" ", ""),
                                          text.replace(" ", "")))
        return float(np.mean(vals))

    # enumerate epochs across the dirs (a resumed run keeps its continuation
    # checkpoints in a second dir)
    found = []  # (epoch, mgr_index)
    mgrs = []
    for d in args.ckpt_dirs:
        path = os.path.join(args.workdir, d)
        if not os.path.isdir(path):
            continue
        mgrs.append(CheckpointManager(path))
        for name in sorted(os.listdir(path)):
            if name.isdigit() and int(name) >= args.min_epoch:
                found.append((int(name), len(mgrs) - 1))
    found.sort()
    if not found:
        print("no checkpoints found", file=sys.stderr)
        return 2
    print(f"sweeping {len(found)} checkpoints x {args.sample_seeds} seeds "
          f"over {len(texts)} texts", flush=True)

    rows = []
    for ep, mi in found:
        restored = mgrs[mi].restore(full, epoch=ep)
        lers = [ler_of(restored["params"], restored["batch_stats"], s)
                for s in range(args.sample_seeds)]
        row = {"epoch": ep, "mean_ler": round(float(np.mean(lers)), 3),
               "per_seed": [round(x, 3) for x in lers]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    for m in mgrs:
        m.close()

    best = min(rows, key=lambda rw: rw["mean_ler"])
    result = {"n_texts": len(texts), "sample_seeds": args.sample_seeds,
              "temperature": args.temperature, "best": best, "rows": rows}
    out = args.out or os.path.join(args.workdir, "freetext_sweep.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"best_epoch": best["epoch"],
                      "best_mean_ler": best["mean_ler"]}))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

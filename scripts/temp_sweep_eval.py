"""Temperature sweep over a trained alignment-proof checkpoint.

The reference exposes prior-sampling temperature as a first-class inference
knob (reference inference.py:24 `--temperature`, models/prior.py sample) and
defaults it to 0.0 — the flow applied to ZERO noise. A zero-noise latent is
the single most likely point of the base distribution but is atypical of the
prior's samples (it has none of the per-frame variance the decoder sees from
posterior samples during training). This script measures how the
inference-path decoder alignment and prior-sample quality move with
temperature on an already-trained proof checkpoint, without retraining.

Usage:
    python scripts/temp_sweep_eval.py --workdir /tmp/vaenar_toy_v2 \
        [--temps 0,0.33,0.6,0.8,1.0] [--seeds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vaenar_tts_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache()

import numpy as np

from alignment_proof import build_config, evaluate


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/vaenar_toy_v2")
    ap.add_argument("--epochs", type=int, default=1200,
                    help="epochs the checkpoint was trained for (config key)")
    ap.add_argument("--temps", default="0,0.33,0.6,0.8,1.0")
    ap.add_argument("--seeds", type=int, default=2,
                    help="prior-sample RNG seeds per temperature (>0 temps "
                         "are stochastic; report mean)")
    ap.add_argument("--ckpt_epochs", default=None,
                    help="comma list of checkpoint epochs to sweep (training "
                         "trajectory); default = latest only")
    args = ap.parse_args()

    from vaenar_tts_tpu.data.loader import BucketedLoader
    from vaenar_tts_tpu.data.records import list_shards
    from vaenar_tts_tpu.models import VAENAR
    from vaenar_tts_tpu.training.steps import init_model, make_optimizer
    from vaenar_tts_tpu.utils.checkpoint import CheckpointManager

    with open(os.path.join(args.workdir, "corpus_stats.json")) as f:
        stats = json.load(f)
    hp = build_config(stats, args.epochs)
    model = VAENAR(hp)
    final_r = hp.train.reduction_factor_at(args.epochs - 1)
    data_dir = os.path.join(args.workdir, "records")
    test_loader = BucketedLoader(
        list_shards(data_dir, "test"), hp.train.test_batch_size,
        mel_bucket=hp.dataset.mel_bucket, text_bucket=hp.dataset.text_bucket,
        shuffle=False, seed=0)

    params0, bs0 = init_model(hp, model, hp.train.random_seed,
                              hp.dataset.text_bucket, hp.dataset.mel_bucket)
    mgr = CheckpointManager(os.path.join(args.workdir, "ckpt"))
    full = {"params": params0, "batch_stats": bs0, "epoch": 0,
            "opt_state": make_optimizer(hp).init(params0)}
    epochs = ([int(e) for e in args.ckpt_epochs.split(",")]
              if args.ckpt_epochs else [None])
    rows = []
    for ep in epochs:
        restored = mgr.restore(full, epoch=ep)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {args.workdir}/ckpt")
        print(f"restored epoch {int(restored['epoch'])}", flush=True)
        params, bs = restored["params"], restored["batch_stats"]
        for temp in [float(t) for t in args.temps.split(",")]:
            seeds = range(args.seeds) if temp > 0 else [0]
            evs = [evaluate(hp, model, params, bs, test_loader, final_r,
                            seed=s, temperature=temp) for s in seeds]
            row = {
                "ckpt_epoch": int(restored["epoch"]),
                "temperature": temp,
                "prior_mcd_dtw_db": float(np.mean(
                    [e["prior_mcd_dtw_db"] for e in evs])),
                "prior_mcd_db": float(np.mean(
                    [e["prior_mcd_db"] for e in evs])),
                "infer_decoder_diag": float(np.mean(
                    [e["diagonality_infer_decoder"] for e in evs])),
                "posterior_mcd_dtw_db": float(np.mean(
                    [e["posterior_mcd_dtw_db"] for e in evs])),
                "post_decoder_diag": float(np.mean(
                    [e["diagonality_post_decoder"] for e in evs])),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    mgr.close()
    out = os.path.join(args.workdir, "temp_sweep.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

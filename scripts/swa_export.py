"""Average the top-k probed checkpoints into a synthetic export (SWA probe).

The checkpoint lottery (ALIGNMENT.md "Checkpoint selection") shows free-text
LER oscillating across late epochs of one run; the in-training probe
(training/probe.py) picks the argmin draw. This script tests the classic
follow-up: does averaging the weights of the k BEST probed epochs (stochastic
weight averaging over the probe's own ranking) beat the single best draw?
Oscillating alignment states may live in different basins — in which case
averaging destroys the alignment and the result is an honest null — but
neighboring good draws may share a basin and denoise each other.

Builds ``<workdir>/swa_top<k>/export.npz`` (+ hparams.json copy) from the
k lowest-probe-LER epochs still present in ``<workdir>/ckpt``; evaluate with

    python scripts/freetext_toyv2_eval.py --workdir <workdir> \
        --ckpt_dir <workdir>/swa_top<k> --out_name swa_top<k> --n 16

Host-side only (Orbax reads + numpy means); run on an idle host.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    from vaenar_tts_tpu.utils.logging import setup_compile_cache
    setup_compile_cache()

    import jax

    from vaenar_tts_tpu.cli.inference import load_model_state
    from vaenar_tts_tpu.configs import get_config
    from vaenar_tts_tpu.utils.export import save_npz

    ckpt_dir = os.path.join(args.workdir, "ckpt")
    probed = [json.loads(l)
              for l in open(os.path.join(args.workdir, "ler_probe.jsonl"))]
    persisted = {int(d) for d in os.listdir(ckpt_dir) if d.isdigit()}
    ranked = sorted((r for r in probed if r["epoch"] in persisted),
                    key=lambda r: r["probe_ler"])
    top = ranked[:args.k]
    assert len(top) >= 2, f"need >=2 persisted probed epochs, have {len(top)}"
    print("averaging epochs:",
          [(r["epoch"], r["probe_ler"]) for r in top])

    hp = get_config("ljspeech")
    states = []
    for r in top:
        _, _, params, batch_stats, _ = load_model_state(
            hp, ckpt_dir, epoch=r["epoch"])
        states.append({"params": params, "batch_stats": batch_stats})

    def mean_leaves(*leaves):
        return np.mean([np.asarray(l, np.float64) for l in leaves],
                       axis=0).astype(np.asarray(leaves[0]).dtype)

    avg = jax.tree_util.tree_map(mean_leaves, *states)
    out_dir = os.path.join(args.workdir, f"swa_top{args.k}")
    os.makedirs(out_dir, exist_ok=True)
    save_npz(os.path.join(out_dir, "export.npz"),
             {"params": avg["params"], "batch_stats": avg["batch_stats"],
              # synthetic marker epoch so eval artifacts sort after real ones
              "epoch": 9000 + args.k})
    shutil.copy(os.path.join(ckpt_dir, "hparams.json"), out_dir)
    side = {"epochs": [r["epoch"] for r in top],
            "probe_lers": [r["probe_ler"] for r in top]}
    with open(os.path.join(out_dir, "swa.json"), "w") as f:
        json.dump(side, f)
    print(f"wrote {out_dir}/export.npz", json.dumps(side))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/bin/bash
# Round-5 post-training eval battery (VERDICT r4 items 1, 3, 4, 6).
# Runs AFTER the chip_queue7 lottery completes, on an otherwise idle host
# (the 1-core host makes every concurrent process inflate chip timings).
#
# Order is gate-critical-first so a shortened run still lands the headline:
#   1. pick the lottery winner: min probe LER across artifacts/toyv2_s*/
#      export_best.json
#   2. gate eval battery on the winner (n=16, seed-4242 texts = the repo's
#      standing gate): takes-1 baseline, takes-4 coverage (round-4 knob),
#      takes-4 medoid, takes-8 medoid (VERDICT r4 item 3 A/B)
#   3. held-out-seed eval (seed 9191: texts the in-training probe never
#      selected on) with the best takes variant — the generalization check
#   4. quantile render + host-side truncation A/B (VERDICT r4 item 4)
#   5. XLA-flags train-step sweep (VERDICT r4 item 6)
#
# Usage: setsid nohup bash scripts/chip_evals_r5.sh >> artifacts/chipq7/evals.log 2>&1 &
set -u
cd /root/repo
QD=artifacts/chipq7
mkdir -p "$QD"

note() { echo "[evals_r5 $(date -u +%H:%M:%S)] $*"; }

read -r WD EPOCH BESTLER <<EOF
$(python - <<'PY'
import glob, json, os
best = None
for side in glob.glob("artifacts/toyv2_*/export_best.json"):
    d = json.load(open(side))
    if best is None or d["probe_ler"] < best[2]:
        best = (os.path.dirname(side), d["epoch"], d["probe_ler"])
assert best, "no export_best.json found"
print(best[0], best[1], best[2])
PY
)
EOF
note "lottery winner: $WD epoch $EPOCH (probe LER $BESTLER)"

# stage the winner as a standalone model dir: the best-probed epoch's Orbax
# step can be garbage-collected (max_to_keep=20) and cli.inference only
# falls back to an npz when NO epoch is pinned, so evaluate the durable
# export_best.npz directly instead of --ckpt_epoch
mkdir -p "$WD/best"
cp "$WD/export_best.npz" "$WD/best/export.npz"
cp "$WD/ckpt/hparams.json" "$WD/best/"

EV() { # EV <extra freetext_toyv2_eval args...>
  note "eval: $*"
  timeout 1800 python scripts/freetext_toyv2_eval.py \
    --workdir "$WD" --ckpt_dir "$WD/best" --n 16 "$@" \
    || note "eval FAILED (rc=$?): $*"
}

EV                                     # takes-1 mean baseline (gate texts)
EV --takes 4                           # round-4 headline knob (coverage)
EV --takes 4 --take_score medoid       # item 3: content-aware selection
EV --takes 8 --take_score medoid       # item 3: does the takes-8 regression vanish?
EV --takes 16 --take_score medoid      # selection power if medoid truly ranks
EV --takes 4 --take_score medoid --seed 9191 --out_name heldout9191_takes4_medoid
EV --length_source quantile            # renders for the truncation A/B

note "quantile truncation A/B (host-only)"
JAX_PLATFORM_NAME=cpu timeout 600 python scripts/quantile_truncation_ab.py \
  --workdir "$WD" --mean_variant freetext --quantile_variant takes1_quantile \
  || note "truncation A/B FAILED rc=$?"

note "XLA-flags train-step sweep"
bash scripts/perf_xla_flags_ab.sh "$QD/xla_flags_ab.log"

note "evals_r5 complete"

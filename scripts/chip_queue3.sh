#!/bin/bash
# Round-4 chip-work queue, part 3: (a) attribute the 29.5->34 ms bench
# train-step regression with the new --batched_lu A/B, then (b) the
# ROADMAP #1 checkpoint lottery — fresh-seed toy-v2 retrain with
# sweep-based selection and the free-text feature A/B at the selected
# epoch. Waits for part 2 (chip_queue2.sh) to print "queue2 complete"
# before touching the chip — ONE TPU job at a time (CLAUDE.md).
# Launch detached:
#   setsid nohup bash scripts/chip_queue3.sh >> artifacts/chipq3/queue.log 2>&1 &
set -u
cd /root/repo
QD=artifacts/chipq3
mkdir -p "$QD"
WD=artifacts/toyv2_s777
SEED=777
TARGET=1800

note() { echo "[chipq3 $(date -u +%H:%M:%S)] $*"; }

job() {  # job <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  note "START $name: $*"
  local t0=$SECONDS
  timeout "$tmo" "$@" > "$QD/$name.log" 2>&1
  local rc=$?
  echo "{\"job\": \"$name\", \"rc\": $rc, \"secs\": $((SECONDS-t0))}" >> "$QD/status.jsonl"
  note "DONE  $name rc=$rc ($((SECONDS-t0))s)"
  return $rc
}

# -- 0. wait for part 2 ---------------------------------------------------------
while ! grep -q "queue2 complete" artifacts/chipq2/queue.log 2>/dev/null; do
  sleep 60
done
note "part 2 complete; starting"

# -- 1. batched-LU A/B: name the bench train-step regression --------------------
job lu_on  1200 python scripts/perf_ab_train.py --modes auto --chain 4 16 \
  --batched_lu on || true
job lu_off 1200 python scripts/perf_ab_train.py --modes auto --chain 4 16 \
  --batched_lu off || true

# -- 2. fresh-seed retrain (ROADMAP #1: the q90 run's best epoch is LER 0.302;
#       the decoder floor is ~0.08 — retry the alignment lottery) --------------
note "START retrain seed=$SEED target=$TARGET (resume_train_until manages chunking)"
t0=$SECONDS
bash scripts/resume_train_until.sh "$WD" "$TARGET" 1200 0.9 "$SEED" \
  >> "$QD/retrain.log" 2>&1
note "DONE  retrain ($((SECONDS-t0))s); final epoch: $(ls "$WD/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)"

# -- 3. sweep every persisted epoch by the product metric -----------------------
job sweep 7200 python scripts/freetext_epoch_sweep.py --workdir "$WD" \
  --ckpt_dirs ckpt --n 16 --sample_seeds 2 || true

BEST=$(python - <<EOF
import json
try:
    r = json.load(open("$WD/freetext_sweep.json"))
    print(r["best"]["epoch"])
except Exception:
    print($TARGET - 1)
EOF
)
note "best sweep epoch: $BEST"

# -- 4. free-text feature variants at the selected epoch ------------------------
job ft_base 3600 python scripts/freetext_toyv2_eval.py --n 16 --workdir "$WD" \
  --ckpt_dir "$WD/ckpt" --ckpt_epoch "$BEST" || true
job ft_takes4 3600 python scripts/freetext_toyv2_eval.py --n 16 --workdir "$WD" \
  --ckpt_dir "$WD/ckpt" --ckpt_epoch "$BEST" --takes 4 || true
job ft_quantile 3600 python scripts/freetext_toyv2_eval.py --n 16 \
  --workdir "$WD" --ckpt_dir "$WD/ckpt" --ckpt_epoch "$BEST" \
  --length_source quantile || true
job ft_takes4_quantile 3600 python scripts/freetext_toyv2_eval.py --n 16 \
  --workdir "$WD" --ckpt_dir "$WD/ckpt" --ckpt_epoch "$BEST" --takes 4 \
  --length_source quantile || true

# -- 5. headline gates at the selected epoch ------------------------------------
job headline 2400 python scripts/alignment_proof.py --workdir "$WD" \
  --eval_only --ckpt_dir "$WD/ckpt" --eval_epoch "$BEST" --quantile 0.9 \
  --epochs "$TARGET" --stages_epochs 1200 || true

# -- 6. portable export of the selected epoch ------------------------------------
job export 1200 python scripts/export_checkpoint.py --model_dir "$WD/ckpt" \
  --epoch "$BEST" --out "$WD/export.npz" || true

note "queue3 complete"

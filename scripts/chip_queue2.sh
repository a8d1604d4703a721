#!/bin/bash
# Round-4 chip-work queue, part 2: checkpoint SELECTION by the product
# metric + the fixed train profile. Waits for part 1 (chip_queue.sh) to
# print "queue complete" before touching the chip — ONE TPU job at a time
# (CLAUDE.md). Launch detached:
#   setsid nohup bash scripts/chip_queue2.sh >> artifacts/chipq2/queue.log 2>&1 &
set -u
cd /root/repo
QD=artifacts/chipq2
mkdir -p "$QD"
WD=artifacts/toyv2_q90

note() { echo "[chipq2 $(date -u +%H:%M:%S)] $*"; }

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

# -- 0. wait for part 1 ---------------------------------------------------------
while ! grep -q "queue complete" artifacts/chipq/queue.log 2>/dev/null; do
  sleep 60
done
note "part 1 complete; starting"

# -- 1. fixed train profile (VERDICT #3: name the ops behind 36% MFU) -----------
job profile 2400 python scripts/profile_train.py --batch 32 --steps 8 \
  --logdir "$QD/profile" || true

# -- 2. free-text LER sweep over every persisted epoch (checkpoint selection
#       by the product metric; ALIGNMENT.md "Checkpoint selection") ------------
cp -n "$WD/ckpt/hparams.json" "$WD/ckpt_post1200/" 2>/dev/null || true
job sweep 5400 python scripts/freetext_epoch_sweep.py --workdir "$WD" \
  --n 16 --sample_seeds 2 || true

BEST=$(python - <<'EOF'
import json
try:
    r = json.load(open("artifacts/toyv2_q90/freetext_sweep.json"))
    print(r["best"]["epoch"])
except Exception:
    print(1200)
EOF
)
note "best sweep epoch: $BEST"
if [ "$BEST" -le 1200 ]; then CKD="$WD/ckpt"; else CKD="$WD/ckpt_post1200"; fi

# -- 3. the four free-text feature variants at the selected epoch ---------------
job ft_base 3600 python scripts/freetext_toyv2_eval.py --n 16 --workdir "$WD" \
  --ckpt_dir "$CKD" --ckpt_epoch "$BEST" || true
job ft_takes4 3600 python scripts/freetext_toyv2_eval.py --n 16 --workdir "$WD" \
  --ckpt_dir "$CKD" --ckpt_epoch "$BEST" --takes 4 || true
job ft_quantile 3600 python scripts/freetext_toyv2_eval.py --n 16 \
  --workdir "$WD" --ckpt_dir "$CKD" --ckpt_epoch "$BEST" \
  --length_source quantile || true
job ft_takes4_quantile 3600 python scripts/freetext_toyv2_eval.py --n 16 \
  --workdir "$WD" --ckpt_dir "$CKD" --ckpt_epoch "$BEST" --takes 4 \
  --length_source quantile || true

# -- 4. headline gates + ALIGNMENT.md regeneration at the selected epoch --------
job headline 2400 python scripts/alignment_proof.py --workdir "$WD" \
  --eval_only --ckpt_dir "$CKD" --eval_epoch "$BEST" --quantile 0.9 \
  --epochs 1200 --stages_epochs 1200 || true

# -- 5. re-export the shipped artifact at the selected epoch --------------------
if [ "$BEST" -ne 1200 ]; then
  job export 1200 python scripts/export_checkpoint.py --model_dir "$CKD" \
    --epoch "$BEST" --out "$WD/ckpt/export.npz" || true
fi

note "queue2 complete"

#!/bin/bash
# Round-4 chip-work queue, part 5: temperature-diverse multi-take A/B on the
# PERSISTED q90 epoch-1700 export (the part-4 queue targeted the seed-777
# retrain that never started; the persisted export is the checkpoint we
# actually have). Question under test: does cycling the takes through a
# temperature spread widen the z distribution enough for the coverage-ranked
# selection to beat the plain takes-4 LER of 0.224 (ALIGNMENT.md feature
# A/B)? Launch detached:
#   setsid nohup bash scripts/chip_queue5.sh >> artifacts/chipq5/queue.log 2>&1 &
set -u
cd /root/repo
QD=artifacts/chipq5
mkdir -p "$QD"
WD=artifacts/toyv2_q90

note() { echo "[chipq5 $(date -u +%H:%M:%S)] $*"; }

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

# -- 1. temperature-diverse takes-4 at the shipped export ------------------------
job ft_takes4_temps 2700 python scripts/freetext_toyv2_eval.py --n 16 \
  --workdir "$WD" --ckpt_dir "$WD/ckpt" --takes 4 \
  --takes_temperatures 0.4,0.6,0.8,1.0 || true

# -- 2. wider ensemble: takes-8 across a finer spread ----------------------------
job ft_takes8_temps 2700 python scripts/freetext_toyv2_eval.py --n 16 \
  --workdir "$WD" --ckpt_dir "$WD/ckpt" --takes 8 \
  --takes_temperatures 0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0 || true

note "queue5 complete"

#!/bin/bash
# Round-4 chip-work queue, part 4: temperature-diverse multi-take A/B on the
# seed-777 sweep-selected checkpoint (ROADMAP #1 contingency: if the plain
# takes-4 LER is still above target, ensembling takes across a temperature
# spread gives the coverage-ranked selection a wider z distribution to pick
# from — cli.inference --takes_temperatures). Waits for part 3 to print
# "queue3 complete" before touching the chip — ONE TPU job at a time
# (CLAUDE.md). Launch detached:
#   setsid nohup bash scripts/chip_queue4.sh >> artifacts/chipq4/queue.log 2>&1 &
set -u
cd /root/repo
QD=artifacts/chipq4
mkdir -p "$QD"
WD=artifacts/toyv2_s777
TARGET=1800

note() { echo "[chipq4 $(date -u +%H:%M:%S)] $*"; }

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

# -- 0. wait for part 3 ---------------------------------------------------------
while ! grep -q "queue3 complete" artifacts/chipq3/queue.log 2>/dev/null; do
  sleep 60
done
note "part 3 complete; starting"

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

# -- 1. temperature-diverse takes at the selected epoch --------------------------
job ft_takes4_temps 3600 python scripts/freetext_toyv2_eval.py --n 16 \
  --workdir "$WD" --ckpt_dir "$WD/ckpt" --ckpt_epoch "$BEST" --takes 4 \
  --takes_temperatures 0.4,0.6,0.8,1.0 || true

# -- 2. same spread stacked on the quantile length head --------------------------
job ft_takes4_quantile_temps 3600 python scripts/freetext_toyv2_eval.py \
  --n 16 --workdir "$WD" --ckpt_dir "$WD/ckpt" --ckpt_epoch "$BEST" \
  --takes 4 --takes_temperatures 0.4,0.6,0.8,1.0 \
  --length_source quantile || true

note "queue4 complete"

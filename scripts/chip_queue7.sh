#!/bin/bash
# Round-5 chip-work queue: the multi-seed checkpoint lottery (VERDICT r4
# items 1 + 7). For each seed, run the probe-driven self-selecting toy-v2
# retrain (alignment_proof --train_only --probe_every 50 --stop_probe_ler)
# under resume_train_until.sh — wedge-watchdogged, VA-capped, deadline-
# bounded chunks — until the probe finds a winning epoch or the seed budget
# runs out. Durability is guaranteed INSIDE the run: every improving probe
# writes <wd>/export_best.npz (training/probe.py), so even a chunk that
# wedges or OOMs leaves the best-probed weights on disk. After each seed:
# persist the newest epoch (fp16 npz + tarred Orbax for exact resume) and
# append a lottery row to artifacts/chipq7/seeds.jsonl.
#
# Launch detached:
#   TRAIN_DEADLINE=<epoch_s> setsid nohup bash scripts/chip_queue7.sh \
#     >> artifacts/chipq7/queue.log 2>&1 &
# Env: SEEDS="777 20250 31337", TARGET=1800, STOP_LER=0.12,
#      PER_SEED_S=7200 (per-seed budget, clipped by TRAIN_DEADLINE)
set -u
cd /root/repo
QD=artifacts/chipq7
mkdir -p "$QD"
: "${TRAIN_DEADLINE:?epoch seconds}"
: "${SEEDS:=777 20250 31337}" "${TARGET:=1800}" "${STOP_LER:=0.12}"
: "${PER_SEED_S:=7200}" "${PROBE_START:=1200}"

note() { echo "[chipq7 $(date -u +%H:%M:%S)] $*"; }

for SEED in $SEEDS; do
  WD=artifacts/toyv2_s$SEED
  now=$(date +%s)
  left=$((TRAIN_DEADLINE - now))
  if [ "$left" -lt 600 ]; then
    note "skipping seed $SEED: only ${left}s left"
    continue
  fi
  seed_deadline=$((now + PER_SEED_S))
  [ "$seed_deadline" -gt "$TRAIN_DEADLINE" ] && seed_deadline=$TRAIN_DEADLINE
  note "seed $SEED -> $WD (budget $((seed_deadline - now))s, target $TARGET, stop LER $STOP_LER)"
  DEADLINE=$seed_deadline bash scripts/resume_train_until.sh \
    "$WD" "$TARGET" 1200 0.9 "$SEED" \
    --probe_every 50 --stop_probe_ler "$STOP_LER" --train_only \
    --probe_start "$PROBE_START" \
    >> "$QD/retrain_s$SEED.log" 2>&1

  FINAL=$(ls "$WD/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  BEST_JSON="{}"
  [ -f "$WD/export_best.json" ] && BEST_JSON=$(cat "$WD/export_best.json")
  STOPPED=false
  [ -f "$WD/PROBE_STOP" ] && STOPPED=true
  echo "{\"seed\": $SEED, \"final_epoch\": ${FINAL:-0}, \"probe_stop\": $STOPPED, \"best\": $BEST_JSON}" >> "$QD/seeds.jsonl"
  note "seed $SEED done: final epoch ${FINAL:-none}, probe_stop=$STOPPED, best=$BEST_JSON"

  # persist the newest epoch too (export_best.npz already covers the best):
  # fp16 npz + tarred Orbax step so round N+1 can resume with optimizer state
  if [ -n "${FINAL:-}" ]; then
    python scripts/export_checkpoint.py --model_dir "$WD/ckpt" \
      --epoch "$FINAL" --out "$WD/ckpt/export.npz" >> "$QD/export_s$SEED.log" 2>&1
    tar -C "$WD/ckpt" -czf "$WD/orbax_ep$FINAL.tar.gz" "$FINAL" hparams.json \
      >> "$QD/export_s$SEED.log" 2>&1
    cp "$WD/corpus_stats.json" "$WD/ckpt/" 2>/dev/null || true
  fi
done
note "queue7 complete"

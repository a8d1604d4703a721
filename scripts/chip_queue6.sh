#!/bin/bash
# Round-4 chip-work queue, part 6: the ROADMAP #1 checkpoint lottery —
# seed-777 toy-v2 retrain, DEADLINE-BOUNDED so the chip is free before the
# round's bench run. Each chunk runs under the VA cap (tunnel-client RAM
# leak, CLAUDE.md) and is stopped by `timeout` at the deadline; the trainer
# checkpoints on SIGTERM (live-tested), so whatever epoch the deadline lands
# on persists in artifacts/ for the round-5 sweep
# (scripts/freetext_epoch_sweep.py resumes the selection). Waits for part 5
# to print "queue5 complete" — ONE TPU job at a time. Launch detached:
#   TRAIN_DEADLINE=<epoch_s> PROBE_DEADLINE=<epoch_s> \
#     setsid nohup bash scripts/chip_queue6.sh >> artifacts/chipq6/queue.log 2>&1 &
set -u
cd /root/repo
QD=artifacts/chipq6
mkdir -p "$QD"
WD=artifacts/toyv2_s777
SEED=777
TARGET=1800
CAP_KB=$((100 * 1024 * 1024))
: "${TRAIN_DEADLINE:?epoch seconds}" "${PROBE_DEADLINE:?epoch seconds}"

note() { echo "[chipq6 $(date -u +%H:%M:%S)] $*"; }
latest() { ls "$WD/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

# -- 0. wait for part 5 ----------------------------------------------------------
while ! grep -q "queue5 complete" artifacts/chipq5/queue.log 2>/dev/null; do
  sleep 30
done
note "part 5 complete; starting retrain seed=$SEED target=$TARGET deadline=$TRAIN_DEADLINE"

# -- 1. deadline-bounded retrain (resume-on-death chunks) ------------------------
while :; do
  left=$((TRAIN_DEADLINE - $(date +%s)))
  cur=$(latest); cur=${cur:-0}
  note "chunk: checkpoints at epoch $cur / $TARGET, ${left}s left"
  [ "$left" -lt 120 ] && break
  [ "$cur" -ge $((TARGET - 1)) ] && break
  ( ulimit -v "$CAP_KB"
    exec timeout "$left" python scripts/alignment_proof.py \
      --workdir "$WD" --epochs "$TARGET" --stages_epochs 1200 \
      --quantile 0.9 --train_seed "$SEED" \
      --probe_every 50 ) >> "$QD/retrain.log" 2>&1
  note "chunk exited rc=$?"
  sleep 10
done
FINAL=$(latest)
note "retrain stopped at epoch ${FINAL:-none}"
echo "{\"job\": \"retrain\", \"final_epoch\": ${FINAL:-0}}" >> "$QD/status.jsonl"

# -- 2. persist: fp16 export + tarred Orbax step (exact-resume for round 5) ------
# Only committed files survive the round boundary (the host is reimaged);
# the npz feeds inference/sweeps, the tar lets resume_train_until continue
# with optimizer state intact.
if [ -n "${FINAL:-}" ]; then
  python scripts/export_checkpoint.py --model_dir "$WD/ckpt" \
    --epoch "$FINAL" --out "$WD/ckpt/export.npz" >> "$QD/export.log" 2>&1
  tar -C "$WD/ckpt" -czf "$WD/orbax_ep$FINAL.tar.gz" "$FINAL" hparams.json \
    >> "$QD/export.log" 2>&1
  cp "$WD/corpus_stats.json" "$WD/ckpt/" 2>/dev/null || true
  note "persisted: $(du -sh "$WD/ckpt/export.npz" "$WD/orbax_ep$FINAL.tar.gz" 2>/dev/null | tr '\n' ' ')"
fi

# -- 3. quick LER probe at the newest persisted epoch ----------------------------
left=$((PROBE_DEADLINE - $(date +%s)))
if [ -n "${FINAL:-}" ] && [ "$left" -gt 300 ]; then
  note "probe: freetext eval at epoch $FINAL (${left}s budget)"
  timeout "$left" python scripts/freetext_toyv2_eval.py --n 8 \
    --workdir "$WD" --ckpt_dir "$WD/ckpt" --ckpt_epoch "$FINAL" \
    --out_name "probe_ep$FINAL" > "$QD/probe.log" 2>&1
  note "probe rc=$?"
fi
note "queue6 complete"

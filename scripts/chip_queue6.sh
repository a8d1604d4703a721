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
  if [ -f "$WD/PROBE_STOP" ]; then
    note "probe early-stop: $(cat "$WD/PROBE_STOP")"
    break
  fi
  ( ulimit -v "$CAP_KB"
    exec timeout "$left" python scripts/alignment_proof.py \
      --workdir "$WD" --epochs "$TARGET" --stages_epochs 1200 \
      --quantile 0.9 --train_seed "$SEED" \
      --probe_every 50 --stop_probe_ler 0.12 ) >> "$QD/retrain.log" 2>&1
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
  # newest epoch: fp16 npz + tarred Orbax step (exact resume, optimizer
  # state intact)
  python scripts/export_checkpoint.py --model_dir "$WD/ckpt" \
    --epoch "$FINAL" --out "$WD/ckpt/export.npz" >> "$QD/export.log" 2>&1
  tar -C "$WD/ckpt" -czf "$WD/orbax_ep$FINAL.tar.gz" "$FINAL" hparams.json \
    >> "$QD/export.log" 2>&1
  cp "$WD/corpus_stats.json" "$WD/ckpt/" 2>/dev/null || true
  # best-probed epoch still on disk (the in-training LER probe makes the
  # run its own selection sweep): a second npz if it differs from newest
  BEST=$(python - "$WD" <<'EOF'
import json, os, sys
wd = sys.argv[1]
try:
    rows = [json.loads(l) for l in open(os.path.join(wd, "ler_probe.jsonl"))]
    on_disk = {int(n) for n in os.listdir(os.path.join(wd, "ckpt"))
               if n.isdigit()}
    rows = [r for r in rows if r["epoch"] in on_disk]
    print(min(rows, key=lambda r: r["probe_ler"])["epoch"] if rows else "")
except Exception:
    print("")
EOF
)
  note "best probed epoch on disk: ${BEST:-none}"
  if [ -n "$BEST" ] && [ "$BEST" != "$FINAL" ]; then
    python scripts/export_checkpoint.py --model_dir "$WD/ckpt" \
      --epoch "$BEST" --out "$WD/ckpt/export_best_ep$BEST.npz" \
      >> "$QD/export.log" 2>&1
  fi
  note "persisted: $(du -sh "$WD"/ckpt/export*.npz "$WD/orbax_ep$FINAL.tar.gz" 2>/dev/null | tr '\n' ' ')"
fi

# -- 3. offline LER confirmation at the selected epoch (n=16, real CLI) ----------
SEL=${BEST:-${FINAL:-}}
left=$((PROBE_DEADLINE - $(date +%s)))
if [ -n "$SEL" ] && [ "$left" -gt 300 ]; then
  note "probe: freetext eval at epoch $SEL (${left}s budget)"
  timeout "$left" python scripts/freetext_toyv2_eval.py --n 16 \
    --workdir "$WD" --ckpt_dir "$WD/ckpt" --ckpt_epoch "$SEL" \
    --out_name "probe_ep$SEL" > "$QD/probe.log" 2>&1
  note "probe rc=$?"
fi
note "queue6 complete"

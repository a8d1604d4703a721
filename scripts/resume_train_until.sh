#!/bin/bash
# Restart-on-death training driver: keeps relaunching alignment_proof.py
# until the workdir's checkpoints reach --target epochs. Each chunk runs
# under an address-space cap so the tunnel-client host-memory growth
# (150 MB/epoch measured in round 4; OOM-killed a 2000-epoch run at epoch
# 1621 / 128 GB RSS) dies as a clean in-process failure instead of a global
# OOM kill, and the loop resumes from the last 50-epoch checkpoint.
# Usage: setsid nohup bash scripts/resume_train_until.sh WORKDIR TARGET \
#            [STAGES_EPOCHS] [QUANTILE] [SEED] >> LOG 2>&1 &
set -u
cd /root/repo
WD=${1:?workdir}
TARGET=${2:?target epochs}
STAGES=${3:-1200}
QUANT=${4:-0.9}
SEED_ARGS=()
[ -n "${5:-}" ] && SEED_ARGS=(--train_seed "$5")
CAP_KB=$((100 * 1024 * 1024))  # 100 GB VA per chunk

latest() { ls "$WD/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

for attempt in 1 2 3 4 5 6; do
  cur=$(latest); cur=${cur:-0}
  echo "[resume_train attempt $attempt] checkpoints at epoch $cur / $TARGET"
  # the loop saves its last checkpoint at epoch TARGET-1 (0-indexed epochs)
  if [ "$cur" -ge $((TARGET - 1)) ]; then break; fi
  ( ulimit -v "$CAP_KB"
    exec timeout 10800 python scripts/alignment_proof.py \
      --workdir "$WD" --epochs "$TARGET" --stages_epochs "$STAGES" \
      --quantile "$QUANT" ${SEED_ARGS[@]+"${SEED_ARGS[@]}"} )
  rc=$?
  echo "[resume_train attempt $attempt] trainer exited rc=$rc"
  sleep 15
done
echo "[resume_train] final checkpoint epoch: $(latest)"

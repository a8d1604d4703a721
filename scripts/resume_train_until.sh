#!/bin/bash
# Restart-on-death training driver: keeps relaunching alignment_proof.py
# until the workdir's checkpoints reach TARGET epochs, a PROBE_STOP sentinel
# appears (probe-driven early stop), or the attempts run out. Each chunk runs
# under scripts/run_with_watchdog.sh, which
#   * caps address space (the tunnel client leaks ~160 MB/epoch of host RAM;
#     round 4 measured an 820-epoch stretch OOM-killed at 128 GB RSS), and
#   * kills a WEDGED chunk (near-zero trainer CPU over 15 min — the tunnel
#     failure family that ate rounds 2 and 4) so the loop can resume from
#     the last 50-epoch checkpoint instead of sitting dead to the deadline.
# After a wedge kill the loop backs off WEDGE_BACKOFF_S (default 300 s;
# the round-2 fault cleared in ~30 min, round 4's in less) before resuming.
#
# Usage: setsid nohup bash scripts/resume_train_until.sh WORKDIR TARGET \
#            [STAGES_EPOCHS] [QUANTILE] [SEED] [EXTRA_ARGS...] >> LOG 2>&1 &
# Env:   DEADLINE (epoch s, 0=none), WEDGE_BACKOFF_S, MAX_ATTEMPTS (default 8)
#        plus run_with_watchdog.sh's WEDGE_WINDOW_S / CAP_KB / ...
set -u
cd /root/repo
WD=${1:?workdir}
TARGET=${2:?target epochs}
STAGES=${3:-1200}
QUANT=${4:-0.9}
SEED_ARGS=()
[ -n "${5:-}" ] && SEED_ARGS=(--train_seed "$5")
shift $(( $# > 5 ? 5 : $# ))
EXTRA_ARGS=("$@")
: "${DEADLINE:=0}" "${WEDGE_BACKOFF_S:=300}" "${MAX_ATTEMPTS:=8}"

latest() { ls "$WD/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  cur=$(latest); cur=${cur:-0}
  echo "[resume_train attempt $attempt] checkpoints at epoch $cur / $TARGET"
  # the loop saves its last checkpoint at epoch TARGET-1 (0-indexed epochs)
  if [ "$cur" -ge $((TARGET - 1)) ]; then break; fi
  if [ -f "$WD/PROBE_STOP" ]; then
    echo "[resume_train] probe early-stop: $(cat "$WD/PROBE_STOP")"
    break
  fi
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge $((DEADLINE - 120)) ]; then
    echo "[resume_train] deadline reached"
    break
  fi
  bash scripts/run_with_watchdog.sh -d "$DEADLINE" -l "resume_train" -- \
    python scripts/alignment_proof.py \
      --workdir "$WD" --epochs "$TARGET" --stages_epochs "$STAGES" \
      --quantile "$QUANT" ${SEED_ARGS[@]+"${SEED_ARGS[@]}"} \
      ${EXTRA_ARGS[@]+"${EXTRA_ARGS[@]}"}
  rc=$?
  echo "[resume_train attempt $attempt] trainer exited rc=$rc"
  if [ "$rc" = 142 ]; then
    echo "[resume_train] wedge kill; backing off ${WEDGE_BACKOFF_S}s for the tunnel"
    sleep "$WEDGE_BACKOFF_S"
  elif [ "$rc" = 143 ]; then
    break  # deadline
  else
    sleep 15
  fi
done
echo "[resume_train] final checkpoint epoch: $(latest)"

#!/bin/bash
# Restart-on-death training driver: keeps relaunching alignment_proof.py
# until the workdir's checkpoints reach TARGET epochs, a PROBE_STOP sentinel
# appears (probe-driven early stop), or the attempts run out. Each chunk runs
# under scripts/run_with_watchdog.sh, which
#   * caps address space (the tunnel client leaks ~160 MB/epoch of host RAM
#     on the streaming path; round 4 measured an 820-epoch stretch OOM-killed
#     at 128 GB RSS), and
#   * kills a WEDGED chunk (near-zero trainer CPU over 15 min — the tunnel
#     failure family that ate rounds 2 and 4).
#
# Round-5 finding: a client stalled on a wedged tunnel can TRICKLE CPU
# (~4 s/900 s measured while blocked on a remote compile that never
# returned), evading the CPU-based wedge detector. So this loop now also
# enforces PROGRESS-BASED recycling: every attempt gets a bounded time
# budget (PER_ATTEMPT_S), and an attempt that ends with NO new checkpoint
# is treated as a wedge — back off WEDGE_BACKOFF_S and retry. Attempts that
# DO advance the checkpoint relaunch immediately and reset the failure
# count, so MAX_ATTEMPTS bounds consecutive failures, not total chunks.
#
# Usage: setsid nohup bash scripts/resume_train_until.sh WORKDIR TARGET \
#            [STAGES_EPOCHS] [QUANTILE] [SEED] [EXTRA_ARGS...] >> LOG 2>&1 &
# Env:   DEADLINE (epoch s, 0=none), PER_ATTEMPT_S (0=run to DEADLINE),
#        WEDGE_BACKOFF_S, MAX_ATTEMPTS (default 8; consecutive no-progress)
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
: "${PER_ATTEMPT_S:=0}"

latest() { ls "$WD/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

fails=0
attempt=0
while [ "$fails" -lt "$MAX_ATTEMPTS" ]; do
  attempt=$((attempt + 1))
  cur=$(latest); cur=${cur:-0}
  echo "[resume_train attempt $attempt] checkpoints at epoch $cur / $TARGET (consec fails: $fails)"
  # the loop saves its last checkpoint at epoch TARGET-1 (0-indexed epochs)
  if [ "$cur" -ge $((TARGET - 1)) ]; then break; fi
  if [ -f "$WD/PROBE_STOP" ]; then
    echo "[resume_train] probe early-stop: $(cat "$WD/PROBE_STOP")"
    break
  fi
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ "$now" -ge $((DEADLINE - 120)) ]; then
    echo "[resume_train] deadline reached"
    break
  fi
  att_deadline=$DEADLINE
  if [ "$PER_ATTEMPT_S" -gt 0 ]; then
    att_deadline=$((now + PER_ATTEMPT_S))
    if [ "$DEADLINE" -gt 0 ] && [ "$att_deadline" -gt "$DEADLINE" ]; then
      att_deadline=$DEADLINE
    fi
  fi
  bash scripts/run_with_watchdog.sh -d "$att_deadline" -l "resume_train" \
      -p "$WD/ckpt" -- \
    python scripts/alignment_proof.py \
      --workdir "$WD" --epochs "$TARGET" --stages_epochs "$STAGES" \
      --quantile "$QUANT" ${SEED_ARGS[@]+"${SEED_ARGS[@]}"} \
      ${EXTRA_ARGS[@]+"${EXTRA_ARGS[@]}"}
  rc=$?
  new=$(latest); new=${new:-0}
  echo "[resume_train attempt $attempt] trainer exited rc=$rc (epoch $cur -> $new)"
  if [ -f "$WD/PROBE_STOP" ]; then continue; fi
  if [ "$rc" = 143 ] && [ "$DEADLINE" -gt 0 ] \
      && [ "$(date +%s)" -ge $((DEADLINE - 120)) ]; then
    echo "[resume_train] global deadline"
    break
  fi
  if [ "$new" -gt "$cur" ]; then
    fails=0            # progress: relaunch immediately
    sleep 5
  else
    fails=$((fails + 1))
    echo "[resume_train] NO PROGRESS (rc=$rc); wedge suspected — backing off ${WEDGE_BACKOFF_S}s"
    sleep "$WEDGE_BACKOFF_S"
  fi
done
echo "[resume_train] final checkpoint epoch: $(latest)"

#!/bin/bash
# Wedge-watchdog process wrapper for chip jobs.
#
# The axon tunnel has twice wedged a live trainer mid-run (round 2: GL fault
# family; round 4: zero trainer CPU for 15+ min, jax.devices() hung from a
# second process — the chip/tunnel died, not the trainer). A wedged child
# accumulates ~no CPU while holding the chip, and nothing recycles it; the
# round-4 seed-777 retrain sat dead until the round ended. This wrapper:
#
#   * runs CMD under an address-space cap (the tunnel client leaks host RAM
#     ~160 MB/epoch; a capped chunk dies as a clean in-process failure)
#   * samples the child's cumulative CPU (utime+stime of ALL its threads)
#     every WATCH_POLL_S; if less than WEDGE_MIN_CPU_CS centiseconds
#     accumulate over WEDGE_WINDOW_S, the child is declared wedged and
#     SIGKILLed (exit 142) so a restart-on-death driver can resume from the
#     last checkpoint after the tunnel recovers
#   * enforces an absolute deadline: SIGTERM at DEADLINE (the trainer
#     checkpoints on SIGTERM — live-tested), SIGKILL TERM_GRACE_S later if
#     it lingers (exit 143) — the timeout(1)-without---kill-after gap that
#     used to keep the chip busy past TRAIN_DEADLINE
#
# The window default (900 s) exceeds the longest LEGITIMATE zero-ish-CPU
# stretch on this host: a cold remote compile over the tunnel is 2-5 min
# (measured, CLAUDE.md), and training epochs between compiles always burn
# host CPU on dispatch.
#
# Round-5 addition: -p PROGRESS_DIR. A client stalled on a wedged tunnel
# can TRICKLE CPU (~4 s/900 s measured while blocked on a remote compile
# that never returned), evading the CPU check. With -p, the watchdog also
# tracks the newest file mtime under PROGRESS_DIR (e.g. the checkpoint
# dir, which gains files every 50 epochs ≈ 2-5 min when healthy); no new
# mtime for PROGRESS_TIMEOUT_S ⇒ wedge kill (142). The window must exceed
# the longest legitimate no-save stretch: a 2-6 min remote compile at each
# curriculum-stage boundary plus a checkpoint interval.
#
# Usage:  run_with_watchdog.sh [-d DEADLINE_EPOCH_S] [-l LABEL]
#             [-p PROGRESS_DIR] -- cmd args...
# Env:    WEDGE_WINDOW_S=900  WEDGE_MIN_CPU_CS=200  WATCH_POLL_S=30
#         PROGRESS_TIMEOUT_S=1200
#         CAP_KB=104857600 (100 GB; 0 disables)  TERM_GRACE_S=120
# Exit:   the child's exit code; 142 = wedge kill; 143 = deadline kill.
set -u

DEADLINE=0
LABEL=watchdog
PROGRESS_DIR=""
while getopts "d:l:p:" opt; do
  case "$opt" in
    d) DEADLINE=$OPTARG ;;
    l) LABEL=$OPTARG ;;
    p) PROGRESS_DIR=$OPTARG ;;
    *) echo "usage: $0 [-d deadline_epoch_s] [-l label] [-p progress_dir] -- cmd..." >&2; exit 2 ;;
  esac
done
shift $((OPTIND - 1))
[ "${1:-}" = "--" ] && shift
[ $# -ge 1 ] || { echo "$0: no command given" >&2; exit 2; }

: "${WEDGE_WINDOW_S:=900}" "${WEDGE_MIN_CPU_CS:=200}" "${WATCH_POLL_S:=30}"
: "${CAP_KB:=104857600}" "${TERM_GRACE_S:=120}" "${PROGRESS_TIMEOUT_S:=1200}"

note() { echo "[$LABEL $(date -u +%H:%M:%S)] $*" >&2; }

# cumulative CPU of pid in centiseconds (clock ticks; CONFIG_HZ=100 here),
# utime+stime summed over all threads. Empty if the process is gone.
cpu_cs() {
  local s
  s=$(cat "/proc/$1/stat" 2>/dev/null) || { echo ""; return; }
  s=${s##*) }  # strip "pid (comm) " — comm may contain spaces
  set -- $s
  echo $(( ${12} + ${13} ))  # utime, stime (stat fields 14, 15)
}

if [ "$CAP_KB" -gt 0 ]; then
  ( ulimit -v "$CAP_KB"; exec "$@" ) &
else
  ( exec "$@" ) &
fi
PID=$!
note "started pid $PID: $*"

# newest file mtime (integer epoch s) under PROGRESS_DIR; empty if none
prog_mtime() {
  find "$PROGRESS_DIR" -type f -printf '%T@\n' 2>/dev/null \
    | sort -n | tail -1 | cut -d. -f1
}

anchor_cpu=$(cpu_cs "$PID"); anchor_cpu=${anchor_cpu:-0}
anchor_ts=$(date +%s)
prog_anchor_m=""; prog_anchor_ts=$anchor_ts
[ -n "$PROGRESS_DIR" ] && prog_anchor_m=$(prog_mtime)
termed=0

while kill -0 "$PID" 2>/dev/null; do
  sleep "$WATCH_POLL_S"
  now=$(date +%s)
  cpu=$(cpu_cs "$PID")
  [ -z "$cpu" ] && break  # exited between kill -0 and the sample
  if [ $((cpu - anchor_cpu)) -ge "$WEDGE_MIN_CPU_CS" ]; then
    anchor_cpu=$cpu; anchor_ts=$now  # progress: reset the window
  elif [ $((now - anchor_ts)) -ge "$WEDGE_WINDOW_S" ]; then
    note "WEDGE: <${WEDGE_MIN_CPU_CS}cs CPU over $((now - anchor_ts))s; killing $PID"
    kill -KILL "$PID" 2>/dev/null
    wait "$PID" 2>/dev/null
    exit 142
  fi
  if [ -n "$PROGRESS_DIR" ] && [ "$termed" = 0 ]; then
    m=$(prog_mtime)
    if [ -n "$m" ] && [ "$m" != "$prog_anchor_m" ]; then
      prog_anchor_m=$m; prog_anchor_ts=$now
    elif [ $((now - prog_anchor_ts)) -ge "$PROGRESS_TIMEOUT_S" ]; then
      note "WEDGE: no new file under $PROGRESS_DIR for $((now - prog_anchor_ts))s; killing $PID"
      kill -KILL "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      exit 142
    fi
  fi
  if [ "$DEADLINE" -gt 0 ] && [ "$now" -ge "$DEADLINE" ] && [ "$termed" = 0 ]; then
    note "deadline: SIGTERM $PID (checkpoint-and-exit), grace ${TERM_GRACE_S}s"
    kill -TERM "$PID" 2>/dev/null
    termed=1
    deadline_kill=$((now + TERM_GRACE_S))
  fi
  if [ "$termed" = 1 ] && [ "$now" -ge "${deadline_kill:-0}" ]; then
    note "deadline grace expired; SIGKILL $PID"
    kill -KILL "$PID" 2>/dev/null
    wait "$PID" 2>/dev/null
    exit 143
  fi
done
wait "$PID"
rc=$?
if [ "$termed" = 1 ]; then
  note "child exited rc=$rc after deadline SIGTERM"
  exit 143
fi
note "child exited rc=$rc"
exit $rc

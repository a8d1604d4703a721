#!/bin/bash
# VERDICT r4 item 6: attack the last measured >1 ms train-step bucket —
# 3.3 ms of exposed copy-done/async prefetch + 0.63 ms of data formatting
# (PROFILE.md category table). Adam-state donation is already in place
# (training/steps.py donate_argnums=(0,1,2)), so the remaining levers are
# XLA scheduling/memory knobs. This sweep reruns the pull-synced train-step
# A/B (scripts/perf_ab_train.py, marginal protocol) under candidate
# XLA_FLAGS combos, one process per combo (flags are process-global).
#
# Usage (idle host, chip attached):
#   bash scripts/perf_xla_flags_ab.sh [outfile]
set -u
cd /root/repo
OUT=${1:-artifacts/chipq7/xla_flags_ab.log}
mkdir -p "$(dirname "$OUT")"

# The XLA_FLAGS env route is DEAD here: the tunnel client's host-side
# parser rejects TPU compiler flags as unknown (fatal F-log, measured
# round 5). PJRT compiler_options on an AOT compile are forwarded to the
# remote compiler instead (perf_ab_train.py --compiler_options).
run_one() {
  local label=$1 opts=$2
  echo "=== $label: compiler_options='$opts'" | tee -a "$OUT"
  local extra=()
  [ -n "$opts" ] && extra=(--compiler_options "$opts")
  timeout 1200 python scripts/perf_ab_train.py \
    --modes xla --reps 3 ${extra[@]+"${extra[@]}"} 2>&1 | tail -3 | tee -a "$OUT"
}

# baseline first (same protocol, same process count, same day — the r4
# reference number 29.9 ms is from a different session)
run_one baseline ""
# latency-hiding scheduler: reorders to overlap async copies with compute
run_one lhs "xla_tpu_enable_latency_hiding_scheduler=true"
# bigger scoped-VMEM scratch: wider prefetch windows for operand streams
run_one vmem128 "xla_tpu_scoped_vmem_limit_kib=131072"
run_one lhs_vmem "xla_tpu_enable_latency_hiding_scheduler=true,xla_tpu_scoped_vmem_limit_kib=131072"
# memory-bound scheduling slop: lets the scheduler run hotter on HBM
run_one slop95 "xla_tpu_memory_limit_slop_factor=95"
echo "done" | tee -a "$OUT"

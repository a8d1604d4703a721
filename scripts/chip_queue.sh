#!/bin/bash
# Round-4 chip-work queue: runs every chip-bound VERDICT r3 item serially —
# ONE TPU job at a time (CLAUDE.md). Launch ONLY when the chip is free
# (no PID-wait: a pre-armed wait on a dying wrapper PID fired early twice
# in round 4). Each job logs to artifacts/chipq/<name>.log and appends a
# status line to artifacts/chipq/status.jsonl. Launch detached:
#   setsid nohup bash scripts/chip_queue.sh >> artifacts/chipq/queue.log 2>&1 &
set -u
cd /root/repo
QD=artifacts/chipq
mkdir -p "$QD"
WD=artifacts/toyv2_q90

note() { echo "[chipq $(date -u +%H:%M:%S)] $*"; }

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

# -- 1. persist the checkpoint (VERDICT #1) ------------------------------------
job export 1200 python scripts/export_checkpoint.py --model_dir "$WD/ckpt"

# -- 2. free-text feature measurements (VERDICT #1) ----------------------------
job freetext_base 3600 python scripts/freetext_toyv2_eval.py --n 16 --workdir "$WD" \
  || true
job freetext_takes4 3600 python scripts/freetext_toyv2_eval.py --n 16 --workdir "$WD" \
  --takes 4 || true
job freetext_quantile 3600 python scripts/freetext_toyv2_eval.py --n 16 --workdir "$WD" \
  --length_source quantile || true
job freetext_takes4_quantile 3600 python scripts/freetext_toyv2_eval.py --n 16 \
  --workdir "$WD" --takes 4 --length_source quantile || true

# -- 2b. headline alignment eval at the shipped (epoch-1200) checkpoint:
#        regenerates ALIGNMENT.md with the real gates + the fresh freetext
#        table (the 2000-epoch run's tail collapsed; post-mortem evals
#        picked 1200 — see alignment_proof_ep{1200,1999_FAIL}.json)
job headline_eval 2400 python scripts/alignment_proof.py --workdir "$WD" \
  --eval_only --quantile 0.9 --epochs 1200 --stages_epochs 1200 || true

# -- 3. train-MFU evidence first (VERDICT #3): profile + dtype A/B --------------
job profile 2400 python scripts/profile_train.py --batch 32 --steps 8 \
  --logdir artifacts/chipq/profile || true
job dtype_fp32 2400 python scripts/perf_ab_train.py --modes auto --batch 32 \
  --compute_dtype float32 || true

# -- 4. gradient accumulation on the chip (VERDICT #2) -------------------------
job accum_b64 2400 python scripts/perf_ab_train.py --modes auto --batch 64 || true
job accum_b64x2 2400 python scripts/perf_ab_train.py --modes auto --batch 64 \
  --grad_accum 2 || true
job accum_b128 2400 python scripts/perf_ab_train.py --modes auto --batch 128 \
  --chain 4 16 || true
job accum_b128x4 2400 python scripts/perf_ab_train.py --modes auto --batch 128 \
  --grad_accum 4 --chain 4 16 || true

# -- 5. D=128 Pallas crossover sweep (VERDICT #4) -------------------------------
job attn_d128 3600 python scripts/perf_ab_attn.py --heads 8 --head_dim 128 \
  --seqs 256 384 512 768 1024 || true

# -- 6. neural vocoder: train on toy-v2, then device-ISTFT A/B (VERDICT #5) ----
job voc_train 5400 python -m vaenar_tts_tpu.cli.train_vocoder --toy \
  --toy_version 2 --n_toy_utterances 96 --steps 12000 \
  --model_dir artifacts/voc_toyv2 --log_every 1000 || true
job voc_eval 3600 python scripts/eval_vocoder.py --model_dir artifacts/voc_toyv2 \
  --toy_version 2 --istft both --device_gl || true

# -- 7. streaming TTFA on the device vocoder (VERDICT #6) ----------------------
job stream_ttfa 3600 python scripts/bench_vocoder.py --device_stream || true

# -- 8. headline bench ----------------------------------------------------------
job bench 3600 python bench.py || true

note "queue complete"

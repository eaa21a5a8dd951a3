#!/bin/bash
# Round-4 on-chip work queue (VERDICT r3 next-steps). Quick measurement
# items FIRST (guaranteed evidence even if the session/VM dies), then the
# long rotation resume, then the post-resume measurements.
#
#   1. stage2_trace — HEAD_TRAINING step xplane after the histogram fix
#                     (VERDICT #4: attribute the async-copy wall; <20 ms
#                     goal at batch 2, 480x640)
#   2. rot_resume   — resume round-3 DEMO_S2 (42 deg, still falling) for
#                     1000 staged epochs + held-out seed-99 eval
#                     (VERDICT #2); evidence ticker commits curves every
#                     10 min (VERDICT #3)
#   3. mfu_batch8   — serving MFU at batch 8 (VERDICT #5)
#   4. chip_check   — kernel parity re-verify after the perf work
#                     (VERDICT #8)
#   5. bench        — final driver-style e2e FPS
#
# Each step is independently timed out and failure-tolerant; logs land in
# /tmp/q4_*.log AND are committed into evidence/ immediately (a VM
# restart wipes /tmp).
cd "$(dirname "$0")/.."
export BANK_POOL_DIR=${BANK_POOL_DIR:-/tmp/rot_banks}

run() {  # run <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== chip_queue_r4: $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue_r4.log
  timeout "$t" "$@" >"/tmp/q4_${name}.log" 2>&1
  echo "=== chip_queue_r4: $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue_r4.log
  tail -3 "/tmp/q4_${name}.log" >> /tmp/chip_queue_r4.log
  mkdir -p evidence
  cp "/tmp/q4_${name}.log" "evidence/q4_${name}.log"
  git add "evidence/q4_${name}.log"
  git commit -q -m "Record on-chip ${name} log (round-4 queue)" \
    -- "evidence/q4_${name}.log" || true
}

run 1800  stage2_trace python scripts/profile_train_trace.py HEAD_TRAINING
run 14000 rot_resume   bash scripts/rotation_resume.sh
run 1800  mfu_batch8   python scripts/mfu_report.py --batch 8
run 1800  chip_check   python scripts/chip_check.py
run 900   bench        python bench.py
echo "=== chip_queue_r4: done $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue_r4.log
touch /tmp/chip_queue_r4_done

#!/bin/bash
# Post-demo chip measurement queue (round-3 VERDICT evidence items).
# Run on the real TPU attachment once the chip is free. Each step is
# independently timed-out and failure-tolerant so one wedge cannot block
# the rest; logs land in /tmp/q_*.log for BASELINE.md transcription.
#
#   1. bench.py                      — e2e FPS after the round-3 stem
#                                      changes (was 283.2, BENCH_r02)
#   2. scripts/chip_check.py         — extended on-chip parity (soft
#                                      voting, VP, dense LSQ; VERDICT #9)
#   3. scripts/probe_fused_laterals.py — 1x1 lateral/head fusion A/B
#                                      (VERDICT #5)
#   4. scripts/profile_train_trace.py HEAD_TRAINING — stage-2 step
#                                      xplane time, <20 ms goal (VERDICT #6)
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== chip_queue: $name start $(date -u +%H:%M:%S) ==="
  timeout 1800 "$@" >"/tmp/q_${name}.log" 2>&1
  local rc=$?
  echo "=== chip_queue: $name exit=$rc ==="
  tail -5 "/tmp/q_${name}.log"
}

run bench         python bench.py
run chip_check    python scripts/chip_check.py
run probe_lateral python scripts/probe_fused_laterals.py
run stage2_trace  python scripts/profile_train_trace.py HEAD_TRAINING
echo "=== chip_queue: done $(date -u +%H:%M:%S) ==="

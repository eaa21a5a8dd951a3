#!/bin/bash
# Round-4 follow-up chip queue: runs after chip_queue_r4.sh completes
# (polls its done marker). Attributes the 40.5 ms stage-2 step:
#   - nodense A/B (round-2's 24.4 ms step predates dense supervision)
#   - trained-weights trace would need a ckpt; random-init adaptive RANSAC
#     may dominate (23.6 ms summed Pallas voting over 3 steps vs
#     0.24 ms/frame in trained inference) — compare MASK_TRAINING too.
cd "$(dirname "$0")/.."
while [ ! -f /tmp/chip_queue_r4_done ]; do sleep 60; done

run() {
  local t=$1 name=$2; shift 2
  echo "=== r4b: $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue_r4b.log
  timeout "$t" "$@" >"/tmp/q4_${name}.log" 2>&1
  echo "=== r4b: $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue_r4b.log
  cp "/tmp/q4_${name}.log" "evidence/q4_${name}.log"
  git add "evidence/q4_${name}.log"
  git commit -q -m "Record on-chip ${name} log (round-4 queue)" \
    -- "evidence/q4_${name}.log" || true
}

run 1800 stage2_nodense python scripts/profile_train_trace.py HEAD_TRAINING nodense
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/xplane_top.py \
  /tmp/jax_trace_train_HEAD_TRAINING --spans > /tmp/q4_stage2_nodense_span.log 2>&1
cp /tmp/q4_stage2_nodense_span.log evidence/ && git add evidence/q4_stage2_nodense_span.log && \
  git commit -q -m "Record stage2 nodense span (round-4 queue)" -- evidence/q4_stage2_nodense_span.log || true
touch /tmp/chip_queue_r4b_done

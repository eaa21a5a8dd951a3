#!/bin/bash
# Round-4 chain, part 4: rotation stage 5 (full sym quat targets from the
# DEMO_S3 best checkpoint — see scripts/rotation_stage5.sh header) and a
# final bench. Failure-tolerant; evidence committed per step, and stage 5
# itself commits a held-out eval after every 250-epoch chunk. Launch
# detached (setsid nohup) so a session/VM death doesn't orphan the run.
cd "$(dirname "$0")/.."
export BANK_POOL_DIR=${BANK_POOL_DIR:-/tmp/rot_banks}

run() {
  local t=$1 name=$2; shift 2
  echo "=== r4d: $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue_r4d.log
  timeout "$t" "$@" >"/tmp/q4_${name}.log" 2>&1
  echo "=== r4d: $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue_r4d.log
  cp "/tmp/q4_${name}.log" "evidence/q4_${name}.log"
  git add "evidence/q4_${name}.log"
  git commit -q -m "Record on-chip ${name} log (round-4 queue)" \
    -- "evidence/q4_${name}.log" || true
}

run 17000 rot_stage5 bash scripts/rotation_stage5.sh
run 900   bench_s5 python bench.py
touch /tmp/chip_queue_r4d_done

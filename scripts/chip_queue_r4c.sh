#!/bin/bash
# Round-4 chain, part 3: after chip_queue_r4b completes, run the
# swing-supervision rotation stage (scripts/rotation_stage4.sh) and a
# final bench. Failure-tolerant; evidence committed per step.
cd "$(dirname "$0")/.."
export BANK_POOL_DIR=${BANK_POOL_DIR:-/tmp/rot_banks}
while [ ! -f /tmp/chip_queue_r4b_done ]; do sleep 60; done

run() {
  local t=$1 name=$2; shift 2
  echo "=== r4c: $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue_r4c.log
  timeout "$t" "$@" >"/tmp/q4_${name}.log" 2>&1
  echo "=== r4c: $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue_r4c.log
  cp "/tmp/q4_${name}.log" "evidence/q4_${name}.log"
  git add "evidence/q4_${name}.log"
  git commit -q -m "Record on-chip ${name} log (round-4 queue)" \
    -- "evidence/q4_${name}.log" || true
}

run 14000 rot_stage4 bash scripts/rotation_stage4.sh
run 900   bench_final python bench.py
touch /tmp/chip_queue_r4c_done

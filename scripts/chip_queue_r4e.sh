#!/bin/bash
# Round-4 chain, part 5 (post-VM-restart session): the host VM restart at
# ~21:15 UTC destroyed all orbax checkpoints (second such loss), so this
# queue re-runs the rotation pipeline FROM SCRATCH via
# scripts/rotation_full.sh — the proven two-stage recipe with full
# symmetric quat targets from epoch 0 and, new, a durable npz weight
# snapshot committed to git after every chunk. Failure-tolerant: launch
# detached (setsid nohup); evidence + snapshots commit per chunk inside
# rotation_full.sh. Pair with scripts/wall_watchdog.sh so the driver's
# end-of-round bench.py gets a quiet TPU.
cd "$(dirname "$0")/.."
export BANK_POOL_DIR=${BANK_POOL_DIR:-/tmp/rot_banks}

run() {
  local t=$1 name=$2; shift 2
  echo "=== r4e: $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue_r4e.log
  timeout "$t" "$@" >"/tmp/q4e_${name}.log" 2>&1
  echo "=== r4e: $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue_r4e.log
  cp "/tmp/q4e_${name}.log" "evidence/q4e_${name}.log"
  git add "evidence/q4e_${name}.log"
  git commit -q -m "Record on-chip ${name} log (round-4e queue)" \
    -- "evidence/q4e_${name}.log" || true
}

run 10800 rot_full bash scripts/rotation_full.sh
touch /tmp/chip_queue_r4e_done

#!/bin/bash
# Round-5 queue, part 3: c5 attempt 3 after two pre-epoch-0 stalls (both
# attempts: staging logged, then zero CPU in futex_do_wait, no epoch 0;
# fresh clients compile+execute small programs fine). Two hypotheses:
# (a) multiprocessing fork-after-JAX deadlock in the staging worker pool
# (3 of 4 forked workers found stuck in futex_do_wait), (b) a poisoned
# remote compile-cache entry from the first killed attempt. HEAD_LR
# 2.4e-5 (vs 2.5e-5) busts the cache key while staying semantically
# equivalent; if this attempt also stalls pre-epoch-0 the fallback is
# NUM_WORKERS=0 (no forks). Remaining steps unchanged from part 2.
set -u
cd "$(dirname "$0")/.."
export BANK_POOL_DIR=${BANK_POOL_DIR:-/tmp/rot_banks}

DEADLINE_TS=$(date -u -d "today ${QUEUE_DEADLINE:-15:40}" +%s)
if [ "$DEADLINE_TS" -le "$(date -u +%s)" ]; then
  DEADLINE_TS=$((DEADLINE_TS + 86400))
fi
left() { echo $(( DEADLINE_TS - $(date -u +%s) )); }

run() {
  local t=$1 name=$2; shift 2
  if [ "$(left)" -lt "$t" ]; then
    echo "=== r5b: SKIP $name (needs ${t}s, $(left)s left) ===" \
      | tee -a /tmp/chip_queue_r5.log
    return 1
  fi
  echo "=== r5b: $name start $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  timeout -k 60 "$t" "$@" >"/tmp/q5_${name}.log" 2>&1
  local rc=$?
  echo "=== r5b: $name exit=$rc $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  cp "/tmp/q5_${name}.log" "evidence/q5_${name}.log"
  git add "evidence/q5_${name}.log"
  git commit -q -m "Record on-chip ${name} log (round-5 queue)" \
    -- "evidence/q5_${name}.log" || true
  return "$rc"
}

C4_LAST=$(ls -dt logs/*/*FULL_c4*/checkpoints/last 2>/dev/null | head -1)
[ -e "$C4_LAST" ] || C4_LAST=evidence/rot_demo/ckpt_FULL_c4.npz
run 4200 rot_c5 env HEAD_LR=2.4e-5 ENC_LR=2.5e-6 \
  RESUME="$C4_LAST" RESUME_CHUNK=5 N_CHUNKS=5 bash scripts/rotation_full.sh
R5=$(ls -dt logs/*/*FULL_c5*/checkpoints/last 2>/dev/null | head -1)
[ -e "$R5" ] || R5=evidence/rot_demo/ckpt_FULL_c5.npz
if [ -e "$R5" ]; then
  run 4200 rot_c6 env HEAD_LR=1.25e-5 ENC_LR=1.25e-6 \
    RESUME="$R5" RESUME_CHUNK=6 N_CHUNKS=6 bash scripts/rotation_full.sh
fi

run 9000 boost env CUE_BOOST=1 EXP=BOOST BANK_POOL_DIR=/tmp/boost_banks \
  N_CHUNKS=2 bash scripts/rotation_full.sh

run 1800 chip_check python scripts/chip_check.py
run 900 bench python bench.py

touch /tmp/chip_queue_r5_done
echo "=== r5b queue done $(date -u +%H:%M:%S) ===" \
  | tee -a /tmp/chip_queue_r5.log

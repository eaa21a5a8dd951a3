#!/bin/bash
# Round-5 queue, part 5: re-run c6 with the staged-upload integrity
# guard in place (commit 3321e06). The first c6 attempt trained on
# corrupted staged data from epoch 0 (root cause in diag_resume.py +
# BASELINE.md round-5 section) and regressed the chain to 32.6 deg; the
# good c5 state lives in the verified ckpt_FULL_c5.npz. Re-chunk from
# there with verification active, then c7 at the next LR step, then the
# round-close verification (chip_check + bench).
set -u
cd "$(dirname "$0")/.."
export BANK_POOL_DIR=${BANK_POOL_DIR:-/tmp/rot_banks}

DEADLINE_TS=$(date -u -d "today ${QUEUE_DEADLINE:-06:00}" +%s)
if [ "$DEADLINE_TS" -le "$(date -u +%s)" ]; then
  DEADLINE_TS=$((DEADLINE_TS + 86400))
fi
left() { echo $(( DEADLINE_TS - $(date -u +%s) )); }

run() {
  local t=$1 name=$2; shift 2
  if [ "$(left)" -lt "$t" ]; then
    echo "=== r5e: SKIP $name (needs ${t}s, $(left)s left) ===" \
      | tee -a /tmp/chip_queue_r5.log
    return 1
  fi
  echo "=== r5e: $name start $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  timeout -k 60 "$t" "$@" >"/tmp/q5_${name}.log" 2>&1
  local rc=$?
  echo "=== r5e: $name exit=$rc $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  cp "/tmp/q5_${name}.log" "evidence/q5_${name}.log"
  git add "evidence/q5_${name}.log"
  git commit -q -m "Record on-chip ${name} log (round-5 queue)" \
    -- "evidence/q5_${name}.log" || true
  return "$rc"
}

run 4800 rot_c6v env HEAD_LR=1.2e-5 ENC_LR=1.2e-6 \
  RESUME=evidence/rot_demo/ckpt_FULL_c5.npz RESUME_CHUNK=6 N_CHUNKS=6 \
  bash scripts/rotation_full.sh

C6=$(ls -dt logs/*/*FULL_c6*/checkpoints/last 2>/dev/null | head -1)
[ -e "$C6" ] || C6=evidence/rot_demo/ckpt_FULL_c6.npz
if [ -e "$C6" ]; then
  run 4800 rot_c7 env HEAD_LR=6.1e-6 ENC_LR=6.1e-7 \
    RESUME="$C6" RESUME_CHUNK=7 N_CHUNKS=7 bash scripts/rotation_full.sh
fi

# Round-close verification (VERDICT r4 item 8).
run 1800 chip_check python scripts/chip_check.py
run 900 bench python bench.py

touch /tmp/chip_queue_r5_done
echo "=== r5e queue done $(date -u +%H:%M:%S) ===" \
  | tee -a /tmp/chip_queue_r5.log
#!/bin/bash
# Round-5 queue, part 7: data-driven LR revision. Within-chunk val
# trajectories show improvement RATE ~ proportional to head LR with no
# instability (c5 @2.4e-5: -0.016 deg/epoch over the whole chunk;
# c6f @1.2e-5: -0.0065 deg/epoch), so the planned decay to 6.1e-6 would
# crawl (-0.6 deg/chunk) while a return to ~2.3e-5 projects ~-3. Run c7
# hot, then round-close verification, then opportunistic extras.
set -u
cd "$(dirname "$0")/.."
export BANK_POOL_DIR=${BANK_POOL_DIR:-/tmp/rot_banks}

DEADLINE_TS=$(date -u -d "today ${QUEUE_DEADLINE:-06:05}" +%s)
if [ "$DEADLINE_TS" -le "$(date -u +%s)" ]; then
  DEADLINE_TS=$((DEADLINE_TS + 86400))
fi
left() { echo $(( DEADLINE_TS - $(date -u +%s) )); }

run() {
  local t=$1 name=$2; shift 2
  if [ "$(left)" -lt "$t" ]; then
    echo "=== r5g: SKIP $name (needs ${t}s, $(left)s left) ===" \
      | tee -a /tmp/chip_queue_r5.log
    return 1
  fi
  echo "=== r5g: $name start $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  timeout -k 60 "$t" "$@" >"/tmp/q5_${name}.log" 2>&1
  local rc=$?
  echo "=== r5g: $name exit=$rc $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  cp "/tmp/q5_${name}.log" "evidence/q5_${name}.log"
  git add "evidence/q5_${name}.log"
  git commit -q -m "Record on-chip ${name} log (round-5 queue)" \
    -- "evidence/q5_${name}.log" || true
  return "$rc"
}

# Wait for the orphaned c6f chunk (trainer + snapshot + eval + commits)
# to finish before claiming the chip.
while pgrep -f "rotation_full.sh" >/dev/null 2>&1; do sleep 30; done

C6=$(ls -dt logs/*/*FULL_c6*/checkpoints/last 2>/dev/null | head -1)
[ -e "$C6" ] || C6=evidence/rot_demo/ckpt_FULL_c6.npz
run 4800 rot_c7 env HEAD_LR=2.3e-5 ENC_LR=2.3e-6 \
  RESUME="$C6" RESUME_CHUNK=7 N_CHUNKS=7 bash scripts/rotation_full.sh

# Round-close verification (VERDICT r4 item 8).
run 1800 chip_check python scripts/chip_check.py
run 900 bench python bench.py

# Opportunistic: cue-boost A/B arm (one c1-equivalent chunk), then one
# more hot chunk on the main chain.
if [ "$(left)" -gt 4500 ]; then
  run 4400 boost env CUE_BOOST=1 EXP=BOOST BANK_POOL_DIR=/tmp/boost_banks \
    N_CHUNKS=1 bash scripts/rotation_full.sh
fi
C7=$(ls -dt logs/*/*FULL_c7*/checkpoints/last 2>/dev/null | head -1)
[ -e "$C7" ] || C7=evidence/rot_demo/ckpt_FULL_c7.npz
if [ -e "$C7" ] && [ "$(left)" -gt 3300 ]; then
  run 3200 rot_c8 env HEAD_LR=2.2e-5 ENC_LR=2.2e-6 CHUNK_EPOCHS=120 \
    RESUME="$C7" RESUME_CHUNK=8 N_CHUNKS=8 bash scripts/rotation_full.sh
fi

touch /tmp/chip_queue_r5_done
echo "=== r5g queue done $(date -u +%H:%M:%S) ===" \
  | tee -a /tmp/chip_queue_r5.log
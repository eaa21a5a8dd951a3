#!/bin/bash
# Round-5 queue, part 4: post-VM-restart continuation. The restart wiped
# /tmp and logs/ (third host kill of the build) but the durability fix
# held: ckpt_FULL_c5.npz + eval_FULL_c5 were already in git (chain
# 54.07 -> 36.91 -> 32.07 -> 26.44 -> 22.26 deg pooled held-out mean,
# joint 5d5cm AP 28.6). Remaining distance to the round-3 bar (<20 deg
# mean) is 2.3 deg; two more stepped-LR chunks should cross it.
#
# Order: accuracy chunks first (c6, c7), then round-close verification
# (chip_check, bench — VERDICT r4 item 8), then the cue-boost A/B arm
# only if enough time remains for all its 9000s (it is the conditional
# item: "if the curve plateaus above 20 deg" — the chain is NOT
# plateauing, so it ranks below close-out verification).
#
# c6 HEAD_LR is 1.2e-5 (not the planned 1.25e-5): the two pre-epoch-0
# stalls earlier this round were broken by perturbing the LR literal
# (busts any poisoned remote compile-cache entry while semantically
# equivalent); keep that convention for every new chunk.
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
    echo "=== r5d: SKIP $name (needs ${t}s, $(left)s left) ===" \
      | tee -a /tmp/chip_queue_r5.log
    return 1
  fi
  echo "=== r5d: $name start $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  timeout -k 60 "$t" "$@" >"/tmp/q5_${name}.log" 2>&1
  local rc=$?
  echo "=== r5d: $name exit=$rc $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  cp "/tmp/q5_${name}.log" "evidence/q5_${name}.log"
  git add "evidence/q5_${name}.log"
  git commit -q -m "Record on-chip ${name} log (round-5 queue)" \
    -- "evidence/q5_${name}.log" || true
  return "$rc"
}

C5=evidence/rot_demo/ckpt_FULL_c5.npz
run 4800 rot_c6 env HEAD_LR=1.2e-5 ENC_LR=1.2e-6 \
  RESUME="$C5" RESUME_CHUNK=6 N_CHUNKS=6 bash scripts/rotation_full.sh

C6=$(ls -dt logs/*/*FULL_c6*/checkpoints/last 2>/dev/null | head -1)
[ -e "$C6" ] || C6=evidence/rot_demo/ckpt_FULL_c6.npz
if [ -e "$C6" ]; then
  run 4800 rot_c7 env HEAD_LR=6.1e-6 ENC_LR=6.1e-7 \
    RESUME="$C6" RESUME_CHUNK=7 N_CHUNKS=7 bash scripts/rotation_full.sh
fi

# Round-close verification (fresh q5 logs; VERDICT r4 item 8).
run 1800 chip_check python scripts/chip_check.py
run 900 bench python bench.py

# Cue-boost A/B arm: from-scratch S1 + 2 HEAD chunks on the boosted
# renderer, same epochs/LR as FULL c1/c2 so committed evals compare
# directly. Only if its full slot fits before the deadline.
if [ "$(left)" -gt 9300 ]; then
  run 9000 boost env CUE_BOOST=1 EXP=BOOST BANK_POOL_DIR=/tmp/boost_banks \
    N_CHUNKS=2 bash scripts/rotation_full.sh
fi

# If time still remains after everything, keep pushing the chain.
C7=$(ls -dt logs/*/*FULL_c7*/checkpoints/last 2>/dev/null | head -1)
[ -e "$C7" ] || C7=evidence/rot_demo/ckpt_FULL_c7.npz
if [ -e "$C7" ]; then
  run 4800 rot_c8 env HEAD_LR=3.1e-6 ENC_LR=3.1e-7 \
    RESUME="$C7" RESUME_CHUNK=8 N_CHUNKS=8 bash scripts/rotation_full.sh
fi

touch /tmp/chip_queue_r5_done
echo "=== r5d queue done $(date -u +%H:%M:%S) ===" \
  | tee -a /tmp/chip_queue_r5.log
#!/bin/bash
# Round-5 queue, part 8: the chain has hit its asymptote (~21.5 val
# geodesic flat across c7's first 90 epochs at the hot LR), and the
# residual is the discrete flip tail (BASELINE round-5 analysis) — so
# the remaining chip time goes to the CUE_BOOST A/B measurement
# (VERDICT r4 item 4's deliverable: name the lever and measure it), then
# the round-close verification. c7's partial chunk self-salvages
# (snapshot + eval) via rotation_full.sh's kill path before this starts.
set -u
cd "$(dirname "$0")/.."

DEADLINE_TS=$(date -u -d "today ${QUEUE_DEADLINE:-06:10}" +%s)
if [ "$DEADLINE_TS" -le "$(date -u +%s)" ]; then
  DEADLINE_TS=$((DEADLINE_TS + 86400))
fi
left() { echo $(( DEADLINE_TS - $(date -u +%s) )); }

run() {
  local t=$1 name=$2; shift 2
  if [ "$(left)" -lt "$t" ]; then
    echo "=== r5h: SKIP $name (needs ${t}s, $(left)s left) ===" \
      | tee -a /tmp/chip_queue_r5.log
    return 1
  fi
  echo "=== r5h: $name start $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  timeout -k 60 "$t" "$@" >"/tmp/q5_${name}.log" 2>&1
  local rc=$?
  echo "=== r5h: $name exit=$rc $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  cp "/tmp/q5_${name}.log" "evidence/q5_${name}.log"
  git add "evidence/q5_${name}.log"
  git commit -q -m "Record on-chip ${name} log (round-5 queue)" \
    -- "evidence/q5_${name}.log" || true
  return "$rc"
}

# Let the orphaned c7 salvage (snapshot + eval + commits) finish first.
while ps aux | grep "[r]otation_full.sh" >/dev/null 2>&1; do sleep 20; done

# Cue-boost A/B arm: from scratch on the boosted renderer (own bank
# dir), S1 mask pretrain + ONE 200-epoch HEAD chunk = the FULL c1
# recipe, so eval_BOOST_c1 compares directly to eval_FULL_c1 (54.07).
run 4400 boost env CUE_BOOST=1 EXP=BOOST BANK_POOL_DIR=/tmp/boost_banks \
  N_CHUNKS=1 bash scripts/rotation_full.sh

# Round-close verification (VERDICT r4 item 8).
run 1700 chip_check python scripts/chip_check.py
run 800 bench python bench.py

touch /tmp/chip_queue_r5_done
echo "=== r5h queue done $(date -u +%H:%M:%S) ===" \
  | tee -a /tmp/chip_queue_r5.log
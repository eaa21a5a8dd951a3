#!/bin/bash
# On-chip work queue for TPU-tunnel return (round-3 VERDICT evidence).
# Quick measurement items FIRST so they are guaranteed evidence even if
# the session ends mid-queue, then the long from-scratch rotation
# demonstration (VERDICT r2 #1 — the VM restart that wiped /tmp and
# logs/ lost every ROT-lineage checkpoint, so the demo restarts from
# scratch via scripts/rotation_demo.sh, which encodes all the root-cause
# fixes from epoch 0).
#
#   1. bench.py                        — e2e FPS after the round-3 stem
#                                        changes (was 283.2, BENCH_r02)
#   2. scripts/chip_check.py           — extended on-chip parity (soft
#                                        voting, VP, dense LSQ; VERDICT #9)
#   3. scripts/probe_fused_laterals.py — 1x1 lateral/head fusion A/B
#                                        (VERDICT #5)
#   4. profile_train_trace.py          — stage-2 step xplane time,
#                                        <20 ms goal (VERDICT #6)
#   5. scripts/rotation_demo.sh        — two-stage from-scratch rotation
#                                        proof + seed-99 held-out eval
#                                        (VERDICT #1)
#
# Each step is independently timed out and failure-tolerant; logs land in
# /tmp/q_*.log AND are committed into evidence/ immediately (a VM restart
# wipes /tmp, so /tmp is not durable storage).
cd "$(dirname "$0")/.."
export BANK_POOL_DIR=${BANK_POOL_DIR:-/tmp/rot_banks}

run() {  # run <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== chip_queue: $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue.log
  timeout "$t" "$@" >"/tmp/q_${name}.log" 2>&1
  echo "=== chip_queue: $name exit=$? $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue.log
  tail -3 "/tmp/q_${name}.log" >> /tmp/chip_queue.log
  mkdir -p evidence
  cp "/tmp/q_${name}.log" "evidence/q_${name}.log"
  git add "evidence/q_${name}.log"
  git commit -q -m "Record on-chip ${name} log (measurement queue)" \
    -- "evidence/q_${name}.log" || true
}

run 900   bench         python bench.py
run 1800  chip_check    python scripts/chip_check.py
run 1800  probe_lateral python scripts/probe_fused_laterals.py
run 1800  stage2_trace  python scripts/profile_train_trace.py HEAD_TRAINING
run 14000 rot_demo      bash scripts/rotation_demo.sh

# Preserve the rotation-demo artifacts across VM restarts: run logs,
# training-curve plots, held-out eval outputs. Only the run dirs this
# queue invocation produced (rotation_demo.sh writes their paths into
# /tmp/rot_demo_rundirs, one per line) — not every historical DEMO dir.
mkdir -p evidence/rot_demo
if [ -f /tmp/rot_demo_rundirs ]; then
  while IFS= read -r d; do
    [ -e "$d/run.log" ] || continue
    cp "$d/run.log" "evidence/rot_demo/$(basename "$d").run.log"
    python scripts/plot_run.py "$d" \
      --out "evidence/rot_demo/$(basename "$d").curves" || true
  done < /tmp/rot_demo_rundirs
fi
cp -r /tmp/rot_demo_eval evidence/rot_demo/eval 2>/dev/null || true
git add evidence/rot_demo && git commit -q \
  -m "Record rotation-demo run logs and held-out eval" \
  -- evidence/rot_demo || true
echo "=== chip_queue: done $(date -u +%H:%M:%S) ===" | tee -a /tmp/chip_queue.log
touch /tmp/chip_queue_done

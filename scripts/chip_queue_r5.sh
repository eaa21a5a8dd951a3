#!/bin/bash
# Round-5 chip queue. Sequential single-chip work, committed per step:
#   1. dispatch probes (VERDICT #6): scan8 divides per-dispatch host cost
#      by 8; tinyout bounds output-fetch — attributes the ~0.9 ms/iter
#      e2e residual between 332 FPS measured and 364-367 FPS device-bound.
#   2. stage-2 step attribution (VERDICT #5): the cancelled
#      HEAD_TRAINING nodense A/B + a trace with TRAINED weights (bounded
#      adaptive-RANSAC iterations) — completes the 40.5 ms three-way table.
#   3. FULL chain continuation c4-c6 with stepped LR (5e-5, 2.5e-5,
#      1.25e-5): each chunk restarts the optimizer at the CLI LR, so the
#      c1-c3 chain never decayed — this replays the dead DEMO_S3 run's
#      plateau-decay trajectory across chunks (VERDICT #2, <20 deg bar).
#   4. cue-ceiling A/B (VERDICT #4): CUE_BOOST=1 from-scratch arm
#      (tri-axis stripe carriers + octant marker, data/synthetic.py) at
#      equal epochs vs the committed FULL c1/c2 evals.
#   5. round close (VERDICT #8): chip_check + bench.
# Launch DETACHED (setsid nohup) — the previous session's FULL_c4 died
# with its session. Steps are skipped, not queued, when the remaining
# wall before QUEUE_DEADLINE is under the step's timeout, so the close
# steps always run. rotation_full.sh commits snapshots+evals per chunk.
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
    echo "=== r5: SKIP $name (needs ${t}s, $(left)s left) ===" \
      | tee -a /tmp/chip_queue_r5.log
    return 1
  fi
  echo "=== r5: $name start $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  timeout -k 60 "$t" "$@" >"/tmp/q5_${name}.log" 2>&1
  local rc=$?
  echo "=== r5: $name exit=$rc $(date -u +%H:%M:%S) ===" \
    | tee -a /tmp/chip_queue_r5.log
  cp "/tmp/q5_${name}.log" "evidence/q5_${name}.log"
  git add "evidence/q5_${name}.log"
  git commit -q -m "Record on-chip ${name} log (round-5 queue)" \
    -- "evidence/q5_${name}.log" || true
  return "$rc"
}

# --- 1+2: short probes ---
run 1500 dispatch python scripts/probe_dispatch.py
run 1500 stage2_nodense \
  python scripts/profile_train_trace.py HEAD_TRAINING nodense
run 1500 stage2_trained python scripts/profile_train_trace.py \
  HEAD_TRAINING ckpt=evidence/rot_demo/ckpt_FULL_c3.npz

# --- 3: FULL continuation, stepped LR ---
C3_LAST=$(ls -dt logs/*/*FULL_c3*/checkpoints/last 2>/dev/null | head -1)
[ -e "$C3_LAST" ] || C3_LAST=evidence/rot_demo/ckpt_FULL_c3.npz
run 4200 rot_c4 env HEAD_LR=5e-5 ENC_LR=5e-6 \
  RESUME="$C3_LAST" RESUME_CHUNK=4 N_CHUNKS=4 bash scripts/rotation_full.sh
R4=$(ls -dt logs/*/*FULL_c4*/checkpoints/last 2>/dev/null | head -1)
[ -e "$R4" ] || R4=evidence/rot_demo/ckpt_FULL_c4.npz
if [ -e "$R4" ]; then
  run 4200 rot_c5 env HEAD_LR=2.5e-5 ENC_LR=2.5e-6 \
    RESUME="$R4" RESUME_CHUNK=5 N_CHUNKS=5 bash scripts/rotation_full.sh
fi
R5=$(ls -dt logs/*/*FULL_c5*/checkpoints/last 2>/dev/null | head -1)
[ -e "$R5" ] || R5=evidence/rot_demo/ckpt_FULL_c5.npz
if [ -e "$R5" ]; then
  run 4200 rot_c6 env HEAD_LR=1.25e-5 ENC_LR=1.25e-6 \
    RESUME="$R5" RESUME_CHUNK=6 N_CHUNKS=6 bash scripts/rotation_full.sh
fi

# --- 4: cue-ceiling A/B arm (from scratch; own bank dir — banks are
# renderer-specific). S1 mask pretrain + 2 HEAD chunks at the SAME
# epochs/LR as FULL c1/c2 so the committed evals compare directly.
run 9000 boost env CUE_BOOST=1 EXP=BOOST BANK_POOL_DIR=/tmp/boost_banks \
  N_CHUNKS=2 bash scripts/rotation_full.sh

# --- 5: round close ---
run 1800 chip_check python scripts/chip_check.py
run 900 bench python bench.py

touch /tmp/chip_queue_r5_done
echo "=== r5 queue done $(date -u +%H:%M:%S) ===" \
  | tee -a /tmp/chip_queue_r5.log

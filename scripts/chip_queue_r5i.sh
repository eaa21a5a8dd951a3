#!/bin/bash
# Round-5 queue, part 9: the boost chunk's 4400s slot expired at epoch
# 199 — training complete, durable npz salvaged (ckpt_BOOST_c1.npz,
# committed), but the in-script held-out eval never ran. Run it on the
# chip after the close-out verification finishes (seed-99 under the
# BOOST renderer, matching the arm's training distribution) and commit
# eval_BOOST_c1 for the A/B table.
set -u
cd "$(dirname "$0")/.."

DEADLINE_TS=$(date -u -d "today ${QUEUE_DEADLINE:-06:20}" +%s)
if [ "$DEADLINE_TS" -le "$(date -u +%s)" ]; then
  DEADLINE_TS=$((DEADLINE_TS + 86400))
fi
left() { echo $(( DEADLINE_TS - $(date -u +%s) )); }

while [ ! -f /tmp/chip_queue_r5_done ]; do sleep 20; done

if [ "$(left)" -lt 700 ]; then
  echo "=== r5i: SKIP boost_eval ($(left)s left) ===" \
    | tee -a /tmp/chip_queue_r5.log
  exit 0
fi
echo "=== r5i: boost_eval start $(date -u +%H:%M:%S) ===" \
  | tee -a /tmp/chip_queue_r5.log
OUT=/tmp/rot_eval_BOOST_c1
rm -rf "$OUT"
timeout -k 60 $(( $(left) - 120 )) \
  python -m fastposecnn_tpu.cli.evaluate --synthetic 128 \
  --synthetic_seed 99 --synthetic_pose_cues --synthetic_cue_boost \
  --IMAGE_HEIGHT 224 --IMAGE_WIDTH 320 --BATCH_SIZE 8 \
  --TRAIN_SIZE 1024 --VALID_SIZE 128 --MAX_INSTANCES 8 \
  --MAX_VOTE_POINTS 1024 --HV_NUM_OF_HYPOTHESES 128 \
  --CHECKPOINT evidence/rot_demo/ckpt_BOOST_c1.npz --output "$OUT" \
  > /tmp/q5_boost_eval.log 2>&1
rc=$?
echo "=== r5i: boost_eval exit=$rc $(date -u +%H:%M:%S) ===" \
  | tee -a /tmp/chip_queue_r5.log
cp /tmp/q5_boost_eval.log evidence/q5_boost_eval.log
if [ -d "$OUT" ] && [ -e "$OUT/raw_errors_128.npz" ]; then
  rm -rf evidence/rot_demo/eval_BOOST_c1
  cp -r "$OUT" evidence/rot_demo/eval_BOOST_c1
  git add -f evidence/rot_demo/eval_BOOST_c1
fi
git add evidence/q5_boost_eval.log
git commit -q -m "cue-boost A/B arm: held-out eval (BOOST c1, seed-99 boost renderer)" || true
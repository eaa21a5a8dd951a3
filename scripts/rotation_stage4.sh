#!/bin/bash
# Round-4 rotation stage 4: continue from the stage-3 resume's last
# checkpoint with DENSE SWING SUPERVISION for symmetric classes active
# (losses.dense_supervision + geometry.quat_swing_canonical, commit
# b44a8c7). Stage 3's two worst held-out classes were the symmetric
# bowl/can (55.6/64.0 deg geodesic at its start) whose only rotation
# signal was the sparse matched QLoss; this stage gives them a dense,
# metric-consistent target. Then a held-out seed-99 eval into
# evidence/rot_demo/eval_s4.
#
# SMOKE=1 runs the identical script tiny on CPU (seeds its own resume
# point) so the chip never executes this path first.
set -euo pipefail
cd "$(dirname "$0")/.."

BANK_POOL_DIR=${BANK_POOL_DIR:-}
POOL_ARGS=()
if [ -n "$BANK_POOL_DIR" ]; then
  POOL_ARGS=(--bank_pool_dir "$BANK_POOL_DIR")
fi

if [ "${SMOKE:-0}" = "1" ]; then
  NUM_SCENES=${NUM_SCENES:-8}; H=${H:-64}; W=${W:-64}; BS=${BS:-2}
  TRAIN_SIZE=${TRAIN_SIZE:-8}; VALID_SIZE=${VALID_SIZE:-4}
  VOTE_POINTS=${VOTE_POINTS:-128}; HYP=${HYP:-32}
  S4_EPOCHS=${S4_EPOCHS:-2}; RESTAGE=${RESTAGE:-1}
  EVAL_SCENES=${EVAL_SCENES:-4}; TICK_S=${TICK_S:-5}
  EXP=${EXP:-SMKW}; TICK_DEST=${TICK_DEST:-/tmp/smk_evidence}
  python -m fastposecnn_tpu.cli.train -e "${EXP}_SEED" \
    --preset HEAD_TRAINING --synthetic "$NUM_SCENES" --synthetic_pose_cues \
    --IMAGE_HEIGHT "$H" --IMAGE_WIDTH "$W" --BATCH_SIZE "$BS" \
    --TRAIN_SIZE "$TRAIN_SIZE" --VALID_SIZE "$VALID_SIZE" \
    --MAX_INSTANCES 8 --MAX_VOTE_POINTS "$VOTE_POINTS" \
    --HV_NUM_OF_HYPOTHESES "$HYP" --stage_on_device \
    --restage_every "$RESTAGE" --epochs 2 --no_tb
  RESUME=$(ls -dt logs/*/*"${EXP}"_SEED* | head -1)/checkpoints/last
else
  NUM_SCENES=${NUM_SCENES:-1024}; H=${H:-224}; W=${W:-320}; BS=${BS:-8}
  TRAIN_SIZE=${TRAIN_SIZE:-1024}; VALID_SIZE=${VALID_SIZE:-128}
  VOTE_POINTS=${VOTE_POINTS:-1024}; HYP=${HYP:-128}
  # 800 (not 1000): the round's wall budget ends ~40 min after this
  # stage is expected to start; the held-out eval must fit inside it.
  S4_EPOCHS=${S4_EPOCHS:-800}; RESTAGE=${RESTAGE:-10}
  EVAL_SCENES=${EVAL_SCENES:-128}; TICK_S=${TICK_S:-600}
  EXP=${EXP:-DEMO}; TICK_DEST=${TICK_DEST:-evidence/rot_demo}
  # Newest stage-3 run's last checkpoint.
  RESUME=${RESUME:-$(ls -dt logs/*/*DEMO_S3* | head -1)/checkpoints/last}
fi

SIZE_ARGS=(--IMAGE_HEIGHT "$H" --IMAGE_WIDTH "$W" --BATCH_SIZE "$BS"
  --TRAIN_SIZE "$TRAIN_SIZE" --VALID_SIZE "$VALID_SIZE" --MAX_INSTANCES 8
  --MAX_VOTE_POINTS "$VOTE_POINTS" --HV_NUM_OF_HYPOTHESES "$HYP")
DENSE_ARGS=(--DENSE_QUAT_WEIGHT 1.0 --DENSE_XY_WEIGHT 1.0
  --DENSE_Z_WEIGHT 1.0 --DENSE_SCALES_WEIGHT 1.0)
STAGED_ARGS=(--stage_on_device --restage_every "$RESTAGE"
  --CKPT_SAVE_FREQUENCY 50)

python -m fastposecnn_tpu.cli.train -e "${EXP}_S4" --preset HEAD_TRAINING \
  --synthetic "$NUM_SCENES" --synthetic_pose_cues "${SIZE_ARGS[@]}" \
  "${DENSE_ARGS[@]}" "${STAGED_ARGS[@]}" "${POOL_ARGS[@]}" \
  --epochs "$S4_EPOCHS" \
  --LEARNING_RATE 1e-4 --ENCODER_LEARNING_RATE 1e-5 \
  --resume "$RESUME" &
TRAIN_PID=$!
bash scripts/evidence_ticker.sh "logs/*/*${EXP}_S4*" "$TICK_S" "$TRAIN_PID" \
  "$TICK_DEST" &
TICKER_PID=$!
wait "$TRAIN_PID"
wait "$TICKER_PID" || true

S4=$(ls -dt logs/*/*"${EXP}"_S4* | head -1)
printf '%s\n' "$S4" > /tmp/rot_demo_rundirs

# Fresh output dir: the evaluate CLI's phase-A stale-results skip would
# silently reuse a prior run's npz of the same scene count.
rm -rf /tmp/rot_demo_eval_s4
python -m fastposecnn_tpu.cli.evaluate --synthetic "$EVAL_SCENES" \
  --synthetic_seed 99 --synthetic_pose_cues "${SIZE_ARGS[@]}" \
  --CHECKPOINT "$S4/checkpoints/best" --output /tmp/rot_demo_eval_s4
if [ "${SMOKE:-0}" != "1" ]; then
  mkdir -p evidence/rot_demo
  cp -r /tmp/rot_demo_eval_s4 evidence/rot_demo/eval_s4
  # -f: *.npz is gitignored but the raw errors ARE the evidence.
  git add evidence/rot_demo && git add -f evidence/rot_demo/eval_s4 && \
    git commit -q \
    -m "rotation stage 4 (swing supervision): held-out seed-99 eval" \
    -- evidence/rot_demo || true
fi

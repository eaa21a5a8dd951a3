#!/bin/bash
# Round-4 rotation push (round-3 VERDICT next-step #2): resume the
# committed round-3 DEMO_S2 checkpoint — 400 staged epochs, geodesic
# rotation error 101.7 -> 42.0 deg and still falling ~5 deg/100 epochs —
# for S2_EPOCHS more epochs with the proven recipe (head LR 1e-4,
# encoder 1e-5, dense supervision, fresh-scene restaging) and the new
# trace-derived staged plateau defaults (patience 50 / factor 0.5, see
# tests/test_plateau_staged.py) so a genuine late plateau now decays the
# LR instead of idling. Then a held-out seed-99 eval (never in any
# training bank).
#
# Incremental evidence (VERDICT #3): scripts/evidence_ticker.sh commits
# run.log + curves into evidence/rot_demo/ every TICK_S seconds, so a
# mid-run VM kill still leaves committed curves.
#
# SMOKE=1 runs the identical script tiny on CPU first (fresh 2-epoch
# stage-1 ckpt as the resume point) so the full chip window is never the
# first execution of this code path.
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
  S2_EPOCHS=${S2_EPOCHS:-2}; RESTAGE=${RESTAGE:-1}
  EVAL_SCENES=${EVAL_SCENES:-4}; TICK_S=${TICK_S:-5}
  EXP=${EXP:-SMKR}; TICK_DEST=${TICK_DEST:-/tmp/smk_evidence}
  # No committed smoke-size checkpoint exists: make one (2 quick epochs).
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
  S2_EPOCHS=${S2_EPOCHS:-1000}; RESTAGE=${RESTAGE:-10}
  EVAL_SCENES=${EVAL_SCENES:-128}; TICK_S=${TICK_S:-600}
  EXP=${EXP:-DEMO}; TICK_DEST=${TICK_DEST:-evidence/rot_demo}
  # The committed round-3 stage-2 run dir (step 63104 = epoch 400).
  RESUME=${RESUME:-logs/26-08-19/04-30-DEMO_S2-PoseRegressor-CAMERA-resnet18-imagenet/checkpoints/last}
fi

SIZE_ARGS=(--IMAGE_HEIGHT "$H" --IMAGE_WIDTH "$W" --BATCH_SIZE "$BS"
  --TRAIN_SIZE "$TRAIN_SIZE" --VALID_SIZE "$VALID_SIZE" --MAX_INSTANCES 8
  --MAX_VOTE_POINTS "$VOTE_POINTS" --HV_NUM_OF_HYPOTHESES "$HYP")
DENSE_ARGS=(--DENSE_QUAT_WEIGHT 1.0 --DENSE_XY_WEIGHT 1.0
  --DENSE_Z_WEIGHT 1.0 --DENSE_SCALES_WEIGHT 1.0)
STAGED_ARGS=(--stage_on_device --restage_every "$RESTAGE"
  --CKPT_SAVE_FREQUENCY 50)

# Stage 3: continue full-pipeline training from the resume point.
python -m fastposecnn_tpu.cli.train -e "${EXP}_S3" --preset HEAD_TRAINING \
  --synthetic "$NUM_SCENES" --synthetic_pose_cues "${SIZE_ARGS[@]}" \
  "${DENSE_ARGS[@]}" "${STAGED_ARGS[@]}" "${POOL_ARGS[@]}" \
  --epochs "$S2_EPOCHS" \
  --LEARNING_RATE 1e-4 --ENCODER_LEARNING_RATE 1e-5 \
  --resume "$RESUME" &
TRAIN_PID=$!
bash scripts/evidence_ticker.sh "logs/*/*${EXP}_S3*" "$TICK_S" "$TRAIN_PID" \
  "$TICK_DEST" &
TICKER_PID=$!
wait "$TRAIN_PID"
wait "$TICKER_PID" || true

S3=$(ls -dt logs/*/*"${EXP}"_S3* | head -1)
printf '%s\n' "$S3" > /tmp/rot_demo_rundirs

# Held-out eval (seed 99 never appears in any training bank: train banks
# use seeds 0,2,3,...; valid uses 1).
python -m fastposecnn_tpu.cli.evaluate --synthetic "$EVAL_SCENES" \
  --synthetic_seed 99 --synthetic_pose_cues "${SIZE_ARGS[@]}" \
  --CHECKPOINT "$S3/checkpoints/best" --output /tmp/rot_demo_eval
if [ "${SMOKE:-0}" != "1" ]; then  # smoke artifacts are never evidence
  mkdir -p evidence/rot_demo
  cp -r /tmp/rot_demo_eval evidence/rot_demo/eval_s3
  # -f: *.npz is gitignored but the raw errors ARE the evidence.
  git add evidence/rot_demo && git add -f evidence/rot_demo/eval_s3 && \
    git commit -q \
    -m "rotation resume: held-out seed-99 eval after ${EXP}_S3" \
    -- evidence/rot_demo || true
fi

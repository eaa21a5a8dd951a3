#!/bin/bash
# Round-4 rotation stage 5b: like stage 5 (full sym quat dense targets,
# resumed from the DEMO_S3 best checkpoint) but with the encoder and
# every non-rotation branch FROZEN. Stage-5 chunk-1 evidence: unfrozen
# full-quat targets on the symmetric pixels knocked pooled val geodesic
# 24.8 -> ~40 deg within ONE epoch at head LR 5e-5 — the symmetric
# classes' new gradient shifts the shared features and damages the
# converged non-symmetric heads (same failure mode as stage 4's full-LR
# resume). Freezing everything but rotation_decoder/rotation_head makes
# that damage impossible by construction: only the rotation branch can
# move, and it alone must extract the twist from the (frozen) encoder
# features, which carry the pose-cue NOCS gradient.
#
# LR 1e-4 on the rotation branch is safe here precisely because nothing
# else trains. CHUNKED with a held-out seed-99 eval + evidence commit
# after every chunk; touch /tmp/s5b_stop to stop after the current one.
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
  CHUNK_EPOCHS=${CHUNK_EPOCHS:-2}; N_CHUNKS=${N_CHUNKS:-2}
  RESTAGE=${RESTAGE:-1}
  EVAL_SCENES=${EVAL_SCENES:-4}; TICK_S=${TICK_S:-5}
  EXP=${EXP:-SMKF}; TICK_DEST=${TICK_DEST:-/tmp/smk_evidence}
  EVID_DEST=${EVID_DEST:-/tmp/smk_evidence}
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
  CHUNK_EPOCHS=${CHUNK_EPOCHS:-250}; N_CHUNKS=${N_CHUNKS:-4}
  RESTAGE=${RESTAGE:-10}
  EVAL_SCENES=${EVAL_SCENES:-128}; TICK_S=${TICK_S:-600}
  EXP=${EXP:-DEMO}; TICK_DEST=${TICK_DEST:-evidence/rot_demo}
  EVID_DEST=${EVID_DEST:-evidence/rot_demo}
  # The committed DEMO_S3 run's best checkpoint (held-out 24.9 deg mean).
  RESUME=${RESUME:-$(ls -dt logs/*/*DEMO_S3* | head -1)/checkpoints/best}
fi

# Variant knobs:
#   TAG        chunk-name / eval-dir tag (default S5b)
#   LR/ENC_LR  learning rates (default 1e-4 / 0-equivalent: encoder frozen)
#   EXTRA_TRAIN_ARGS  word-split extra CLI flags (default: the freezes)
#   STOP_FILE  stop after current chunk when this file exists
TAG=${TAG:-S5b}
LR=${LR:-1e-4}; ENC_LR=${ENC_LR:-2e-6}
STOP_FILE=${STOP_FILE:-/tmp/s5b_stop}
EXTRA_TRAIN_ARGS=${EXTRA_TRAIN_ARGS:-"--FREEZE_ENCODER true \
--FREEZE_MASK_TRAINING true --FREEZE_TRANSLATION_TRAINING true \
--FREEZE_SCALES_TRAINING true"}
read -ra EXTRA <<< "${EXTRA_TRAIN_ARGS}"
tag_lc=$(echo "$TAG" | tr '[:upper:]' '[:lower:]')

SIZE_ARGS=(--IMAGE_HEIGHT "$H" --IMAGE_WIDTH "$W" --BATCH_SIZE "$BS"
  --TRAIN_SIZE "$TRAIN_SIZE" --VALID_SIZE "$VALID_SIZE" --MAX_INSTANCES 8
  --MAX_VOTE_POINTS "$VOTE_POINTS" --HV_NUM_OF_HYPOTHESES "$HYP")
DENSE_ARGS=(--DENSE_QUAT_WEIGHT 1.0 --DENSE_XY_WEIGHT 1.0
  --DENSE_Z_WEIGHT 1.0 --DENSE_SCALES_WEIGHT 1.0
  --DENSE_SYM_QUAT_MODE full)
STAGED_ARGS=(--stage_on_device --restage_every "$RESTAGE"
  --CKPT_SAVE_FREQUENCY 50)

for i in $(seq 1 "$N_CHUNKS"); do
  NAME="${EXP}_${TAG}c${i}"
  python -m fastposecnn_tpu.cli.train -e "$NAME" --preset HEAD_TRAINING \
    --synthetic "$NUM_SCENES" --synthetic_pose_cues "${SIZE_ARGS[@]}" \
    "${DENSE_ARGS[@]}" "${STAGED_ARGS[@]}" "${POOL_ARGS[@]}" \
    --epochs "$CHUNK_EPOCHS" \
    --LEARNING_RATE "$LR" --ENCODER_LEARNING_RATE "$ENC_LR" \
    ${EXTRA[@]+"${EXTRA[@]}"} \
    --resume "$RESUME" &
  TRAIN_PID=$!
  bash scripts/evidence_ticker.sh "logs/*/*${NAME}*" "$TICK_S" "$TRAIN_PID" \
    "$TICK_DEST" &
  TICKER_PID=$!
  wait "$TRAIN_PID"
  wait "$TICKER_PID" || true

  RUN=$(ls -dt logs/*/*"${NAME}"* | head -1)
  RESUME="$RUN/checkpoints/last"

  # Fresh output dir: the evaluate CLI's phase-A stale-results skip would
  # silently reuse a prior run's npz of the same scene count.
  OUT="/tmp/rot_demo_eval_${tag_lc}c${i}"
  rm -rf "$OUT"
  python -m fastposecnn_tpu.cli.evaluate --synthetic "$EVAL_SCENES" \
    --synthetic_seed 99 --synthetic_pose_cues "${SIZE_ARGS[@]}" \
    --CHECKPOINT "$RUN/checkpoints/best" --output "$OUT"
  if [ "${SMOKE:-0}" != "1" ]; then
    mkdir -p "$EVID_DEST"
    rm -rf "$EVID_DEST/eval_${tag_lc}c${i}"
    cp -r "$OUT" "$EVID_DEST/eval_${tag_lc}c${i}"
    # -f: *.npz is gitignored but the raw errors ARE the evidence.
    git add "$EVID_DEST" && git add -f "$EVID_DEST/eval_${tag_lc}c${i}" && \
      git commit -q \
      -m "rotation stage ${TAG} chunk ${i} (full sym quat targets): held-out eval" \
      -- "$EVID_DEST" || true
  fi

  if [ -f "$STOP_FILE" ]; then
    echo "${TAG}: stop file present, ending after chunk $i"
    break
  fi
done

#!/bin/bash
# Turnkey reproduction of the round-3 rotation-learning demonstration
# (VERDICT r2 item #1). Three stages; each is resumable. Run on a real
# TPU attachment (no env overrides). See BASELINE.md "Round-3
# rotation-demo findings" for the root-cause history this encodes:
#   - pose-cue raycast scenes (class tints + NOCS gradient) so appearance
#     pins the full orientation,
#   - staged device-resident trainer with fresh-scene restaging
#     (defeats scene-bank memorization),
#   - dense per-pixel supervision with hemisphere-canonical quat targets,
#   - gradient-opaque voting (fields train densely, PVNet-style),
#   - after any run that fit sign-garbage: scripts/reinit_branch.py to
#     re-init the rotation branch, then resume at head LR 1e-4.
set -euo pipefail
cd "$(dirname "$0")/.."

# Optional persistent scene-bank pool (data/bank_pool.py): stage 1 and
# stage 2 use the identical scene config, so sharing one pool dir lets
# stage 2 adopt stage 1's already-rendered banks, and a relaunch after a
# device outage skips the ~1 min/bank render cost entirely.
BANK_POOL_DIR=${BANK_POOL_DIR:-}
POOL_ARGS=()
if [ -n "$BANK_POOL_DIR" ]; then
  POOL_ARGS=(--bank_pool_dir "$BANK_POOL_DIR")
fi

# All scale knobs are env-overridable so the IDENTICAL script can be
# smoke-tested end-to-end on CPU at tiny sizes before burning a chip
# window on it: SMOKE=1 selects a ~64x64/handful-of-scenes/2-epoch config.
if [ "${SMOKE:-0}" = "1" ]; then
  NUM_SCENES=${NUM_SCENES:-8}; H=${H:-64}; W=${W:-64}; BS=${BS:-2}
  TRAIN_SIZE=${TRAIN_SIZE:-8}; VALID_SIZE=${VALID_SIZE:-4}
  VOTE_POINTS=${VOTE_POINTS:-128}; HYP=${HYP:-32}
  S1_EPOCHS=${S1_EPOCHS:-2}; S2_EPOCHS=${S2_EPOCHS:-2}
  RESTAGE=${RESTAGE:-1}; EVAL_SCENES=${EVAL_SCENES:-4}
  # Distinct run names so a smoke run's logs/ dirs can never be picked
  # up by a concurrent/later full demo's `ls -dt logs/*/*${EXP}_S1*`.
  EXP=${EXP:-SMK}
else
  NUM_SCENES=${NUM_SCENES:-1024}; H=${H:-224}; W=${W:-320}; BS=${BS:-8}
  TRAIN_SIZE=${TRAIN_SIZE:-1024}; VALID_SIZE=${VALID_SIZE:-128}
  VOTE_POINTS=${VOTE_POINTS:-1024}; HYP=${HYP:-128}
  S1_EPOCHS=${S1_EPOCHS:-100}; S2_EPOCHS=${S2_EPOCHS:-400}
  RESTAGE=${RESTAGE:-10}; EVAL_SCENES=${EVAL_SCENES:-128}
  EXP=${EXP:-DEMO}
fi

SIZE_ARGS=(--IMAGE_HEIGHT "$H" --IMAGE_WIDTH "$W" --BATCH_SIZE "$BS"
  --TRAIN_SIZE "$TRAIN_SIZE" --VALID_SIZE "$VALID_SIZE" --MAX_INSTANCES 8
  --MAX_VOTE_POINTS "$VOTE_POINTS" --HV_NUM_OF_HYPOTHESES "$HYP")
DENSE_ARGS=(--DENSE_QUAT_WEIGHT 1.0 --DENSE_XY_WEIGHT 1.0
  --DENSE_Z_WEIGHT 1.0 --DENSE_SCALES_WEIGHT 1.0)
# Plateau LR: staged-mode defaults (patience 50 / factor 0.5, derived
# from the recorded round-3 traces — see config.STAGED_PLATEAU_PATIENCE
# and tests/test_plateau_staged.py) replace the round-3 PLATEAU_PATIENCE
# 100000 escape hatch.
STAGED_ARGS=(--stage_on_device --restage_every "$RESTAGE"
  --CKPT_SAVE_FREQUENCY 50)

# Stage 1: mask pre-training on pose-cue synthetic scenes (~0.4 s/epoch
# staged; stop when val fg-IoU plateaus, ~50-100 epochs).
python -m fastposecnn_tpu.cli.train -e "${EXP}_S1" --preset MASK_TRAINING \
  --synthetic "$NUM_SCENES" --synthetic_pose_cues "${SIZE_ARGS[@]}" \
  "${STAGED_ARGS[@]}" "${POOL_ARGS[@]}" --epochs "$S1_EPOCHS"

S1=$(ls -dt logs/*/*"${EXP}"_S1* | head -1)

# Stage 2: full pipeline training with dense supervision; head LR 1e-4
# (the reference's stage-2 1e-5 cannot move a fresh rotation branch),
# encoder at 1e-5.
python -m fastposecnn_tpu.cli.train -e "${EXP}_S2" --preset HEAD_TRAINING \
  --synthetic "$NUM_SCENES" --synthetic_pose_cues "${SIZE_ARGS[@]}" \
  "${DENSE_ARGS[@]}" "${STAGED_ARGS[@]}" "${POOL_ARGS[@]}" \
  --epochs "$S2_EPOCHS" \
  --LEARNING_RATE 1e-4 --ENCODER_LEARNING_RATE 1e-5 \
  --resume "$S1/checkpoints/best"

S2=$(ls -dt logs/*/*"${EXP}"_S2* | head -1)
# Tell chip_queue.sh exactly which run dirs this invocation produced so
# its artifact-preservation step never sweeps historical DEMO dirs.
printf '%s\n%s\n' "$S1" "$S2" > /tmp/rot_demo_rundirs

# Evaluate on HELD-OUT synthetic scenes (seed 99 never appears in any
# training bank: train banks use seeds 0,2,3,...; valid uses 1).
python -m fastposecnn_tpu.cli.evaluate --synthetic "$EVAL_SCENES" \
  --synthetic_seed 99 --synthetic_pose_cues "${SIZE_ARGS[@]}" \
  --CHECKPOINT "$S2/checkpoints/best" --output /tmp/rot_demo_eval

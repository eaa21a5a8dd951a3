#!/bin/bash
# ROT10: relaunch of the ROT9 rotation-learning run that the round-3 TPU
# tunnel outage killed at epoch 10 (BASELINE.md "ROT9: branch reinit
# unlocks rotation"). Resumes the surviving reinit checkpoint — the ROT8
# periodic ckpt with the rotation branch surgically re-initialized
# (scripts/reinit_branch.py) — on the exact ROT9 recipe. Run on a real
# TPU attachment (no env overrides).
#
# ROT9 evidence before the outage: dense quat L1 1.99 -> 1.51, matched
# QLoss 1.80 -> 1.63, geodesic rotation error 101.3 -> 85.7 deg over
# epochs 0-9 — the first monotone rotation improvement of the round.
# Since then the staged trainer also flushes `best` before every restage,
# so an outage costs at most one restage cycle.
set -euo pipefail
cd "$(dirname "$0")/.."

REINIT_CKPT=${1:-logs/26-08-17/reinit_rot_ckpt}
EPOCHS=${2:-400}

python -m fastposecnn_tpu.cli.train -e ROT10_S2 --preset HEAD_TRAINING \
  --synthetic 1024 --synthetic_pose_cues \
  --IMAGE_HEIGHT 224 --IMAGE_WIDTH 320 --BATCH_SIZE 8 \
  --TRAIN_SIZE 1024 --VALID_SIZE 128 --MAX_INSTANCES 8 \
  --MAX_VOTE_POINTS 1024 --HV_NUM_OF_HYPOTHESES 128 \
  --DENSE_QUAT_WEIGHT 1.0 --DENSE_XY_WEIGHT 1.0 \
  --DENSE_Z_WEIGHT 1.0 --DENSE_SCALES_WEIGHT 1.0 \
  --LEARNING_RATE 1e-4 --ENCODER_LEARNING_RATE 1e-5 \
  --stage_on_device --restage_every 10 --CKPT_SAVE_FREQUENCY 50 \
  --PLATEAU_PATIENCE 100000 --epochs "$EPOCHS" \
  --bank_pool_dir /tmp/rot10_banks \
  --resume "$REINIT_CKPT"

#!/bin/bash
# Round-4e: from-scratch consolidated rotation run with DURABLE snapshots.
#
# Why from scratch: the host VM restart at ~21:15 UTC destroyed every
# orbax checkpoint for the second time this build (they live under
# gitignored logs/) — including the stage-5 chunk-2 weights that were
# mid-flight at val geodesic ~22-23 deg. This script re-runs the proven
# two-stage recipe (rotation_demo.sh) with the round-4 lessons folded in
# from epoch 0, and fixes the durability hole:
#   - DENSE_SYM_QUAT_MODE=full from the start: S5 evidence shows the
#     camera-y twist of symmetric classes IS learnable from the pose-cue
#     NOCS gradient; introducing full quat targets LATE knocked converged
#     shared features (eval_s5c1), but from scratch there is no basin to
#     damage — the symmetric classes get dense rotation signal throughout.
#   - CHUNKED with, after EVERY chunk: a held-out seed-99 eval commit AND
#     an npz weight-snapshot commit (scripts/ckpt_snapshot.py), so a VM
#     kill can never again lose more than one chunk of training.
#
# Resume after a kill: RESUME=evidence/rot_demo/ckpt_<EXP>_c<K>.npz
# RESUME_CHUNK=<K+1> bash scripts/rotation_full.sh  (skips stage 1).
#
# SMOKE=1 runs the identical script tiny on CPU (including snapshot
# save/verify) so the chip never executes this path first.
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
  S1_EPOCHS=${S1_EPOCHS:-2}; CHUNK_EPOCHS=${CHUNK_EPOCHS:-2}
  N_CHUNKS=${N_CHUNKS:-2}; RESTAGE=${RESTAGE:-1}
  EVAL_SCENES=${EVAL_SCENES:-4}; TICK_S=${TICK_S:-5}
  EXP=${EXP:-SMKG}; EVID_DEST=${EVID_DEST:-/tmp/smk_evidence}
else
  NUM_SCENES=${NUM_SCENES:-1024}; H=${H:-224}; W=${W:-320}; BS=${BS:-8}
  TRAIN_SIZE=${TRAIN_SIZE:-1024}; VALID_SIZE=${VALID_SIZE:-128}
  VOTE_POINTS=${VOTE_POINTS:-1024}; HYP=${HYP:-128}
  S1_EPOCHS=${S1_EPOCHS:-100}; CHUNK_EPOCHS=${CHUNK_EPOCHS:-200}
  N_CHUNKS=${N_CHUNKS:-8}; RESTAGE=${RESTAGE:-10}
  EVAL_SCENES=${EVAL_SCENES:-128}; TICK_S=${TICK_S:-600}
  EXP=${EXP:-FULL}; EVID_DEST=${EVID_DEST:-evidence/rot_demo}
fi

# CUE_BOOST=1: tri-axis per-channel stripe carriers + corner marker
# (data/synthetic.py SceneConfig.cue_boost) — the round-5 cue-ceiling A/B
# arm. Use a SEPARATE BANK_POOL_DIR: banks are renderer-specific.
CUE_ARGS=(--synthetic_pose_cues)
if [ "${CUE_BOOST:-0}" = "1" ]; then
  CUE_ARGS+=(--synthetic_cue_boost)
fi

SIZE_ARGS=(--IMAGE_HEIGHT "$H" --IMAGE_WIDTH "$W" --BATCH_SIZE "$BS"
  --TRAIN_SIZE "$TRAIN_SIZE" --VALID_SIZE "$VALID_SIZE" --MAX_INSTANCES 8
  --MAX_VOTE_POINTS "$VOTE_POINTS" --HV_NUM_OF_HYPOTHESES "$HYP")
DENSE_ARGS=(--DENSE_QUAT_WEIGHT 1.0 --DENSE_XY_WEIGHT 1.0
  --DENSE_Z_WEIGHT 1.0 --DENSE_SCALES_WEIGHT 1.0
  --DENSE_SYM_QUAT_MODE full)
STAGED_ARGS=(--stage_on_device --restage_every "$RESTAGE"
  --CKPT_SAVE_FREQUENCY 50)

RESUME=${RESUME:-}
START_CHUNK=${RESUME_CHUNK:-1}

if [ -z "$RESUME" ]; then
  # Stage 1: mask pre-training on pose-cue synthetic scenes.
  python -m fastposecnn_tpu.cli.train -e "${EXP}_S1" \
    --preset MASK_TRAINING --synthetic "$NUM_SCENES" \
    "${CUE_ARGS[@]}" "${SIZE_ARGS[@]}" "${STAGED_ARGS[@]}" \
    "${POOL_ARGS[@]}" --epochs "$S1_EPOCHS"
  RESUME=$(ls -dt logs/*/*"${EXP}"_S1* | head -1)/checkpoints/best
fi

for i in $(seq "$START_CHUNK" "$N_CHUNKS"); do
  NAME="${EXP}_c${i}"
  SNAP="$EVID_DEST/ckpt_${EXP}_c${i}.npz"
  mkdir -p "$EVID_DEST"
  CHUNK_T0=$(date +%s)
  # Head LR 1e-4 (the reference's stage-2 1e-5 cannot move a fresh
  # rotation branch), encoder 1e-5; staged plateau defaults decay
  # within each chunk. HEAD_LR/ENC_LR env knobs: each chunk restarts
  # the optimizer at the CLI LR, so a long chain never actually decays
  # — round 5 steps the LR down across chunks (c4 5e-5, c5 2.5e-5, ...)
  # the way the dead DEMO_S3 run's 10 plateau decays did within one run.
  # timeout: a wedged tunnel client can hang FOREVER at the final
  # checkpoint write (observed FULL_c1, 00:12 UTC: epochs done, process
  # in futex_do_wait, fresh clients fine). Bound the chunk so the queue
  # still reaches the snapshot/eval of whatever checkpoints exist.
  CHUNK_TIMEOUT=${CHUNK_TIMEOUT:-$((CHUNK_EPOCHS * 15 + 1800))}
  timeout -k 60 "$CHUNK_TIMEOUT" \
    python -m fastposecnn_tpu.cli.train -e "$NAME" --preset HEAD_TRAINING \
    --synthetic "$NUM_SCENES" "${CUE_ARGS[@]}" "${SIZE_ARGS[@]}" \
    "${DENSE_ARGS[@]}" "${STAGED_ARGS[@]}" "${POOL_ARGS[@]}" \
    --epochs "$CHUNK_EPOCHS" \
    --LEARNING_RATE "${HEAD_LR:-1e-4}" \
    --ENCODER_LEARNING_RATE "${ENC_LR:-1e-5}" \
    --snapshot_npz "$SNAP" \
    --resume "$RESUME" &
  TRAIN_PID=$!
  bash scripts/evidence_ticker.sh "logs/*/*${NAME}*" "$TICK_S" \
    "$TRAIN_PID" "$EVID_DEST" &
  TICKER_PID=$!
  wait "$TRAIN_PID" || echo "rotation_full: chunk $i trainer exited" \
    "nonzero (timeout/kill?) — salvaging checkpoints"
  wait "$TICKER_PID" || true

  RUN=$(ls -dt logs/*/*"${NAME}"* | head -1)
  # A trainer killed mid-write may leave no `last`; chain from the
  # newest checkpoint that exists (best flushes every restage).
  RESUME="$RUN/checkpoints/last"
  [ -e "$RESUME" ] || RESUME="$RUN/checkpoints/best"
  [ -e "$RESUME" ] || { echo "rotation_full: chunk $i left no" \
    "checkpoint, stopping"; break; }

  # Durable weight snapshot of this chunk's best, committed to git. The
  # trainer now writes $SNAP itself on the best-flush cadence and once
  # more at the end (--snapshot_npz) — only fall back to the ~4-min
  # ckpt_snapshot.py jax-import if the in-run snapshot never appeared
  # (e.g. the trainer was killed before the first best flush).
  if [ ! -f "$SNAP" ] || \
     [ "$(stat -c %Y "$SNAP")" -lt "$CHUNK_T0" ]; then
    python scripts/ckpt_snapshot.py save "$RUN/checkpoints/best" "$SNAP" \
      || { echo "rotation_full: snapshot of chunk $i failed"; SNAP=""; }
  fi
  case "$EVID_DEST" in
    evidence/*)
      # -f: *.npz is gitignored, but the weights ARE the evidence.
      [ -n "$SNAP" ] && { git add -f "$SNAP" && git commit -q \
        -m "durable weight snapshot: ${EXP} chunk ${i} best" \
        -- "$SNAP" || true; }
      ;;
  esac

  # Held-out eval (seed 99 never appears in any training bank). Fresh
  # output dir: phase-A stale-results skip would reuse a prior npz.
  OUT="/tmp/rot_eval_${EXP}_c${i}"
  rm -rf "$OUT"
  timeout -k 60 2400 \
    python -m fastposecnn_tpu.cli.evaluate --synthetic "$EVAL_SCENES" \
    --synthetic_seed 99 "${CUE_ARGS[@]}" "${SIZE_ARGS[@]}" \
    --CHECKPOINT "$RUN/checkpoints/best" --output "$OUT" \
    || echo "rotation_full: eval of chunk $i failed, continuing"
  case "$EVID_DEST" in
    evidence/*)
      rm -rf "$EVID_DEST/eval_${EXP}_c${i}"
      cp -r "$OUT" "$EVID_DEST/eval_${EXP}_c${i}"
      git add "$EVID_DEST" && git add -f "$EVID_DEST/eval_${EXP}_c${i}" \
        && git commit -q \
        -m "rotation ${EXP} chunk ${i} (from-scratch full recipe): held-out eval" \
        -- "$EVID_DEST" || true
      ;;
  esac

  if [ -f /tmp/rot_full_stop ]; then
    echo "rotation_full: stop file present, ending after chunk $i"
    break
  fi
done

"""Hyperparameter presets + CLI reflection.

Parity: FPC/config.py (class-inheritance argparse.Namespace presets:
DEFAULT_POSE_HPARAM / MASK_TRAINING / HEAD_TRAINING / EVALUATING / INFERENCE)
and the auto-generated --FLAG overrides (FPC/train.py:102-112). Here presets
are dataclass factories and `add_cli_overrides`/`parse_overrides` reflect
every field into argparse with types inferred from defaults, exactly like
the reference's loop.

Checkpoint merge semantics (`merge_from_checkpoint`) mirror
FPC/lib/pose_regressor.py:516-522: architecture-defining fields travel with
the weights; everything else comes from the active preset/CLI.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
from typing import Optional, Tuple

# Architecture-defining fields restored from a checkpoint
# (FPC/lib/pose_regressor.py:521).
ARCH_FIELDS = (
    "MODEL",
    "BACKBONE_ARCH",
    "ENCODER",
    "ENCODER_WEIGHTS",
    "SELECTED_CLASSES",
)


@dataclasses.dataclass
class HParams:
    # Experiment identification (FPC/config.py:13-17)
    EXPERIMENT_NAME: str = "TESTING"
    DEBUG: bool = False
    DETERMINISTIC: bool = False
    RUNTIME_TIMING: bool = False

    CHECKPOINT: Optional[str] = None

    # Model specification (FPC/config.py:26-31)
    MODEL: str = "PoseRegressor"
    DATASET_NAME: str = "CAMERA"
    SELECTED_CLASSES: Tuple[str, ...] = (
        "bg", "bottle", "bowl", "camera", "can", "laptop", "mug",
    )
    CKPT_SAVE_FREQUENCY: int = 2

    # Run specification (FPC/config.py:33-41)
    BATCH_SIZE: int = 3
    NUM_WORKERS: int = 4
    NUM_DEVICES: int = 1  # replaces NUM_GPUS; devices in the jax mesh
    NUM_TP: int = 1  # tensor-parallel factor inside the mesh (dp = N/tp);
    # conv channels + optimizer moments shard over 'tp' (shard_state_tp)
    TRAIN_SIZE: Optional[int] = 100
    VALID_SIZE: Optional[int] = 20

    # Optimization (FPC/config.py:55-60)
    WEIGHT_DECAY: float = 0.0003
    LEARNING_RATE: float = 0.0001 / 10
    ENCODER_LEARNING_RATE: float = 0.00005 / 10
    NUM_EPOCHS: int = 50
    GRADIENT_CLIP_VAL: float = 0.15  # FPC/train.py:326
    # ReduceLROnPlateau knobs (reference defaults hard-coded in
    # FPC/lib/pose_regressor.py:417-438: patience 2, factor 0.25); exposed
    # because with cheap staged epochs a noisy val loss can collapse the
    # LR before learning starts (round-3 rotation run, BASELINE.md).
    PLATEAU_PATIENCE: int = 2
    PLATEAU_FACTOR: float = 0.25
    PLATEAU_MIN_SCALE: float = 1e-4

    # Loss weights (FPC/config.py:62-70 + train.py:159-188)
    MASK_WEIGHT: float = 5.0
    QUAT_WEIGHT: float = 0.1
    XY_WEIGHT: float = 0.01
    Z_WEIGHT: float = 0.1
    SCALES_WEIGHT: float = 0.1
    XYLOSS_TYPE: str = "L1"
    ZLOSS_TYPE: str = "L1"
    SCALESLOSS_TYPE: str = "L1"

    # Dense (per-pixel) auxiliary supervision over GT instance masks — a
    # beyond-reference addition (the reference trains quat/xy/z/scales only
    # through ~N-per-image matched-instance losses; PVNet, from which the
    # voting comes, trains its vertex field densely). 0.0 == reference
    # parity (off). When on, each head also gets a masked L1 on the dense
    # field at the GT class channels: quat vs the instance quaternion, xy
    # vs unit vectors to the instance center, z vs log-depth, scales vs
    # the normalized scales. See losses.dense_supervision.
    #
    # NOTE: voting is gradient-opaque (PARITY.md deliberate deviation), so
    # DENSE_XY_WEIGHT is the only gradient path into the xy vote field —
    # the HEAD_TRAINING preset enables it; task.py warns if a stage-2
    # config leaves it at 0 with hough voting on.
    DENSE_QUAT_WEIGHT: float = 0.0
    DENSE_XY_WEIGHT: float = 0.0
    DENSE_Z_WEIGHT: float = 0.0
    DENSE_SCALES_WEIGHT: float = 0.0
    # Dense quaternion target for SYMMETRIC instances (bottle/bowl/can):
    #   "swing"   — zero-twist representative (geometry.quat_swing_canonical):
    #               metric-consistent with the reference's symmetric degree
    #               metrics, which forgive camera-y twist. Right when the
    #               twist is genuinely unobservable (real NOCS imagery).
    #   "full"    — raw hemisphere-canonical GT quat, same as non-symmetric
    #               classes. Right when the renderer paints twist-revealing
    #               texture (synthetic.py render_pose_cues NOCS-colored
    #               cuboids make the full rotation observable for EVERY
    #               class) and the goal is the honest geodesic metric,
    #               which does NOT forgive twist.
    #   "exclude" — no dense quat term on symmetric instances (round-3
    #               behavior; their only rotation signal is the matched
    #               QLoss, which is twist-forgiving for them).
    DENSE_SYM_QUAT_MODE: str = "swing"

    # Regression-head bias inits (models/pose_regressor.py): start the z /
    # scales heads at the target distribution's center. 0.0 == reference
    # parity (zero-bias xavier heads). Recommended for training from
    # scratch: HEAD_Z_BIAS_INIT ~= 7.0 (mean log z_mm on NOCS),
    # HEAD_SCALES_BIAS_INIT ~= mean normalized scale.
    HEAD_Z_BIAS_INIT: float = 0.0
    HEAD_SCALES_BIAS_INIT: float = 0.0

    # Freezing (FPC/config.py:72-77)
    FREEZE_ENCODER: bool = False
    FREEZE_MASK_TRAINING: bool = False
    FREEZE_ROTATION_TRAINING: bool = False
    FREEZE_TRANSLATION_TRAINING: bool = False
    FREEZE_SCALES_TRAINING: bool = False

    # Algorithmic stage gates (FPC/config.py:79-83)
    PERFORM_AGGREGATION: bool = True
    PERFORM_HOUGH_VOTING: bool = True
    PERFORM_RT_CALCULATION: bool = True
    PERFORM_MATCHING: bool = True

    # Architecture (FPC/config.py:85-88)
    BACKBONE_ARCH: str = "FPN"
    ENCODER: str = "resnet18"
    ENCODER_WEIGHTS: Optional[str] = "imagenet"

    # Hough voting (FPC/config.py:90-105)
    HV_NUM_OF_HYPOTHESES: int = 128
    HV_ADAPTIVE: bool = True  # False: single fixed-budget vote (TPU serving)
    HV_IMPLEMENTATION: str = "ransac"  # or "soft" (weighted-mean + pruning)
    HV_REFINE: str = "dense"  # all-pixel LSQ (reference) | "sampled" (faster)
    HV_HYPOTHESIS_IN_MASK_MULTIPLIER: int = 3
    PRUN_METHOD: str = "iqr"
    PRUN_OUTLIER_DROP: bool = False
    PRUN_OUTLIER_REPLACEMENT_STYLE: str = "median"
    PRUN_ZSCORE_THRESHOLD: float = 1.0
    IQR_MULTIPLIER: float = 1.5

    # TPU-specific static-shape knobs (no reference equivalent: the CUDA
    # build had dynamic shapes; SURVEY.md §7 'static shapes everywhere')
    MAX_INSTANCES: int = 16
    MAX_VOTE_POINTS: int = 1024
    IMAGE_HEIGHT: int = 480
    IMAGE_WIDTH: int = 640
    COMPUTE_DTYPE: str = "bfloat16"  # network compute; params stay f32

    @property
    def num_classes(self) -> int:
        return len(self.SELECTED_CLASSES)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["SELECTED_CLASSES"] = list(self.SELECTED_CLASSES)
        return json.dumps(d, indent=2)

    @classmethod
    def from_json(cls, text: str) -> "HParams":
        d = json.loads(text)
        d["SELECTED_CLASSES"] = tuple(d["SELECTED_CLASSES"])
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def save(self, path) -> None:
        pathlib.Path(path).write_text(self.to_json())

    @classmethod
    def load(cls, path) -> "HParams":
        return cls.from_json(pathlib.Path(path).read_text())


# -----------------------------------------------------------------------------
# Presets (FPC/config.py:107-160)


def default_pose_hparam(**overrides) -> HParams:
    return dataclasses.replace(HParams(), **overrides)


def mask_training(**overrides) -> HParams:
    """Stage-1 preset: mask only, heads frozen, no instance machinery
    (FPC/config.py:108-119)."""
    base = dict(
        FREEZE_ENCODER=False,
        FREEZE_MASK_TRAINING=False,
        FREEZE_ROTATION_TRAINING=True,
        FREEZE_TRANSLATION_TRAINING=True,
        FREEZE_SCALES_TRAINING=True,
        PERFORM_AGGREGATION=False,
        PERFORM_HOUGH_VOTING=False,
        PERFORM_RT_CALCULATION=False,
        PERFORM_MATCHING=False,
    )
    base.update(overrides)
    return dataclasses.replace(HParams(), **base)


def head_training(**overrides) -> HParams:
    """Stage-2 preset: everything on (FPC/config.py:121-132).

    DENSE_XY_WEIGHT defaults ON here: voting is gradient-opaque in this
    framework (deliberate deviation, PARITY.md "training dynamics" — the
    reference differentiated through its LSQ refinement, which measurably
    poisons the field, BASELINE.md root cause #4), so dense supervision is
    the ONLY gradient path into the xy vote field. With it at 0 the
    matched XYLoss is logged but trains nothing.
    """
    base = dict(
        PERFORM_AGGREGATION=True,
        PERFORM_HOUGH_VOTING=True,
        PERFORM_RT_CALCULATION=True,
        PERFORM_MATCHING=True,
        DENSE_XY_WEIGHT=1.0,
    )
    base.update(overrides)
    return dataclasses.replace(HParams(), **base)


def evaluating(**overrides) -> HParams:
    """Evaluation preset (FPC/config.py:135-144)."""
    base = dict(
        TRAIN_SIZE=1,
        VALID_SIZE=10_000,
        HV_NUM_OF_HYPOTHESES=1000,
        PERFORM_AGGREGATION=True,
        PERFORM_HOUGH_VOTING=True,
        PERFORM_RT_CALCULATION=True,
        PERFORM_MATCHING=True,
    )
    base.update(overrides)
    return dataclasses.replace(HParams(), **base)


def inference(**overrides) -> HParams:
    """Real-time inference preset (FPC/config.py:147-160)."""
    base = dict(
        # TPU serving mode: one fixed 4096-hypothesis vote instead of the
        # adaptive loop (quality >= the loop's typical confident-exit budget
        # of 1000; deterministic latency). EVALUATING keeps the adaptive
        # reference behavior for parity evals.
        HV_NUM_OF_HYPOTHESES=4096,
        HV_ADAPTIVE=False,
        BATCH_SIZE=1,
        VALID_SIZE=100,
        TRAIN_SIZE=1,
        RUNTIME_TIMING=True,
        PERFORM_AGGREGATION=True,
        PERFORM_HOUGH_VOTING=True,
        PERFORM_RT_CALCULATION=True,
        PERFORM_MATCHING=True,
    )
    base.update(overrides)
    return dataclasses.replace(HParams(), **base)


PRESETS = {
    "DEFAULT": default_pose_hparam,
    "MASK_TRAINING": mask_training,
    "HEAD_TRAINING": head_training,
    "EVALUATING": evaluating,
    "INFERENCE": inference,
}


# -----------------------------------------------------------------------------
# CLI reflection (FPC/train.py:102-112)


def add_cli_overrides(parser: argparse.ArgumentParser, hp: HParams) -> None:
    """Turn every HParams field into a --FIELD flag with inferred type."""
    for f in dataclasses.fields(hp):
        default = getattr(hp, f.name)
        if isinstance(default, bool):
            parser.add_argument(
                f"--{f.name}",
                type=lambda s: s.lower() in ("1", "true", "yes"),
                default=None,
            )
        elif isinstance(default, tuple):
            parser.add_argument(f"--{f.name}", nargs="+", default=None)
        elif isinstance(default, int):
            parser.add_argument(f"--{f.name}", type=int, default=None)
        elif isinstance(default, float):
            parser.add_argument(f"--{f.name}", type=float, default=None)
        else:
            parser.add_argument(f"--{f.name}", type=str, default=None)


# Staged-mode ReduceLROnPlateau defaults. The reference's hard-coded
# patience=2 / factor=0.25 (FPC/lib/pose_regressor.py:417-438) assumes an
# "epoch" is a full pass over the real dataset; a device-resident staged
# epoch over a small restaged bank is ~100x cheaper and its val loss is
# noisy at restage boundaries. Replaying the committed round-3 demo traces
# (evidence/rot_demo/DEMO_S{1,2}.csv) through plateau_update shows the
# reference defaults collapse lr_scale to the 1e-4 floor by epoch 74 of
# stage 2 — while geodesic rotation error was still at ~75 deg and falling
# monotonically — whereas the longest no-improvement run during genuine
# learning is 31 epochs (stage 2) / 7 (stage 1). Patience 50 clears that
# noise run-length with margin; factor 0.5 halves instead of quartering so
# a noise-triggered decay is recoverable. Pinned by
# tests/test_plateau_staged.py replaying the recorded traces.
STAGED_PLATEAU_PATIENCE = 50
STAGED_PLATEAU_FACTOR = 0.5


def staged_plateau_defaults(
    hp: HParams, patience_explicit: bool, factor_explicit: bool
) -> HParams:
    """Swap in staged-mode plateau defaults unless the user set them.

    Called by the train CLI only for --stage_on_device with restaging;
    explicit --PLATEAU_PATIENCE/--PLATEAU_FACTOR flags always win.
    """
    updates = {}
    if not patience_explicit:
        updates["PLATEAU_PATIENCE"] = STAGED_PLATEAU_PATIENCE
    if not factor_explicit:
        updates["PLATEAU_FACTOR"] = STAGED_PLATEAU_FACTOR
    return dataclasses.replace(hp, **updates) if updates else hp


def apply_cli_overrides(hp: HParams, args: argparse.Namespace) -> HParams:
    updates = {}
    for f in dataclasses.fields(hp):
        val = getattr(args, f.name, None)
        if val is not None:
            if isinstance(getattr(hp, f.name), tuple):
                val = tuple(val)
            updates[f.name] = val
    return dataclasses.replace(hp, **updates)


def merge_from_checkpoint(hp: HParams, ckpt_hp: HParams) -> HParams:
    """Restore only architecture-defining fields from a checkpoint's hparams
    (FPC/lib/pose_regressor.py:516-522)."""
    updates = {k: getattr(ckpt_hp, k) for k in ARCH_FIELDS}
    return dataclasses.replace(hp, **updates)


def pipeline_config_from(hp: HParams, use_pallas=None):
    from fastposecnn_tpu.pipeline import PipelineConfig

    return PipelineConfig(
        perform_aggregation=hp.PERFORM_AGGREGATION,
        perform_hough_voting=hp.PERFORM_HOUGH_VOTING,
        perform_rt_calculation=hp.PERFORM_RT_CALCULATION,
        max_instances=hp.MAX_INSTANCES,
        max_points=hp.MAX_VOTE_POINTS,
        hv_num_hypotheses=hp.HV_NUM_OF_HYPOTHESES,
        hv_adaptive=hp.HV_ADAPTIVE,
        hv_implementation=hp.HV_IMPLEMENTATION,
        hv_refine=hp.HV_REFINE,
        prun_method=None if hp.PRUN_METHOD in (None, "none") else hp.PRUN_METHOD,
        prun_outlier_drop=hp.PRUN_OUTLIER_DROP,
        prun_replacement=hp.PRUN_OUTLIER_REPLACEMENT_STYLE,
        prun_zscore_threshold=hp.PRUN_ZSCORE_THRESHOLD,
        iqr_multiplier=hp.IQR_MULTIPLIER,
        hv_in_mask_multiplier=float(hp.HV_HYPOTHESIS_IN_MASK_MULTIPLIER),
        use_pallas=use_pallas,
    )

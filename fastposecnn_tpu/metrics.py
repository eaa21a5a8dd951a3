"""Streaming pose/mask metrics as pure state pytrees.

Parity: FPC/lib/metrics.py (pl.metrics.Metric subclasses with
dist_reduce_fx='sum' states) — here a metric is (init, update, compute) pure
functions over a {correct, total} / {sum, count} state dict. Cross-device
reduction is a `jax.lax.psum` over the state (see parallel/), replacing
torch.distributed all-reduce.

Deliberate fix vs reference: FPC's `DegreeError`/`Iou3dAccuracy`/
`OffsetError` update their running mean as (old + new)/2 (metrics.py:86,
171,258), an exponentially-weighted quirk; we accumulate (sum, count) for a
true mean. The thresholded AP metrics (the ones used for model selection)
match the reference exactly.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fastposecnn_tpu import geometry

Array = jax.Array
State = Dict[str, Array]


def zeros_state() -> State:
    return {"correct": jnp.zeros(()), "total": jnp.zeros(())}


def ratio(state: State, scale: float = 100.0) -> Array:
    return scale * state["correct"] / jnp.maximum(state["total"], 1.0)


def mean(state: State) -> Array:
    return state["correct"] / jnp.maximum(state["total"], 1.0)


def _accumulate(state: State, values: Array, hits: Array, valid: Array) -> State:
    valid = valid & jnp.isfinite(values)
    return {
        "correct": state["correct"] + jnp.sum(jnp.where(valid, hits, 0.0)),
        "total": state["total"] + jnp.sum(valid),
    }


# -----------------------------------------------------------------------------
# Matched pose metrics (consume gather_matched payloads)


def update_degree_error_ap(
    state: State, matched: Dict[str, Array], threshold_deg: float
) -> State:
    """DegreeErrorMeanAP (FPC/lib/metrics.py:11-50): % of matches whose
    symmetry-aware quaternion distance is below the threshold."""
    d = geometry.quat_distance_deg(
        matched["gt_quaternion"],
        matched["pred_quaternion"],
        matched["symmetric_ids"],
    )
    return _accumulate(state, d, (d < threshold_deg).astype(jnp.float32),
                       matched["valid"])


def update_degree_error_mean(state: State, matched: Dict[str, Array]) -> State:
    d = geometry.quat_distance_deg(
        matched["gt_quaternion"],
        matched["pred_quaternion"],
        matched["symmetric_ids"],
    )
    return _accumulate(state, d, d, matched["valid"])


def update_degree_error_geodesic(
    state: State, matched: Dict[str, Array]
) -> State:
    """True mean rotation angle (beyond-parity; see
    geometry.geodesic_quat_distance_deg — the reference's chord-as-radians
    metric reads random predictions as ~49 deg)."""
    d = geometry.geodesic_quat_distance_deg(
        matched["gt_quaternion"],
        matched["pred_quaternion"],
        matched["symmetric_ids"],
    )
    return _accumulate(state, d, d, matched["valid"])


def update_iou3d_ap(
    state: State, matched: Dict[str, Array], threshold: float,
    fpc_compat: bool = False,
) -> State:
    """Iou3dAP (FPC/lib/metrics.py:91-133)."""
    iou = geometry.asymmetric_3d_iou(
        matched["gt_RT"], matched["pred_RT"],
        matched["gt_scales"], matched["pred_scales"],
        fpc_compat=fpc_compat,
    )
    return _accumulate(state, iou, (iou > threshold).astype(jnp.float32),
                       matched["valid"])


def update_iou3d_mean(state: State, matched: Dict[str, Array]) -> State:
    iou = geometry.asymmetric_3d_iou(
        matched["gt_RT"], matched["pred_RT"],
        matched["gt_scales"], matched["pred_scales"],
    )
    return _accumulate(state, iou, iou * 100.0, matched["valid"])


def update_offset_ap(
    state: State, matched: Dict[str, Array], threshold_cm: float
) -> State:
    """OffsetAP (FPC/lib/metrics.py:176-219): ||gt_T - pred_T||*10 < thr."""
    err = geometry.offset_error_cm(matched["gt_T"], matched["pred_T"])
    return _accumulate(state, err, (err < threshold_cm).astype(jnp.float32),
                       matched["valid"])


def update_offset_error_mean(state: State, matched: Dict[str, Array]) -> State:
    err = geometry.offset_error_cm(matched["gt_T"], matched["pred_T"])
    return _accumulate(state, err, err, matched["valid"])


# -----------------------------------------------------------------------------
# Pixel-wise mask metrics (FPC train.py:193-197 uses pl dice/iou/f1)


def mask_scores(
    pred_mask: Array,
    gt_mask: Array,
    num_classes: int,
    sample_valid: Array | None = None,
) -> Dict[str, Array]:
    """Micro-averaged dice / IoU / F1 over foreground classes.

    `sample_valid` [B] excludes padded samples of a short final batch
    (zero image + background mask would otherwise inflate accuracy and
    deflate nothing — the padding is trivially 'correct')."""
    scores = {}
    if sample_valid is None:
        sv = jnp.ones(pred_mask.shape[:1], bool)
    else:
        sv = sample_valid.astype(bool)
    svp = sv.reshape(sv.shape + (1,) * (pred_mask.ndim - 1))
    tp = fp = fn = 0.0
    for c in range(1, num_classes):
        p = (pred_mask == c) & svp
        g = (gt_mask == c) & svp
        tp = tp + jnp.sum(p & g)
        fp = fp + jnp.sum(p & ~g)
        fn = fn + jnp.sum(~p & g)
    dice = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1)
    iou = tp / jnp.maximum(tp + fp + fn, 1)
    scores["dice"] = dice
    scores["iou"] = iou
    scores["f1"] = dice  # micro-F1 == dice
    correct = jnp.sum(((pred_mask == gt_mask) & svp).astype(jnp.float32))
    denom = jnp.sum(sv) * np.prod(pred_mask.shape[1:])
    scores["accuracy"] = correct / jnp.maximum(denom, 1.0)
    return scores


# -----------------------------------------------------------------------------
# Metric bank: the standard training-time suite (FPC train.py:211-218)


def init_pose_metric_bank() -> Dict[str, State]:
    return {
        "degree_error": zeros_state(),
        "degree_error_geodesic": zeros_state(),
        "degree_error_AP_5": zeros_state(),
        "iou_3d_mAP_0.25": zeros_state(),
        "iou_3d_accuracy": zeros_state(),
        "offset_error_AP_5cm": zeros_state(),
        "offset_error": zeros_state(),
    }


def update_pose_metric_bank(
    bank: Dict[str, State], matched: Dict[str, Array]
) -> Dict[str, State]:
    return {
        "degree_error": update_degree_error_mean(bank["degree_error"], matched),
        "degree_error_geodesic": update_degree_error_geodesic(
            bank["degree_error_geodesic"], matched
        ),
        "degree_error_AP_5": update_degree_error_ap(
            bank["degree_error_AP_5"], matched, 5.0
        ),
        "iou_3d_mAP_0.25": update_iou3d_ap(bank["iou_3d_mAP_0.25"], matched, 0.25),
        "iou_3d_accuracy": update_iou3d_mean(bank["iou_3d_accuracy"], matched),
        "offset_error_AP_5cm": update_offset_ap(
            bank["offset_error_AP_5cm"], matched, 5.0
        ),
        "offset_error": update_offset_error_mean(bank["offset_error"], matched),
    }


def compute_pose_metric_bank(bank: Dict[str, State]) -> Dict[str, Array]:
    return {
        "degree_error": mean(bank["degree_error"]),
        "degree_error_geodesic": mean(bank["degree_error_geodesic"]),
        "degree_error_AP_5": ratio(bank["degree_error_AP_5"]),
        "iou_3d_mAP_0.25": ratio(bank["iou_3d_mAP_0.25"]),
        "iou_3d_accuracy": mean(bank["iou_3d_accuracy"]),
        "offset_error_AP_5cm": ratio(bank["offset_error_AP_5cm"]),
        "offset_error": mean(bank["offset_error"]),
    }

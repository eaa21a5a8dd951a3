"""End-to-end forward pipeline: logits -> categorical -> instances -> RT.

Parity: FPC/lib/pose_regressor.py:443-504 + 745-770 (`Model` stage methods
and `PoseRegressor.forward`). The reference gates stages with runtime flags
(HPARAM.PERFORM_*, pose_regressor.py:484-504); here the gates are *static*
fields of `PipelineConfig`, so jit traces exactly the stages requested and
XLA sees one fused program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax

from fastposecnn_tpu import geometry
from fastposecnn_tpu.ops.aggregation import aggregate_instances
from fastposecnn_tpu.ops.class_compress import class_compress
from fastposecnn_tpu.ops.voting import hough_vote


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static (trace-time) configuration of the post-network stages."""

    perform_aggregation: bool = True
    perform_hough_voting: bool = True
    perform_rt_calculation: bool = True
    max_instances: int = 16
    max_points: int = 1024
    hv_num_hypotheses: int = 128  # HPARAM.HV_NUM_OF_HYPOTHESES (config.py:93)
    hv_inlier_thresh: float = 0.999
    hv_confidence: float = 0.99
    hv_max_iter: int = 20
    hv_adaptive: bool = True  # False = one fixed-budget vote (TPU serving mode)
    hv_sampler: str = "bbox"  # 'bbox' (1 gather round) or 'cdf' (exact)
    hv_refine: str = "dense"  # 'dense' all-pixel LSQ (reference) | 'sampled'
    hv_implementation: str = "ransac"  # 'ransac' (PVNet path) or 'soft'
    # soft-voting pruning knobs (FPC/config.py:96-105)
    prun_method: Optional[str] = "iqr"
    prun_outlier_drop: bool = False
    prun_replacement: str = "median"
    prun_zscore_threshold: float = 1.0
    iqr_multiplier: float = 1.5
    hv_in_mask_multiplier: float = 3.0
    cc_max_iters: int = 64
    use_pallas: Optional[bool] = None  # None -> auto (TPU yes, CPU no)


def stage_class_compress(logits: Dict[str, jax.Array]) -> Dict[str, Any]:
    """Stage: class compression (FPC pose_regressor.py:446-457)."""
    return class_compress(logits)


def stage_aggregate(
    categorical: Dict[str, Any], config: PipelineConfig
) -> Dict[str, Any]:
    """Stage: CC labeling + per-instance aggregation
    (FPC pose_regressor.py:459-465)."""
    return aggregate_instances(
        categorical,
        max_instances=config.max_instances,
        cc_max_iters=config.cc_max_iters,
        use_pallas=config.use_pallas,
    )


def stage_hough_voting(
    key: jax.Array, aggregated: Dict[str, Any], config: PipelineConfig
) -> Dict[str, Any]:
    """Stage: hough voting (FPC pose_regressor.py:467-473)."""
    if config.hv_implementation == "soft":
        from fastposecnn_tpu.ops.voting_soft import soft_hough_vote

        return soft_hough_vote(
            key,
            aggregated,
            max_points=config.max_points,
            num_hypotheses=config.hv_num_hypotheses,
            prun_method=config.prun_method,
            prun_drop=config.prun_outlier_drop,
            prun_replacement=config.prun_replacement,
            zscore_threshold=config.prun_zscore_threshold,
            iqr_multiplier=config.iqr_multiplier,
            in_mask_multiplier=config.hv_in_mask_multiplier,
        )
    return hough_vote(
        key,
        aggregated,
        max_points=config.max_points,
        round_hyp_num=config.hv_num_hypotheses,
        inlier_thresh=config.hv_inlier_thresh,
        confidence=config.hv_confidence,
        max_iter=config.hv_max_iter,
        adaptive=config.hv_adaptive,
        sampler=config.hv_sampler,
        use_pallas=config.use_pallas,
        refine=config.hv_refine,
    )


def stage_rt_calculation(
    aggregated: Dict[str, Any],
    config: PipelineConfig,
    inv_intrinsics: jax.Array,
) -> Dict[str, Any]:
    """Stage: RT reconstruction (FPC pose_regressor.py:475-481)."""
    R, T, RT = geometry.batch_get_RT(
        aggregated["quaternion"],
        aggregated["xy"],
        aggregated["z"][..., None],
        inv_intrinsics,
    )
    return dict(aggregated, R=R, T=T, RT=RT)


def run_pipeline(
    logits: Dict[str, jax.Array],
    key: jax.Array,
    config: PipelineConfig,
    inv_intrinsics: jax.Array,
) -> Dict[str, Any]:
    """Compose the post-network stages.

    Returns {'logits', 'categorical', 'aggregated'} like
    FPC/lib/pose_regressor.py:763-768 ('aggregated' is None when aggregation
    is off, e.g. the MASK_TRAINING preset, FPC/config.py:116-119).
    """
    categorical = stage_class_compress(logits)
    aggregated = None
    if config.perform_aggregation:
        aggregated = stage_aggregate(categorical, config)
        if config.perform_hough_voting:
            aggregated = stage_hough_voting(key, aggregated, config)
            if config.perform_rt_calculation:
                aggregated = stage_rt_calculation(
                    aggregated, config, inv_intrinsics
                )
    return {
        "logits": logits,
        "categorical": categorical,
        "aggregated": aggregated,
    }

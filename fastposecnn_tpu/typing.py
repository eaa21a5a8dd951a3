"""Typed contracts for the inter-stage payloads.

Parity: FPC/lib/type_hinting.py:5-47 (LogitData / CategoricalData / AggData /
MatchedData TypedDicts). Shapes here are the static padded layouts of the
TPU build (B batch, G GT slots, N predicted instance slots, C classes incl.
background).
"""

from __future__ import annotations

from typing import Optional, TypedDict

import jax

Array = jax.Array


class LogitData(TypedDict):
    """Raw network outputs (models.pose_regressor.PoseRegressorNet)."""

    mask: Array  # [B, H, W, C]
    quaternion: Array  # [B, H, W, 4*(C-1)] flat class-major
    xy: Array  # [B, H, W, 2*(C-1)] flat class-major
    z: Array  # [B, H, W, C-1]
    scales: Array  # [B, H, W, 3*(C-1)] flat class-major


class CategoricalData(TypedDict):
    """After class compression (ops.class_compress)."""

    mask: Array  # [B, H, W] int32
    quaternion: Array  # [B, H, W, 4] unit, 0 on bg
    xy: Array  # [B, H, W, 2] unit, 0 on bg
    z: Array  # [B, H, W]
    scales: Array  # [B, H, W, 3]


class AggData(TypedDict, total=False):
    """Per-instance data after aggregation (+ voting + RT)."""

    instance_masks: Array  # [B, N, H, W] float 0/1
    valid: Array  # [B, N] bool
    class_ids: Array  # [B, N] int32
    quaternion: Array  # [B, N, 4]
    scales: Array  # [B, N, 3]
    z: Array  # [B, N] (mm)
    xy_dense: Array  # [B, H, W, 2] dense vector field (pre-voting)
    cat_mask: Array  # [B, H, W]
    xy: Array  # [B, N, 2] voted center (post-voting)
    win_ratio: Array  # [B, N]
    R: Array  # [B, N, 3, 3]
    T: Array  # [B, N, 3]
    RT: Array  # [B, N, 4, 4]
    symmetric_ids: Array  # [B, N] (GT-side only)


class MatchedData(TypedDict, total=False):
    """Output of ops.matching.gather_matched: gt/pred pairs per GT slot."""

    valid: Array  # [B, G] bool
    class_ids: Array  # [B, G]
    symmetric_ids: Array  # [B, G]
    gt_quaternion: Array  # [B, G, 4]
    pred_quaternion: Array
    gt_scales: Array
    pred_scales: Array
    gt_z: Array
    pred_z: Array
    gt_xy: Array
    pred_xy: Array
    gt_T: Array
    pred_T: Array
    gt_R: Array
    pred_R: Array
    gt_RT: Array
    pred_RT: Array


class PipelineOutput(TypedDict):
    """run_pipeline return (FPC PoseRegressor.forward output shape)."""

    logits: LogitData
    categorical: CategoricalData
    aggregated: Optional[AggData]

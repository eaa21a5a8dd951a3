"""Loss functions, mask-aware and fixed-shape.

Parity: FPC/lib/loss.py. The reference drops NaN losses after the fact
(loss.py:230-233,278-296 and the `dec_empty_check` decorator, loss.py:
239-269); here every matched loss consumes a validity mask and returns
`(value, has_data)` — `value` is a masked mean (0 when empty) and `has_data`
says whether any instance contributed, which the trainer uses exactly where
the reference used its NaN checks. No NaNs are ever produced, so no NaN
scrubbing pass is needed (cf. FPC/lib/pose_regressor.py:99-108).

Matched payloads are the output of `ops.matching.gather_matched`:
keys `gt_<k>` / `pred_<k>` of shape [B, G, ...] plus `valid` [B, G],
`symmetric_ids` [B, G].
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from fastposecnn_tpu import geometry

Array = jax.Array
LossOut = Tuple[Array, Array]  # (scalar loss, has_data flag as float 0/1)


def _masked_mean(x: Array, mask: Array) -> LossOut:
    mask = mask.astype(x.dtype)
    total = jnp.sum(mask)
    value = jnp.sum(x * mask) / jnp.maximum(total, 1.0)
    return value, (total > 0).astype(x.dtype)


# -----------------------------------------------------------------------------
# Pixel-wise mask losses (FPC/lib/loss.py:26-98)


def cross_entropy(
    mask_logits: Array, gt_mask: Array, sample_weight: Array | None = None
) -> Array:
    """Mean CE from logits. FPC `CE` and `CCE` are mathematically identical
    (CrossEntropyLoss == LogSoftmax+NLLLoss); both map here.

    One-hot multiply-sum instead of take_along_axis: the gather's backward
    is a per-pixel scatter-add, which lowers to a sort over H*W on TPU.

    `sample_weight` [B] (0 for padded samples of a short final batch)
    makes the mean a weighted per-sample mean, so zero-image padding
    contributes nothing (the reference never pads — its last batch is
    simply short, FPC/tools/dataset.py:626-653).
    """
    logp = jax.nn.log_softmax(mask_logits, axis=-1)
    onehot = jax.nn.one_hot(gt_mask, mask_logits.shape[-1], dtype=logp.dtype)
    ce = -jnp.sum(logp * onehot, axis=-1)  # [B, H, W]
    if sample_weight is None:
        return jnp.mean(ce)
    w = sample_weight.astype(ce.dtype)
    per_sample = jnp.mean(ce, axis=tuple(range(1, ce.ndim)))  # [B]
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def focal_loss(
    mask_logits: Array,
    gt_mask: Array,
    alpha: float = 0.5,
    gamma: float = 2.0,
    sample_weight: Array | None = None,
) -> Array:
    """Focal loss replicating the reference's exact composition.

    FPC `Focal` (loss.py:69-98) feeds *log-softmax outputs* into
    pytorch_toolbelt's sigmoid-based binary focal, one class at a time:
      for each class c: x = log_softmax(logits)[c], t = (gt == c)
        logpt = -BCEWithLogits(x, t); pt = exp(logpt)
        loss_c = mean( alpha_t * (1 - pt)^gamma * (-logpt) )
      total = sum_c loss_c
    We reproduce that computation (including the log-prob-as-logit quirk).
    """
    num_classes = mask_logits.shape[-1]
    logp = jax.nn.log_softmax(mask_logits, axis=-1)  # used as "logits" below
    onehot = jax.nn.one_hot(gt_mask, num_classes, dtype=logp.dtype)
    # BCE-with-logits on x=logp, target t: logpt = -(softplus(-x) * t + (softplus(x)) * (1-t))
    logpt = -(
        jax.nn.softplus(-logp) * onehot + jax.nn.softplus(logp) * (1 - onehot)
    )
    pt = jnp.exp(logpt)
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    per_class = alpha_t * (1 - pt) ** gamma * (-logpt)
    # mean over pixels per class, summed over classes; with sample
    # weights, a weighted mean over samples of per-sample pixel means
    # (identical when all weights are 1)
    pixel_axes = tuple(range(1, per_class.ndim - 1))
    per_sample = jnp.mean(per_class, axis=pixel_axes)  # [B, C]
    if sample_weight is None:
        return jnp.sum(jnp.mean(per_sample, axis=0))
    w = sample_weight.astype(per_sample.dtype)
    weighted = jnp.sum(per_sample * w[:, None], axis=0) / jnp.maximum(
        jnp.sum(w), 1.0
    )
    return jnp.sum(weighted)


def masked_mse(
    pred_dense: Array, gt_dense: Array, pred_cat_mask: Array
) -> LossOut:
    """Pixel-wise regression MSE masked by the predicted foreground.

    Parity: FPC/lib/loss.py:103-150 (`MaskedMSELoss`): predictions are zeroed
    outside the predicted mask, then plain MSE against the dense GT. The
    reference returns NaN when pred/gt masks don't intersect; we return the
    has-data flag instead.
    """
    fg = (pred_cat_mask != 0).astype(pred_dense.dtype)
    while fg.ndim < pred_dense.ndim:
        fg = fg[..., None]
    masked_pred = pred_dense * fg
    mse = jnp.mean((masked_pred - gt_dense) ** 2)
    has = (jnp.sum(fg) > 0).astype(pred_dense.dtype)
    return mse, has


# -----------------------------------------------------------------------------
# Matched losses (FPC/lib/loss.py:272-541)


def _elementwise(kind: str, diff_gt: Array, diff_pred: Array) -> Array:
    d = diff_gt - diff_pred
    if kind == "L1":
        return jnp.abs(d)
    if kind == "L2":
        return d * d
    if kind == "SmoothL1":
        a = jnp.abs(d)
        return jnp.where(a < 1.0, 0.5 * d * d, a - 0.5)
    raise NotImplementedError(f"{kind} is an invalid loss function!")


def quaternion_loss(
    matched: Dict[str, Array], eps: float = 0.1, num_steps: int = 360
) -> LossOut:
    """Log quaternion loss with y-axis symmetry handling.

    Parity: FPC/lib/loss.py:272-367 (`QLoss`): loss = log(1 - <gt,pred>^2 +
    eps) - log(eps); symmetric instances take the min over `num_steps`
    y-rotations of the GT (the loss rotates gt; the metric rotates pred —
    both quirks preserved from the reference).
    """
    gt = matched["gt_quaternion"]
    pred = matched["pred_quaternion"]
    valid = matched["valid"]
    sym = matched["symmetric_ids"] != 0

    def dp_to_loss(dot):
        err = 1.0 - dot**2
        return jnp.log(err + eps) - jnp.log(eps)

    plain = dp_to_loss(jnp.sum(gt * pred, axis=-1))

    rot_q = jnp.asarray(
        geometry._symmetry_rotation_quats(num_steps, str(gt.dtype))
    )
    rot_gt = geometry.quat_multiply_wxyz(gt[..., None, :], rot_q)  # [B,G,S,4]
    sym_dots = jnp.sum(pred[..., None, :] * rot_gt, axis=-1)
    sym_loss = jnp.min(dp_to_loss(sym_dots), axis=-1)

    loss = jnp.where(sym, sym_loss, plain)
    return _masked_mean(loss, valid)


def xy_loss(matched: Dict[str, Array], kind: str = "L1") -> LossOut:
    """Per-coordinate loss on the voted 2D center, summed over x and y.

    Parity: FPC/lib/loss.py:431-469 (`XYLoss`): reduction is a mean per
    coordinate then a sum over coordinates.
    """
    gt, pred, valid = matched["gt_xy"], matched["pred_xy"], matched["valid"]
    per_coord = _elementwise(kind, gt, pred)  # [B, G, 2]
    m0, has = _masked_mean(per_coord[..., 0], valid)
    m1, _ = _masked_mean(per_coord[..., 1], valid)
    return m0 + m1, has


def z_loss(matched: Dict[str, Array], kind: str = "L1") -> LossOut:
    """Log-space depth loss (FPC/lib/loss.py:471-500)."""
    gt = jnp.log(jnp.maximum(matched["gt_z"], 1e-8))
    pred = jnp.log(jnp.maximum(matched["pred_z"], 1e-8))
    return _masked_mean(_elementwise(kind, gt, pred), matched["valid"])


def scales_loss(matched: Dict[str, Array], kind: str = "L1") -> LossOut:
    """Per-dimension scales loss summed over h, w, l (FPC/lib/loss.py:503-541)."""
    gt, pred, valid = matched["gt_scales"], matched["pred_scales"], matched["valid"]
    per_dim = _elementwise(kind, gt, pred)
    total = jnp.zeros(())
    has = jnp.zeros(())
    for i in range(per_dim.shape[-1]):
        m, has = _masked_mean(per_dim[..., i], valid)
        total = total + m
    return total, has


def rotation_matrix_loss(matched: Dict[str, Array]) -> LossOut:
    """Geodesic acos-trace loss (FPC/lib/loss.py:369-398 `RLoss`)."""
    gt, pred, valid = matched["gt_R"], matched["pred_R"], matched["valid"]
    sim = jnp.einsum("...ji,...jk->...ik", gt, pred)
    tr = jnp.trace(sim, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    return _masked_mean(jnp.arccos(cos), valid)


def _safe_norm(diff: Array) -> Array:
    """||diff|| with finite gradients at exactly-zero differences (padded
    slots have gt == pred == 0; naive norm backward is 0/0 there and the
    later masking multiplies 0 * NaN = NaN — same trap as safe_normalize)."""
    sq = jnp.sum(diff * diff, axis=-1)
    nonzero = sq > 0
    return jnp.sqrt(jnp.where(nonzero, sq, 1.0)) * nonzero


def translation_loss(matched: Dict[str, Array]) -> LossOut:
    """||gt_T - pred_T|| mean (FPC/lib/loss.py:401-429 `TLoss`)."""
    d = _safe_norm(matched["gt_T"] - matched["pred_T"])
    return _masked_mean(d, matched["valid"])


def iou3d_loss(matched: Dict[str, Array]) -> LossOut:
    """1 - IoU3D (FPC/lib/loss.py:546-586 `Iou3dLoss`)."""
    iou = geometry.asymmetric_3d_iou(
        matched["gt_RT"], matched["pred_RT"],
        matched["gt_scales"], matched["pred_scales"],
    )
    return _masked_mean(1.0 - iou, matched["valid"])


def offset_loss(matched: Dict[str, Array]) -> LossOut:
    """Offset error / 10 from RT-derived world centers (FPC loss.py:588-626)."""
    gt_c = matched["gt_RT"][..., :3, :3].swapaxes(-1, -2) @ (
        -matched["gt_RT"][..., :3, 3:]
    )
    pred_c = matched["pred_RT"][..., :3, :3].swapaxes(-1, -2) @ (
        -matched["pred_RT"][..., :3, 3:]
    )
    # The x10 / /10 pair is the reference's own structure kept verbatim:
    # from_RTs_get_T_offset_errors scales by 10 (gpu_tensor_funcs.py:563-565)
    # and OffsetLoss divides the errors by 10 (loss.py:612).
    err = _safe_norm(gt_c[..., 0] - pred_c[..., 0]) * 10.0
    return _masked_mean(err / 10.0, matched["valid"])


MATCHED_LOSSES = {
    "quaternion": quaternion_loss,
    "xy": xy_loss,
    "z": z_loss,
    "scales": scales_loss,
    "R": rotation_matrix_loss,
    "T": translation_loss,
    "iou3d": iou3d_loss,
    "offset": offset_loss,
}


# -----------------------------------------------------------------------------
# Dense per-pixel auxiliary supervision (beyond-reference; see config.py
# DENSE_*_WEIGHT). The reference's only gradient into the quat/xy/z/scales
# heads is the matched-instance losses above — ~N signals per image, routed
# through aggregation/voting. PVNet (whose RANSAC voting the reference
# vendors) trains its vertex field DENSELY (smooth-L1 on the unit-vector
# field over instance pixels); this generalizes that to all four heads.
# Targets are painted in-graph from the batch's padded agg GT
# (instance_masks [B,N,H,W] + per-instance values), and predictions are the
# raw head fields selected at each pixel's GT class channels — independent
# of predicted-mask quality, so the heads receive signal from step 0.


def _gt_class_select(field: Array, gt_mask: Array, k: int) -> Array:
    """Select each pixel's GT-class channel group from a class-major flat
    field [B,H,W,k*(C-1)] -> [B,H,W,k]. Background pixels -> 0 (one_hot of
    -1 is all-zero). Mirrors ops.class_compress but keyed on the GT mask."""
    from fastposecnn_tpu.ops.class_compress import _field_maps

    cm1 = field.shape[-1] // k
    # int32 first: the uint8 wire mask would wrap background 0 -> 255.
    onehot = jax.nn.one_hot(gt_mask.astype(jnp.int32) - 1, cm1,
                            dtype=field.dtype)
    chan_class, G = _field_maps(cm1, k)
    masked = field * onehot[..., jnp.asarray(chan_class)]
    # HIGHEST: default TPU matmul precision would truncate the selected
    # field values to bf16 (same hazard as ops/matching.py gather_matched);
    # k and C are tiny so the exact pass costs nothing.
    return jnp.einsum(
        "bhwd,dk->bhwk", masked, jnp.asarray(G, field.dtype),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def dense_supervision(
    logits: Dict[str, Array],
    gt_mask: Array,
    agg: Dict[str, Array],
    weights: Dict[str, float],
    sample_weight: Array | None = None,
    sym_quat_mode: str = "swing",
) -> Tuple[Array, Dict[str, Array]]:
    """Masked dense L1 losses on the raw head fields at GT class channels.

    weights: {'quaternion': w, 'xy': w, 'z': w, 'scales': w} — terms with
    weight 0.0 are not traced at all. sym_quat_mode picks the quaternion
    target for symmetric instances (config.py DENSE_SYM_QUAT_MODE).
    Returns (weighted total, logs).
    """
    total = jnp.zeros((), jnp.float32)
    logs: Dict[str, Array] = {}
    if not any(weights.values()):
        return total, logs

    inst = agg["instance_masks"].astype(jnp.float32)  # [B, N, H, W]
    vf = agg["valid"].astype(jnp.float32)
    inst = inst * vf[..., None, None]
    if sample_weight is not None:
        inst = inst * sample_weight.astype(jnp.float32)[:, None, None, None]
    fg = jnp.sum(inst, axis=1)  # [B, H, W] (instances are disjoint)

    def paint(values: Array) -> Array:  # [B, N, D] -> [B, H, W, D]
        # HIGHEST: bf16 operand truncation at default precision would put
        # ~ulp(target) noise INTO the dense GT targets (log-z ~ 7.0 has
        # bf16 ulp ~ 0.027 — a floor on the achievable dense z loss).
        return jnp.einsum("bnhw,bnd->bhwd", inst, values,
                          precision=jax.lax.Precision.HIGHEST)

    def masked_l1(pred: Array, target: Array) -> Array:
        err = jnp.sum(jnp.abs(pred - target), axis=-1)  # sum over components
        return jnp.sum(err * fg) / jnp.maximum(jnp.sum(fg), 1.0)

    if weights.get("quaternion"):
        # q and -q are the same rotation but DIFFERENT regression targets:
        # canonicalize the hemisphere (geometry.quat_canonical) or the
        # same appearance gets opposite-sign labels and the optimal dense
        # field collapses to ~0 (the round-3 ~49 deg rotation plateau).
        #
        # Symmetric classes (bottle/bowl/can) have a RELATED ambiguity one
        # level up — the symmetric degree metrics (and the matched QLoss)
        # only define their rotation up to a camera-y twist — but whether
        # the dense target should forgive that twist depends on the DATA
        # and the METRIC being optimized (config.py DENSE_SYM_QUAT_MODE):
        #   swing   — zero-twist representative (quat_swing_canonical),
        #             consistent with the twist-forgiving symmetric
        #             metrics; right when the twist is unobservable.
        #   full    — raw canonical GT quat: the pose-cue renderer
        #             (synthetic.py) paints a NOCS gradient on every
        #             instance, so the twist IS observable and the honest
        #             geodesic metric (which never forgives twist) can
        #             only be driven down by supervising it. Round-4
        #             measured: swing lifted symmetric-class geodesic
        #             from 31.4 to 27.6 deg mean but can never close the
        #             gap — the predicted twist stays canonical while the
        #             GT twist is uniform.
        #   exclude — no dense quat term on symmetric instances
        #             (round-3 behavior).
        sym = agg["symmetric_ids"].astype(jnp.float32)[..., None]
        q_gt = geometry.quat_canonical(agg["quaternion"])
        if sym_quat_mode == "full":
            q_target = q_gt
            q_fg = fg
        elif sym_quat_mode == "swing":
            q_swing = geometry.quat_swing_canonical(agg["quaternion"])
            q_target = q_gt * (1.0 - sym) + q_swing * sym
            q_fg = fg
        elif sym_quat_mode == "exclude":
            q_target = q_gt
            inst_nonsym = inst * (1.0 - sym[..., 0])[:, :, None, None]
            q_fg = jnp.sum(inst_nonsym, axis=1)
        else:
            raise NotImplementedError(
                f"DENSE_SYM_QUAT_MODE={sym_quat_mode!r} is invalid "
                "(expected full | swing | exclude)"
            )
        pred = _gt_class_select(logits["quaternion"], gt_mask, 4)
        target = jnp.einsum(
            "bnhw,bnd->bhwd",
            inst if sym_quat_mode != "exclude" else inst_nonsym,
            q_target,
            precision=jax.lax.Precision.HIGHEST,
        )
        err = jnp.sum(jnp.abs(pred - target), axis=-1)
        loss = jnp.sum(err * q_fg) / jnp.maximum(jnp.sum(q_fg), 1.0)
        logs["quaternion/loss_dense"] = loss
        total = total + weights["quaternion"] * loss

    if weights.get("xy"):
        pred = _gt_class_select(logits["xy"], gt_mask, 2)
        b, h, w = gt_mask.shape
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        centers = paint(agg["xy"])  # [B, H, W, 2] (x, y)
        dvec = jnp.stack(
            [centers[..., 0] - xs, centers[..., 1] - ys], axis=-1
        )
        target = geometry.safe_normalize(dvec)
        loss = masked_l1(pred, target)
        logs["xy/loss_dense"] = loss
        total = total + weights["xy"] * loss

    if weights.get("z"):
        pred = _gt_class_select(logits["z"], gt_mask, 1)
        logz = jnp.log(jnp.maximum(agg["z"], 1e-8))[..., None]
        loss = masked_l1(pred, paint(logz))
        logs["z/loss_dense"] = loss
        total = total + weights["z"] * loss

    if weights.get("scales"):
        pred = _gt_class_select(logits["scales"], gt_mask, 3)
        loss = masked_l1(pred, paint(agg["scales"]))
        logs["scales/loss_dense"] = loss
        total = total + weights["scales"] * loss

    logs["pose/dense_total"] = total
    return total, logs

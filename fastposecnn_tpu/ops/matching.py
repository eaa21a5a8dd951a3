"""GT <-> prediction instance matching by 2D mask IoU.

Parity: FPC/lib/matching.py:226-325 (`batchwise_find_matches`): for each
class, IoU every GT instance mask against every predicted instance mask of
the same class, pair each GT with its argmax pred, keep pairs with IoU > 0.

TPU-first deltas:
- fixed shapes: GT instances [B, G] and preds [B, N] with validity masks;
  output is one (pred index, valid) pair per GT slot;
- the IoU matrix comes from a single [G, HW] x [HW, N] matmul per image
  (MXU) instead of broadcasting full-resolution mask stacks
  (FPC/lib/gpu_tensor_funcs.py:386-409 expands [G, N, H, W]);
- matching is per image. The reference IoUs instances across the whole
  batch (matching.py:252-270 never filters by sample id), which can pair
  masks from different images; restricting to the image is strictly more
  correct and cannot reduce true matches (cross-image IoU of a true pair is
  0 anyway).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def mask_iou_matrix(gt_masks: jax.Array, pred_masks: jax.Array) -> jax.Array:
    """[B, G, H, W] x [B, N, H, W] binary masks -> IoU [B, G, N]."""
    b, g = gt_masks.shape[:2]
    n = pred_masks.shape[1]
    hw = gt_masks.shape[2] * gt_masks.shape[3]
    gt_flat = gt_masks.reshape(b, g, hw)
    pred_flat = pred_masks.reshape(b, n, hw)
    # bf16 operands halve HBM traffic for the [*, HW] reads; 0/1 values are
    # exact in bf16 and the MXU accumulates in f32, so counts stay exact.
    inter = jnp.einsum(
        "bgp,bnp->bgn",
        gt_flat.astype(jnp.bfloat16),
        pred_flat.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    areas_g = jnp.sum(gt_flat, axis=-1)
    areas_n = jnp.sum(pred_flat, axis=-1)
    union = areas_g[:, :, None] + areas_n[:, None, :] - inter
    return inter / jnp.maximum(union, 1.0)


def match_instances(
    preds: Dict[str, jax.Array], gts: Dict[str, jax.Array]
) -> Dict[str, jax.Array]:
    """Match padded GT and predicted instances.

    Args:
      preds: output of `aggregate_instances` (+ hough voting): needs
        instance_masks [B,N,H,W], class_ids [B,N], valid [B,N].
      gts: padded GT with the same keys, [B,G,...].

    Returns dict:
      pred_idx: [B, G] int32 index into the pred axis for each GT slot
      valid:    [B, G] bool — True where a same-class IoU>0 match exists
      iou:      [B, G] matched IoU value
    """
    iou = mask_iou_matrix(gts["instance_masks"], preds["instance_masks"])
    same_class = (
        gts["class_ids"][:, :, None] == preds["class_ids"][:, None, :]
    )
    allowed = (
        same_class
        & gts["valid"][:, :, None]
        & preds["valid"][:, None, :]
    )
    scored = jnp.where(allowed, iou, -1.0)
    pred_idx = jnp.argmax(scored, axis=-1).astype(jnp.int32)
    best = jnp.max(scored, axis=-1)
    valid = best > 0.0
    return {"pred_idx": pred_idx, "valid": valid, "iou": jnp.maximum(best, 0.0)}


def _standard_pred(key: str, like: jax.Array) -> jax.Array:
    """The reference's 'standard pred' placeholder for a missed instance:
    zeros, except quaternion [1,0,0,0], RT = identity, z = 1000
    (FPC/lib/matching.py:184-221 `get_standard_preds`)."""
    std = jnp.zeros_like(like)
    if key == "quaternion":
        std = std.at[..., 0].set(1.0)
    elif key == "RT":
        std = std + jnp.eye(4, dtype=like.dtype)
    elif key == "z":
        std = std + 1000.0
    return std


def gather_matched(
    preds: Dict[str, jax.Array],
    gts: Dict[str, jax.Array],
    match: Dict[str, jax.Array],
    keys: tuple = ("quaternion", "scales", "z", "xy", "T", "R", "RT"),
    fill_missing: bool = False,
) -> Dict[str, jax.Array]:
    """Assemble the matched-pair payload consumed by losses and metrics.

    Parity: FPC/lib/matching.py:41-59 (`stack_and_store_data`) — each key
    becomes a (gt, pred) pair, here stored as `gt_<key>` / `pred_<key>` with
    fixed [B, G, ...] shapes plus the shared `valid`, `class_ids`,
    `symmetric_ids`.

    `fill_missing=True` reproduces `batchwise_find_matches2`
    (FPC/lib/matching.py:64-221, present but unused by the reference's
    training loop): unmatched GT instances pair with a 'standard pred'
    (identity pose at 1 m) and count as valid, so losses penalize missed
    detections instead of ignoring them.
    """
    matched = match["valid"] & gts["valid"]
    out = {
        "valid": gts["valid"] if fill_missing else matched,
        "class_ids": gts["class_ids"],
        "symmetric_ids": gts.get(
            "symmetric_ids", jnp.zeros_like(gts["class_ids"])
        ),
    }
    idx = match["pred_idx"]

    def take(field, index):
        # field [B, N, ...] gathered along axis 1 with index [B, G] — as a
        # one-hot matmul rather than take_along_axis: N and G are tiny
        # (instance slots), and the matmul's BACKWARD is also a matmul,
        # whereas take_along_axis's backward is a scatter-add that XLA
        # lowers to serialized while-loops (~1.5 ms of the stage-2 train
        # step at batch 2 before this change). Precision HIGHEST: the
        # default matmul precision permits bf16 operand truncation on TPU,
        # which would silently round the gathered f32 pose values
        # (xy centers up to ~640 px have a bf16 ulp of ~4 px; z in mm has
        # ~8 mm ulp at 1 m). N and G are ~16 so exactness is free.
        onehot = jax.nn.one_hot(index, field.shape[1], dtype=field.dtype)
        return jnp.einsum(
            "bgn,bn...->bg...",
            onehot,
            field,
            precision=jax.lax.Precision.HIGHEST,
        )

    for key in keys:
        if key in gts:
            out[f"gt_{key}"] = gts[key]
        if key in preds:
            pred = take(preds[key], idx)
            if fill_missing:
                std = _standard_pred(key, pred)
                mshape = matched.shape + (1,) * (pred.ndim - 2)
                pred = jnp.where(matched.reshape(mshape), pred, std)
            out[f"pred_{key}"] = pred
    return out

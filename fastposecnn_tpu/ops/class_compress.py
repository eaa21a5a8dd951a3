"""Class compression: collapse per-class dense predictions onto the argmax class.

Parity: FPC/lib/gpu_tensor_funcs.py:52-99 (`class_compress`) +
FPC/lib/pose_regressor.py:445-457 (`Model.class_compression`).

The reference scatters a one-hot class mask, multiplies per-class chunks and
sums over classes. Because the class mask is one-hot, that sum is a *select*:
here it is a single `take_along_axis` gather per key — O(pixels) instead of
O(pixels x classes), and XLA fuses it with the surrounding normalize.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from fastposecnn_tpu.geometry import safe_normalize


def class_compress(logits: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """logits (layouts per PoseRegressorNet) -> categorical data.

    Returns:
      mask:       [B, H, W] int32 argmax class (incl. background 0)
      quaternion: [B, H, W, 4]  L2-normalized, 0 on background
      xy:         [B, H, W, 2]  L2-normalized, 0 on background
      z:          [B, H, W]     0 on background
      scales:     [B, H, W, 3]  0 on background
    """
    # LogSoftmax then argmax == argmax (FPC pose_regressor.py:449).
    cat_mask = jnp.argmax(logits["mask"], axis=-1).astype(jnp.int32)
    fg = cat_mask > 0
    # Index into the C-1 foreground class groups; background clamped to 0 and
    # zeroed afterwards (reference zeroes non-class pixels before summing).
    cls_idx = jnp.maximum(cat_mask - 1, 0)

    def select(field: jax.Array) -> jax.Array:
        # field: [B, H, W, C-1] or [B, H, W, C-1, k] -> class axis gathered out
        idx = cls_idx[..., None]  # [B, H, W, 1]
        if field.ndim == 5:
            idx = idx[..., None]  # [B, H, W, 1, 1], broadcasts over k
        return jnp.squeeze(jnp.take_along_axis(field, idx, axis=3), axis=3)

    quat = select(logits["quaternion"])
    xy = select(logits["xy"])
    z = select(logits["z"])
    scales = select(logits["scales"])

    fg_f = fg.astype(quat.dtype)
    out = {
        "mask": cat_mask,
        "quaternion": safe_normalize(quat * fg_f[..., None]),
        "xy": safe_normalize(xy * fg_f[..., None]),
        "z": z * fg_f,
        "scales": scales * fg_f[..., None],
    }
    return out

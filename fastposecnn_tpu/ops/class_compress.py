"""Class compression: collapse per-class dense predictions onto the argmax class.

Parity: FPC/lib/gpu_tensor_funcs.py:52-99 (`class_compress`) +
FPC/lib/pose_regressor.py:445-457 (`Model.class_compression`).

Implementation note (TPU): this is a one-hot multiply + sum over the class
axis — structurally the same as the reference's scatter/chunk/sum
(gpu_tensor_funcs.py:64-85) rather than a per-pixel gather. A gather-based
select (`take_along_axis`) is O(pixels) in theory but lowers to per-element
dynamic indexing on TPU and measured ~17 ms at 480x640; the multiply-sum is
pure VPU work that XLA fuses into the surrounding ops (<1 ms).
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
    num_classes = logits["mask"].shape[-1]
    cat_mask = jnp.argmax(logits["mask"], axis=-1).astype(jnp.int32)
    # One-hot over the C-1 foreground groups; background rows are all-zero,
    # which also zeroes bg pixels (reference zeroes non-class pixels too).
    onehot = jax.nn.one_hot(
        cat_mask - 1, num_classes - 1, dtype=logits["quaternion"].dtype
    )  # [B, H, W, C-1]; cat_mask==0 -> all zeros

    def select(field: jax.Array) -> jax.Array:
        # field: [B, H, W, C-1] or [B, H, W, C-1, k]
        oh = onehot if field.ndim == 4 else onehot[..., None]
        return jnp.sum(field * oh, axis=3)

    quat = select(logits["quaternion"])
    xy = select(logits["xy"])
    z = select(logits["z"])
    scales = select(logits["scales"])

    out = {
        "mask": cat_mask,
        "quaternion": safe_normalize(quat),
        "xy": safe_normalize(xy),
        "z": z,
        "scales": scales,
    }
    return out

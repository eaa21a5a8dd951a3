"""The PoseRegressor network: shared encoder, 4 task FPN decoders, 4 heads.

Parity: FPC/lib/pose_regressor.py:575-743 (`PoseRegressor.__init__` +
`pure_model_forward`). Differences by design:
- NHWC, flax, bf16-capable compute path;
- logits dict carries per-class channel groups in a [..., C-1, k] layout
  instead of torch's interleaved channel axis; the xyz->xy,z split
  (pose_regressor.py:727-732) becomes a trailing-axis slice;
- freezing (FPC pose_regressor.py:694-707) is handled by the optimizer
  (optax.multi_transform zeroing frozen subtrees), not by mutating modules.

The post-network stages (class compression, aggregation, hough voting, RT)
live in fastposecnn_tpu/pipeline.py as pure functions over these logits.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastposecnn_tpu.models.fpn import FPNDecoder, SegmentationHead
from fastposecnn_tpu.models.resnet import ResNetEncoder


class PoseRegressorNet(nn.Module):
    """Dense multi-head network.

    Outputs (NHWC):
      mask:       [B, H, W, C]        class logits (incl. background)
      quaternion: [B, H, W, C-1, 4]   per-foreground-class quaternion field
      xy:         [B, H, W, C-1, 2]   per-class 2D-center unit-vector field
      z:          [B, H, W, C-1]      per-class log-depth field
      scales:     [B, H, W, C-1, 3]   per-class log-free scale field
    """

    num_classes: int = 7  # including background
    encoder_name: str = "resnet18"
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    decoder_dropout: float = 0.2
    upsampling: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        if x.shape[1] % 32 or x.shape[2] % 32:
            raise ValueError(
                f"input spatial dims must be multiples of 32 for the FPN "
                f"top-down pathway, got {x.shape[1]}x{x.shape[2]}"
            )
        c = self.num_classes
        features = ResNetEncoder(self.encoder_name, dtype=self.dtype,
                                 name="encoder")(x, train=train)

        def decode(name: str, out_channels: int):
            d = FPNDecoder(
                pyramid_channels=self.pyramid_channels,
                segmentation_channels=self.segmentation_channels,
                dropout=self.decoder_dropout,
                dtype=self.dtype,
                name=f"{name}_decoder",
            )(features, train=train)
            return SegmentationHead(
                out_channels, upsampling=self.upsampling, dtype=self.dtype,
                name=f"{name}_head",
            )(d)

        mask_logits = decode("mask", c)
        quat_logits = decode("rotation", 4 * (c - 1))
        xyz_logits = decode("translation", 3 * (c - 1))
        scales_logits = decode("scales", 3 * (c - 1))

        b, h, w = mask_logits.shape[:3]
        quat = quat_logits.reshape(b, h, w, c - 1, 4)
        xyz = xyz_logits.reshape(b, h, w, c - 1, 3)
        scales = scales_logits.reshape(b, h, w, c - 1, 3)

        return {
            "mask": mask_logits.astype(jnp.float32),
            "quaternion": quat.astype(jnp.float32),
            # Per class: channels (0,1) are the xy unit-vector field, channel
            # 2 is log-depth (FPC pose_regressor.py:729-732 channel split).
            "xy": xyz[..., :2].astype(jnp.float32),
            "z": xyz[..., 2].astype(jnp.float32),
            "scales": scales.astype(jnp.float32),
        }


MODELS = {"PoseRegressor": PoseRegressorNet}

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
import numpy as np

from fastposecnn_tpu.models.fpn import FPNDecoder, SegmentationHead
from fastposecnn_tpu.models.resnet import ResNetEncoder


class PoseRegressorNet(nn.Module):
    """Dense multi-head network.

    Outputs (NHWC, per-class channel groups kept FLAT and class-major —
    class c of field k occupies channels [c*k, (c+1)*k)):
      mask:       [B, H, W, C]         class logits (incl. background)
      quaternion: [B, H, W, 4*(C-1)]
      xy:         [B, H, W, 2*(C-1)]   2D-center unit-vector field
      z:          [B, H, W, C-1]       log-depth field
      scales:     [B, H, W, 3*(C-1)]

    Layout note (TPU): a [B, H, W, C-1, k] view puts (C-1, k) in the
    tile-minor dims, which Mosaic pads to (8, 128) — a 32x physical blowup
    that measured ~19 ms of relayout at 480p. Flat channel-major layouts
    keep one 128-padded axis; `ops.class_compress` does the per-class
    select with a static group-sum matmul instead of 5D broadcasting.
    """

    num_classes: int = 7  # including background
    encoder_name: str = "resnet18"
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    decoder_dropout: float = 0.2
    upsampling: int = 4
    dtype: Any = jnp.float32
    # Regression-head DC-offset inits (0.0 == reference parity: xavier
    # kernel + zero bias, FPC/lib/initialization.py:20-27). Setting
    # z_bias_init to the mean log-depth (log z_mm ~= 7.0 for NOCS) and
    # scales_bias_init to the mean normalized scale starts the heads at
    # the target distribution's center; with adaptive optimizers a zero
    # init otherwise spends O(target/lr) steps covering the DC offset
    # (measured: log-z output still ~1.3 under target after 33k steps).
    z_bias_init: float = 0.0
    scales_bias_init: float = 0.0

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

        def decode(name: str, out_channels: int, bias_init=None):
            d = FPNDecoder(
                pyramid_channels=self.pyramid_channels,
                segmentation_channels=self.segmentation_channels,
                dropout=self.decoder_dropout,
                dtype=self.dtype,
                name=f"{name}_decoder",
            )(features, train=train)
            return SegmentationHead(
                out_channels, upsampling=self.upsampling, dtype=self.dtype,
                bias_init_values=bias_init,
                name=f"{name}_head",
            )(d)

        # Translation head: channels 3k/3k+1 are the xy unit-vector field
        # (targets O(1), zero-centered); 3k+2 is log-depth.
        xyz_bias = tuple(
            self.z_bias_init if (j % 3 == 2) else 0.0
            for j in range(3 * (c - 1))
        ) if self.z_bias_init else None
        scales_bias = (
            (self.scales_bias_init,) * (3 * (c - 1))
            if self.scales_bias_init else None
        )

        mask_logits = decode("mask", c)
        quat_logits = decode("rotation", 4 * (c - 1))
        xyz_logits = decode("translation", 3 * (c - 1), bias_init=xyz_bias)
        scales_logits = decode("scales", 3 * (c - 1), bias_init=scales_bias)

        # Per class: channels (0,1) are the xy unit-vector field, channel 2
        # is log-depth (FPC pose_regressor.py:729-732 channel split). Static
        # channel selection keeps the layout flat.
        xy_idx = np.asarray(
            [3 * k + d for k in range(c - 1) for d in (0, 1)]
        )
        z_idx = np.asarray([3 * k + 2 for k in range(c - 1)])

        return {
            "mask": mask_logits.astype(jnp.float32),
            "quaternion": quat_logits.astype(jnp.float32),
            "xy": xyz_logits[..., xy_idx].astype(jnp.float32),
            "z": xyz_logits[..., z_idx].astype(jnp.float32),
            "scales": scales_logits.astype(jnp.float32),
        }


MODELS = {"PoseRegressor": PoseRegressorNet}

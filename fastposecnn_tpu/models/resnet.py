"""ResNet encoders in flax (NHWC, TPU-native layout).

Feature-pyramid contract matches smp's ResNetEncoder used by the reference
(FPC/lib/pose_regressor.py:607-613): depth-5 encoders return 6 feature maps
  [identity, conv1+bn+relu (1/2), layer1 (1/4), layer2 (1/8),
   layer3 (1/16), layer4 (1/32)]
with channel progression (3, 64, 64, 128, 256, 512) for resnet18/34 and
(3, 64, 256, 512, 1024, 2048) for resnet50.

Design deltas from the torch original (deliberate, TPU-first):
- NHWC everywhere (TPU's native conv layout; torch is NCHW).
- BatchNorm carries running stats in a separate `batch_stats` collection
  (flax idiom); training passes `use_running_average=False`.
- Weights import from a torchvision/smp state_dict via models/weights.py.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from fastposecnn_tpu.ops.pooling import max_pool_3x3_s2


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    block: str  # 'basic' | 'bottleneck'
    stage_sizes: Sequence[int]
    out_channels: Sequence[int]


RESNET_SPECS = {
    "resnet18": ResNetSpec("basic", (2, 2, 2, 2), (3, 64, 64, 128, 256, 512)),
    "resnet34": ResNetSpec("basic", (3, 4, 6, 3), (3, 64, 64, 128, 256, 512)),
    "resnet50": ResNetSpec(
        "bottleneck", (3, 4, 6, 3), (3, 64, 256, 512, 1024, 2048)
    ),
}


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name=name,
        )
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding=1,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = norm("bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=self.strides, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    features: int  # bottleneck width; output is features * 4
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name=name,
        )
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=self.strides,
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """Returns the 6-feature pyramid described in the module docstring."""

    name_or_spec: str = "resnet18"
    dtype: jnp.dtype = jnp.float32

    @property
    def spec(self) -> ResNetSpec:
        return RESNET_SPECS[self.name_or_spec]

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = self.spec
        block_cls = BasicBlock if spec.block == "basic" else BottleneckBlock
        features = [x]

        # Stem stays a plain 7x7/s2 conv: XLA's fused im2col lowering runs
        # 0.36 ms/frame at 480p. An explicit 2x2 space-to-depth rewrite
        # (4x4/s1 on 12 channels — mathematically identical, probed in git
        # history) measured 0.64 ms because the input rearrange lowers to
        # unfused lane-shuffle relayouts (reshape 0.34 + copies 0.26).
        #
        # The RGB wire is padded to C_in=4 with a zero alpha channel: the
        # C_in=3 conv's WEIGHT gradient was the costliest op of the stage-2
        # training step (1.24 ms — an unaligned 3-deep contraction), while
        # the zero channel contributes nothing forward and receives zero
        # gradient, so numerics are untouched (weights.py zero-pads
        # imported torch kernels to match).
        if x.shape[-1] == 3:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
        y = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn1",
        )(y)
        y = nn.relu(y)
        features.append(y)  # 1/2

        # Custom VJP pool: nn.max_pool's backward lowers to XLA
        # SelectAndScatter (0.72 ms/step in the stage-2 profile);
        # ops/pooling.py routes cotangents with elementwise selects +
        # zero-dilated adds instead, same first-match tie rule.
        y = max_pool_3x3_s2(y)

        widths = (64, 128, 256, 512)
        for stage, (num_blocks, width) in enumerate(
            zip(spec.stage_sizes, widths)
        ):
            for b in range(num_blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                y = block_cls(
                    width, strides=strides, dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(y, train=train)
            features.append(y)  # 1/4, 1/8, 1/16, 1/32

        return features

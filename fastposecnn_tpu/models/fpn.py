"""FPN decoder + segmentation head in flax (NHWC).

Structure mirrors smp's FPNDecoder that the reference instantiates four times
(FPC/lib/pose_regressor.py:616-630): lateral 1x1 to `pyramid_channels`,
top-down nearest-x2 + add, per-level segmentation blocks
(conv3x3 + GroupNorm(32) + ReLU, with per-level upsampling back to 1/4),
'add' merge, spatial dropout, then a 1x1 head conv + x4 bilinear upsample
(smp SegmentationHead, FPC/lib/pose_regressor.py:633-666).

Weight init parity: decoders use He-uniform conv / unit-BN-like GN, heads use
Xavier-uniform (FPC/lib/initialization.py:6-27).
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def upsample_nearest(x: jax.Array, scale: int) -> jax.Array:
    """Nearest-neighbor x`scale` upsample, NHWC. Matches F.interpolate(
    mode='nearest') used by smp's FPNBlock."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, scale, w, scale, c)
    )
    return x.reshape(b, h * scale, w * scale, c)


@functools.lru_cache(maxsize=16)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] align_corners=True bilinear interpolation matrix."""
    W = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        W[:, 0] = 1.0
        return W
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (pos - lo).astype(np.float32)
    W[np.arange(n_out), lo] += 1.0 - frac
    W[np.arange(n_out), hi] += frac
    return W


def upsample_bilinear(x: jax.Array, scale: int, align_corners: bool = True):
    """Bilinear x`scale` upsample, NHWC.

    torch's nn.UpsamplingBilinear2d (used by smp SegmentationHead) fixes
    align_corners=True; jax.image.resize implements half-pixel centers
    (align_corners=False), so the True path is implemented here as two
    matmuls with static interpolation matrices. Matmuls run on the MXU and
    their transpose IS the backward pass — a gather formulation would
    differentiate into scatter-adds, which lower to sorts on TPU and
    dominated the training step.
    """
    b, h, w, c = x.shape
    nh, nw = h * scale, w * scale
    if not align_corners:
        return jax.image.resize(x, (b, nh, nw, c), method="bilinear")
    Wy = jnp.asarray(_interp_matrix(h, nh), x.dtype)
    Wx = jnp.asarray(_interp_matrix(w, nw), x.dtype)
    tmp = jnp.einsum("oh,bhwc->bowc", Wy, x)
    return jnp.einsum("pw,bowc->bopc", Wx, tmp)


class Conv3x3GNReLU(nn.Module):
    features: int
    upsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype,
            kernel_init=nn.initializers.he_uniform(),
            name="conv",
        )(x)
        # epsilon=1e-5 matches torch nn.GroupNorm (flax default is 1e-6).
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                         name="gn")(x)
        x = nn.relu(x)
        if self.upsample:
            # smp's Conv3x3GNReLU upsamples bilinear/align_corners=True
            # (unlike the FPNBlock top-down pathway, which is nearest).
            x = upsample_bilinear(x, 2, align_corners=True)
        return x


class SegmentationBlock(nn.Module):
    features: int
    n_upsamples: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv3x3GNReLU(
            self.features, upsample=self.n_upsamples > 0, dtype=self.dtype,
            name="block0",
        )(x)
        for i in range(1, self.n_upsamples):
            x = Conv3x3GNReLU(
                self.features, upsample=True, dtype=self.dtype,
                name=f"block{i}",
            )(x)
        return x


class FPNDecoder(nn.Module):
    """Consumes the encoder's 6-feature pyramid, emits a 1/4-res map."""

    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dropout: float = 0.2
    merge_policy: str = "add"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False):
        c2, c3, c4, c5 = features[-4:]
        lateral = lambda name: nn.Conv(  # noqa: E731
            self.pyramid_channels, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.he_uniform(), name=name,
        )
        p5 = lateral("p5")(c5)
        p4 = upsample_nearest(p5, 2) + lateral("p4")(c4)
        p3 = upsample_nearest(p4, 2) + lateral("p3")(c3)
        p2 = upsample_nearest(p3, 2) + lateral("p2")(c2)

        outs = []
        for i, (p, ups) in enumerate(zip((p5, p4, p3, p2), (3, 2, 1, 0))):
            outs.append(
                SegmentationBlock(
                    self.segmentation_channels, n_upsamples=ups,
                    dtype=self.dtype, name=f"seg{i}",
                )(p)
            )
        if self.merge_policy == "add":
            x = outs[0] + outs[1] + outs[2] + outs[3]
        else:
            x = jnp.concatenate(outs, axis=-1)
        # broadcast over H,W = torch nn.Dropout2d (whole-channel drops),
        # which is what smp's FPNDecoder applies.
        x = nn.Dropout(
            self.dropout, broadcast_dims=(1, 2), deterministic=not train
        )(x)
        return x


class SegmentationHead(nn.Module):
    out_channels: int
    upsampling: int = 4
    dtype: jnp.dtype = jnp.float32
    # Per-channel constant bias init (len == out_channels), or None for
    # zeros. Used to start regression heads at the target distribution's
    # center (e.g. log-depth ~= 7.0 for z in log-mm) so adaptive-optimizer
    # updates spend steps on residuals, not on covering a large DC offset.
    bias_init_values: tuple | None = None

    @nn.compact
    def __call__(self, x):
        if self.bias_init_values is not None:
            bvals = np.asarray(self.bias_init_values, np.float32)

            def bias_init(key, shape, dtype=jnp.float32):
                del key
                return jnp.asarray(bvals, dtype).reshape(shape)

        else:
            bias_init = nn.initializers.zeros
        x = nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=bias_init,
            name="conv",
        )(x)
        if self.upsampling > 1:
            x = upsample_bilinear(x, self.upsampling, align_corners=True)
        return x

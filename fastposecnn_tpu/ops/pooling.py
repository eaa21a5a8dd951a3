"""TPU-friendly max pooling with a scatter-free backward.

Why: `nn.max_pool`'s VJP lowers to XLA SelectAndScatter, which cost
0.72 ms/step in the stage-2 training profile (BASELINE.md round-2
closing) — it is one of the two known stem pathologies. The backward here
is reformulated as elementwise selection + zero-insertion adds:

  forward:  y = reduce_window_max(x)            (unchanged, fast)
  backward: for each window, route the cotangent to the FIRST in-window
            position equal to the max (the same tie rule as XLA
            SelectAndScatter and torch MaxPool2d.backward), expressed as
            9 unrolled elementwise compares + 9 shifted zero-dilated adds
            — no sort, no scatter, no SelectAndScatter.

Only the (3,3)/stride-2/pad-1 configuration the ResNet stem needs is
implemented (reference stem: torchvision resnet maxpool,
FPC/lib/pose_regressor.py:607-613 encoder contract).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _forward(x: jax.Array) -> jax.Array:
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@jax.custom_vjp
def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """NHWC max pool, window 3x3, stride 2, padding 1."""
    return _forward(x)


def _fwd(x):
    y = _forward(x)
    return y, (x, y)


def _bwd(res, ct):
    x, y = res
    b, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    # Padded input so window offsets are plain static slices.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)

    # First-match selection, unrolled over the 9 window offsets in
    # row-major order (XLA SelectAndScatter / torch argmax tie rule).
    taken = jnp.zeros(y.shape, bool)
    grads = []  # (dy, dx, routed cotangent [B,Ho,Wo,C])
    for dy_off in range(3):
        for dx_off in range(3):
            patch = lax.slice(
                xp, (0, dy_off, dx_off, 0),
                (b, dy_off + 2 * ho - 1, dx_off + 2 * wo - 1, c),
                (1, 2, 2, 1),
            )
            sel = (patch == y) & ~taken
            taken = taken | sel
            grads.append((dy_off, dx_off, jnp.where(sel, ct, 0.0)))

    # Route each window's cotangent back to input coordinates:
    # input index = 2*out_index + offset - 1 (in padded coords just
    # 2*out+offset). Zero-dilate the [Ho,Wo] grid to stride 2 and add at
    # the static offset — all copies/adds, no scatter.
    gxp = jnp.zeros((b, h + 2, w + 2, c), ct.dtype)
    for dy_off, dx_off, g in grads:
        dil = jnp.zeros((b, 2 * ho, 2 * wo, c), ct.dtype)
        dil = dil.at[:, ::2, ::2, :].set(g)  # static-stride set: no gather
        # For odd input sizes the dilated grid overhangs the padded frame
        # by one row/col at the larger offsets — crop before padding (all
        # shapes static).
        dy_len = min(2 * ho, h + 2 - dy_off)
        dx_len = min(2 * wo, w + 2 - dx_off)
        dil = dil[:, :dy_len, :dx_len, :]
        gxp = gxp + jnp.pad(
            dil,
            ((0, 0),
             (dy_off, h + 2 - dy_off - dy_len),
             (dx_off, w + 2 - dx_off - dx_len),
             (0, 0)),
        )
    return (gxp[:, 1:h + 1, 1:w + 1, :],)


max_pool_3x3_s2.defvjp(_fwd, _bwd)

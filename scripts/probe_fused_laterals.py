"""A/B probe (VERDICT r2 item 5): fuse the four decoders' 1x1 lateral
convs (and optionally the four 1x1 head convs) into single wide convs.

Unlike the rejected grouped-conv decoder fusion (probe_fused_decoders.py,
0.28x), lateral fusion needs NO grouped conv: all four decoders' laterals
at a level consume the SAME encoder feature, so concatenating their output
channels into one [Cin -> 4*256] conv is mathematically identical with a
static channel split — a 4x-larger matmul for the MXU at zero semantic
cost. The seg blocks stay exactly as today.

Head fusion (variant C) concatenates the four decoder outputs and uses one
[4*128 -> sum(out)] conv whose off-diagonal blocks are zero — identical
forward at init, but training would fill the cross-terms, so C is an
inference-only shape probe.

Measures decoder+head stack only (encoder features precomputed), 480x640
bf16, batch 1/4, xplane device time. Adopt if >=5% e2e.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastposecnn_tpu.models.fpn import (  # noqa: E402
    FPNDecoder,
    SegmentationBlock,
    SegmentationHead,
    upsample_bilinear,
    upsample_nearest,
)
from scripts.probe_fused_decoders import device_time_ms  # noqa: E402

HEAD_OUT = (7, 24, 18, 18)  # mask, quaternion, xyz, scales (c=7)


class FusedLateralStack(nn.Module):
    """Four FPN decoders sharing fused wide lateral convs."""

    n_dec: int = 4
    pyramid: int = 256
    seg: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    fuse_heads: bool = False

    @nn.compact
    def __call__(self, feats):
        c2, c3, c4, c5 = feats[-4:]
        g, pc = self.n_dec, self.pyramid

        def lateral(name):
            return nn.Conv(g * pc, (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.he_uniform(),
                           name=name)

        # One wide conv per level; top-down adds stay in the wide layout
        # (they're elementwise, decoder slices never mix).
        p5 = lateral("p5")(c5)
        p4 = upsample_nearest(p5, 2) + lateral("p4")(c4)
        p3 = upsample_nearest(p4, 2) + lateral("p3")(c3)
        p2 = upsample_nearest(p3, 2) + lateral("p2")(c2)

        outs = []
        for d in range(g):
            sl = slice(d * pc, (d + 1) * pc)
            dec_out = None
            for i, (p, ups) in enumerate(
                zip((p5, p4, p3, p2), (3, 2, 1, 0))
            ):
                x = SegmentationBlock(
                    self.seg, n_upsamples=ups, dtype=self.dtype,
                    name=f"d{d}_seg{i}",
                )(p[..., sl])
                dec_out = x if dec_out is None else dec_out + x
            outs.append(dec_out)

        if not self.fuse_heads:
            return [
                SegmentationHead(o, upsampling=4, dtype=self.dtype,
                                 name=f"d{d}_head")(x)
                for d, (x, o) in enumerate(zip(outs, HEAD_OUT))
            ]
        cat = jnp.concatenate(outs, axis=-1)  # [B,H/4,W/4,4*seg]
        y = nn.Conv(sum(HEAD_OUT), (1, 1), dtype=self.dtype,
                    name="fused_head")(cat)
        y = upsample_bilinear(y, 4, align_corners=True)
        splits = np.cumsum(HEAD_OUT)[:-1]
        return jnp.split(y, splits, axis=-1)


def main():
    rng = np.random.default_rng(0)
    for b in (1, 4):
        feats = [
            jnp.asarray(rng.normal(size=(b, 480 // s, 640 // s, c)),
                        jnp.bfloat16)
            for s, c in ((4, 64), (8, 128), (16, 256), (32, 512))
        ]

        sep = [FPNDecoder(dtype=jnp.bfloat16) for _ in range(4)]
        heads = [SegmentationHead(o, upsampling=4, dtype=jnp.bfloat16)
                 for o in HEAD_OUT]
        sep_vars = [d.init(jax.random.key(i), feats) for i, d in
                    enumerate(sep)]
        head_vars = [
            h.init(jax.random.key(10 + i),
                   jnp.zeros((b, 120, 160, 128), jnp.bfloat16))
            for i, h in enumerate(heads)
        ]

        def run_sep(dvs, hvs, fs):
            return [
                h.apply(hv, d.apply(dv, fs))
                for d, h, dv, hv in zip(sep, heads, dvs, hvs)
            ]

        lat = FusedLateralStack(fuse_heads=False)
        lat_vars = lat.init(jax.random.key(0), feats)
        both = FusedLateralStack(fuse_heads=True)
        both_vars = both.init(jax.random.key(0), feats)

        dt_sep = device_time_ms(jax.jit(run_sep), sep_vars, head_vars,
                                feats, tag=f"lsep{b}")
        dt_lat = device_time_ms(jax.jit(lat.apply), lat_vars, feats,
                                tag=f"lfused{b}")
        dt_both = device_time_ms(jax.jit(both.apply), both_vars, feats,
                                 tag=f"lboth{b}")
        print(
            f"batch={b}: separate {dt_sep:.3f} ms | fused laterals "
            f"{dt_lat:.3f} ms ({dt_sep/dt_lat:.2f}x) | +fused heads "
            f"{dt_both:.3f} ms ({dt_sep/dt_both:.2f}x)", flush=True,
        )


if __name__ == "__main__":
    main()

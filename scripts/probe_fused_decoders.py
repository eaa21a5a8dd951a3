"""A/B probe: 4 separate FPN decoders vs one grouped-conv fused decoder.

Measures only the decoder stack (encoder features precomputed) at 480x640
batch 1/4 in bf16 — decides whether a fused-decoder refactor is worth it.
Mathematically the fused variant is identical: laterals concatenate along
output channels; seg-block convs become feature_group_count=4; GroupNorm
32-per-decoder == GroupNorm(128) on the concatenation (group boundaries
never straddle decoders).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastposecnn_tpu.models.fpn import (  # noqa: E402
    FPNDecoder,
    upsample_bilinear,
    upsample_nearest,
)


class FusedConv3x3GNReLU(nn.Module):
    features: int  # total (= 4 * per-decoder)
    groups: int = 4
    upsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    feature_group_count=self.groups, dtype=self.dtype,
                    name="conv")(x)
        x = nn.GroupNorm(num_groups=32 * self.groups, epsilon=1e-5,
                         dtype=jnp.float32, name="gn")(x)
        x = nn.relu(x)
        if self.upsample:
            x = upsample_bilinear(x, 2, align_corners=True)
        return x


class FusedFPNDecoder(nn.Module):
    pyramid: int = 256
    seg: int = 128
    groups: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        c2, c3, c4, c5 = feats[-4:]
        g, pc = self.groups, self.pyramid

        def lateral(name):
            return nn.Conv(g * pc, (1, 1), dtype=self.dtype, name=name)

        p5 = lateral("p5")(c5)
        p4 = upsample_nearest(p5, 2) + lateral("p4")(c4)
        p3 = upsample_nearest(p4, 2) + lateral("p3")(c3)
        p2 = upsample_nearest(p3, 2) + lateral("p2")(c2)
        outs = []
        for i, (p, ups) in enumerate(zip((p5, p4, p3, p2), (3, 2, 1, 0))):
            x = FusedConv3x3GNReLU(g * self.seg, g, upsample=ups > 0,
                                   dtype=self.dtype, name=f"seg{i}b0")(p)
            for j in range(1, ups):
                x = FusedConv3x3GNReLU(g * self.seg, g, upsample=True,
                                       dtype=self.dtype,
                                       name=f"seg{i}b{j}")(x)
            outs.append(x)
        return outs[0] + outs[1] + outs[2] + outs[3]  # [B,H/4,W/4, 4*128]


def device_time_ms(fn, *args, tag="fn", iters=5):
    """Median XLA-module device time from an xplane trace (wall-clock of
    individual jitted calls through the axon tunnel is unreliable)."""
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    out = jax.block_until_ready(fn(*args))
    trace_dir = f"/tmp/probe_trace_{tag}"
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    f = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    times = []
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Modules" not in line.name:
                continue
            for e in line.events:
                name = plane.event_metadata[e.metadata_id].name
                if "jit" in name and "threefry" not in name \
                        and "convert" not in name:
                    times.append(e.duration_ps / 1e9)
    times.sort()
    return times[len(times) // 2] if times else float("nan")


def main():
    rng = np.random.default_rng(0)
    for b in (1, 4):
        feats = [
            jnp.asarray(rng.normal(size=(b, 480 // s, 640 // s, c)),
                        jnp.bfloat16)
            for s, c in ((4, 64), (8, 128), (16, 256), (32, 512))
        ]

        sep = [FPNDecoder(dtype=jnp.bfloat16) for _ in range(4)]
        sep_vars = [d.init(jax.random.key(i), feats) for i, d in
                    enumerate(sep)]

        def run_sep(vs, fs):
            return [d.apply(v, fs) for d, v in zip(sep, vs)]

        fused = FusedFPNDecoder()
        fused_vars = fused.init(jax.random.key(0), feats)

        dt_sep = device_time_ms(jax.jit(run_sep), sep_vars, feats,
                                tag=f"sep{b}")
        dt_fused = device_time_ms(jax.jit(fused.apply), fused_vars, feats,
                                  tag=f"fused{b}")
        print(f"batch={b}: separate 4x decoders {dt_sep:.3f} ms | "
              f"fused grouped decoder {dt_fused:.3f} ms | "
              f"speedup {dt_sep/dt_fused:.2f}x", flush=True)


if __name__ == "__main__":
    main()

"""Probe space-to-depth input-transform variants on chip (trace-timed)."""

import sys


def main():
    import glob
    import gzip
    import json
    import shutil
    import collections

    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 480, 640, 3)), jnp.float32)

    def s2d_f32(x):
        b, h, w, c = x.shape
        return (x.reshape(b, h // 2, 2, w // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, h // 2, w // 2, 4 * c))

    def s2d_bf16(x):
        return s2d_f32(x.astype(jnp.bfloat16))

    def s2d_slices(x):
        b, h, w, c = x.shape
        parts = [x[:, a::2, bb::2, :] for a in (0, 1) for bb in (0, 1)]
        return jnp.concatenate(parts, axis=-1)

    def s2d_slices_bf16(x):
        return s2d_slices(x.astype(jnp.bfloat16))

    variants = {
        "f32 reshape/transpose": s2d_f32,
        "bf16 reshape/transpose": s2d_bf16,
        "f32 strided slices": s2d_slices,
        "bf16 strided slices": s2d_slices_bf16,
    }
    jitted = {k: jax.jit(v) for k, v in variants.items()}
    for k, f in jitted.items():
        jax.block_until_ready(f(x))

    trace_dir = "/tmp/s2d_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for k, f in jitted.items():
            for _ in range(8):
                out = f(x)
            jax.block_until_ready(out)

    tr = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    data = json.load(gzip.open(tr))
    evs = [e for e in data["traceEvents"]
           if e.get("ph") == "X" and "dur" in e and e.get("pid") == 3]
    mods = sorted([e for e in evs if e["tid"] == 2], key=lambda e: e["ts"])
    groups = collections.defaultdict(list)
    names = list(variants)
    per = len(mods) // len(names)
    for i, m in enumerate(mods):
        groups[names[min(i // per, len(names) - 1)]].append(m["dur"] / 1000)
    for k in names:
        ds = groups[k]
        print(f"{k:26s}: {sum(ds)/len(ds):.3f} ms")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

"""Finer fused bisection: add one sub-stage at a time behind the network."""

import time

import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu import config as C
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.ops.aggregation import aggregate_instances
    from fastposecnn_tpu.ops.class_compress import class_compress
    from fastposecnn_tpu.ops.connected_components import (
        extract_instances,
        label_components,
    )
    from fastposecnn_tpu.ops.voting import (
        generate_hypotheses,
        sample_mask_points,
        vote_counts_pallas,
    )

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    hp = C.inference()
    net = PoseRegressorNet(num_classes=hp.num_classes,
                           dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    image = jnp.asarray(rng.normal(size=(1, 480, 640, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), image[:, :64, :64])
    key = jax.random.key(1)

    def run(label, fn):
        f = jax.jit(fn)
        out = f(variables, image)
        t = timeit(f, variables, image)
        print(f"{label:26s}{t:8.2f} ms")
        return out

    run("net", lambda v, im: net.apply(v, im, train=False))
    run("net+argmax", lambda v, im: jnp.argmax(
        net.apply(v, im, train=False)["mask"], -1))
    run("net+compress", lambda v, im: class_compress(
        net.apply(v, im, train=False)))
    run("net+comp+label", lambda v, im: label_components(
        class_compress(net.apply(v, im, train=False))["mask"] != 0))

    def to_extract(v, im):
        cat = class_compress(net.apply(v, im, train=False))
        lbl = label_components(cat["mask"] != 0)
        return extract_instances(lbl, 16)

    run("net+comp+label+extract", to_extract)
    run("net+comp+agg", lambda v, im: aggregate_instances(
        class_compress(net.apply(v, im, train=False)), 16))

    def to_sample(v, im):
        agg = aggregate_instances(
            class_compress(net.apply(v, im, train=False)), 16)
        return sample_mask_points(key, agg["instance_masks"],
                                  agg["xy_dense"], 1024)

    run("net+..+sample", to_sample)

    def one_round(v, im):
        agg = aggregate_instances(
            class_compress(net.apply(v, im, train=False)), 16)
        pts, dirs, npts, ptv = sample_mask_points(
            key, agg["instance_masks"], agg["xy_dense"], 1024)
        pts = pts.reshape(16, 1024, 2)
        dirs = dirs.reshape(16, 1024, 2)
        hyps = generate_hypotheses(key, pts, dirs, 1024)
        return vote_counts_pallas(hyps, pts, dirs,
                                  ptv.reshape(16, 1024).astype(jnp.float32),
                                  0.999)

    run("net+..+1 vote round", one_round)


if __name__ == "__main__":
    main()

"""Bisect the exact bench program: where do the remaining ms live?"""

import time

import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
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
    from fastposecnn_tpu import constants, geometry
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.ops.aggregation import aggregate_instances
    from fastposecnn_tpu.ops.class_compress import class_compress
    from fastposecnn_tpu.ops.voting import (
        generate_hypotheses_rolled,
        ransac_vote_centers,
        refine_centers,
        sample_mask_points_bbox,
        vote_counts_pallas,
    )

    rng = np.random.default_rng(0)
    hp = C.inference()
    net = PoseRegressorNet(num_classes=hp.num_classes, dtype=jnp.bfloat16)
    image = jnp.asarray(rng.normal(size=(1, 480, 640, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), image[:, :64, :64])
    inv_K = jnp.asarray(np.linalg.inv(constants.INTRINSICS["CAMERA"]), jnp.float32)
    key = jax.random.key(1)
    P, H = 1024, 4096

    def upto_sample(v, im, k):
        agg = aggregate_instances(
            class_compress(net.apply(v, im, train=False)), 16)
        pts, dirs, npts, ptv = sample_mask_points_bbox(
            k, agg["instance_masks"], agg["xy_dense"], P)
        return pts, dirs, npts, ptv

    def upto_votes(v, im, k):
        agg = aggregate_instances(
            class_compress(net.apply(v, im, train=False)), 16)
        pts, dirs, npts, ptv = sample_mask_points_bbox(
            k, agg["instance_masks"], agg["xy_dense"], P)
        pts = pts.reshape(16, P, 2)
        dirs = dirs.reshape(16, P, 2)
        hyps = generate_hypotheses_rolled(k, pts, dirs, H)
        counts = vote_counts_pallas(
            hyps, pts, dirs, ptv.reshape(16, P).astype(jnp.float32), 0.999)
        win = jnp.argmax(counts, axis=-1)
        best = jnp.take_along_axis(hyps, win[:, None, None], axis=1)[:, 0]
        return best, counts

    def upto_refine(v, im, k):
        agg = aggregate_instances(
            class_compress(net.apply(v, im, train=False)), 16)
        pts, dirs, npts, ptv = sample_mask_points_bbox(
            k, agg["instance_masks"], agg["xy_dense"], P)
        pts = pts.reshape(16, P, 2)
        dirs = dirs.reshape(16, P, 2)
        hyps = generate_hypotheses_rolled(k, pts, dirs, H)
        pv = ptv.reshape(16, P).astype(jnp.float32)
        counts = vote_counts_pallas(hyps, pts, dirs, pv, 0.999)
        win = jnp.argmax(counts, axis=-1)
        best = jnp.take_along_axis(hyps, win[:, None, None], axis=1)[:, 0]
        centers = refine_centers(best, pts, dirs, pv, 0.999)
        return centers

    for name, fn in [
        ("upto_sample", upto_sample),
        ("upto_votes", upto_votes),
        ("upto_refine", upto_refine),
    ]:
        f = jax.jit(fn)
        print(f"{name:14s}{timeit(f, variables, image, key):8.2f} ms")

    # full bench program for reference
    from fastposecnn_tpu.pipeline import run_pipeline

    pcfg = C.pipeline_config_from(hp, use_pallas=True)

    def full(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        agg = out["aggregated"]
        return (out["categorical"]["mask"], agg["class_ids"], agg["xy"],
                agg["z"], agg["RT"])

    print(f"{'full':14s}{timeit(jax.jit(full), variables, image, key):8.2f} ms")


if __name__ == "__main__":
    main()

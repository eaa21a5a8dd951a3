"""Per-stage TPU timing to locate the bottleneck vs the 60 FPS target."""

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
    from fastposecnn_tpu import constants
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.ops.aggregation import aggregate_instances
    from fastposecnn_tpu.ops.class_compress import class_compress
    from fastposecnn_tpu.ops.connected_components import label_components
    from fastposecnn_tpu.ops.voting import hough_vote
    from fastposecnn_tpu.pipeline import run_pipeline

    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())

    hp = C.inference()
    rng = np.random.default_rng(0)

    # 0) dispatch floor
    trivial = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    print(f"dispatch floor: {timeit(trivial, x, iters=50):8.2f} ms")

    # 1) network
    net = PoseRegressorNet(num_classes=hp.num_classes,
                           dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    image = jnp.asarray(rng.normal(size=(1, 480, 640, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), image[:, :64, :64])
    net_fn = jax.jit(lambda v, im: net.apply(v, im, train=False))
    logits = net_fn(variables, image)
    print(f"network fwd:    {timeit(net_fn, variables, image):8.2f} ms")

    # 2) class compress
    cc_fn = jax.jit(class_compress)
    cat = cc_fn(logits)
    print(f"class compress: {timeit(cc_fn, logits):8.2f} ms")

    # 3) CC labeling alone
    lbl_fn = jax.jit(lambda m: label_components(m))
    print(f"cc labeling:    {timeit(lbl_fn, cat['mask'] != 0):8.2f} ms")

    # 4) aggregation (CC + instance extraction + means)
    agg_fn = jax.jit(lambda c: aggregate_instances(c, max_instances=16))
    agg = agg_fn(cat)
    print(f"aggregation:    {timeit(agg_fn, cat):8.2f} ms")

    # 5) voting (1000 hyps like INFERENCE preset)
    vote_fn = jax.jit(
        lambda k, a: hough_vote(k, a, max_points=1024, round_hyp_num=1000,
                                use_pallas=on_tpu)
    )
    key = jax.random.key(1)
    print(f"hough voting:   {timeit(vote_fn, key, agg):8.2f} ms")

    # 6) full pipeline fused
    pcfg = C.pipeline_config_from(hp, use_pallas=on_tpu)
    inv_K = jnp.asarray(np.linalg.inv(constants.INTRINSICS["CAMERA"]), jnp.float32)
    full = jax.jit(lambda v, im, k: run_pipeline(
        net.apply(v, im, train=False), k, pcfg, inv_K))
    print(f"full pipeline:  {timeit(full, variables, image, key):8.2f} ms")


if __name__ == "__main__":
    main()

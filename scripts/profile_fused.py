"""Bisect the fused-pipeline cost: add one stage at a time inside one jit."""

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
    from fastposecnn_tpu import constants, geometry
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.ops.aggregation import aggregate_instances
    from fastposecnn_tpu.ops.class_compress import class_compress
    from fastposecnn_tpu.ops.voting import hough_vote

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    hp = C.inference()
    net = PoseRegressorNet(num_classes=hp.num_classes,
                           dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    image = jnp.asarray(rng.normal(size=(1, 480, 640, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), image[:, :64, :64])
    inv_K = jnp.asarray(np.linalg.inv(constants.INTRINSICS["CAMERA"]), jnp.float32)
    key = jax.random.key(1)

    f_net = jax.jit(lambda v, im: net.apply(v, im, train=False))
    print(f"net only:          {timeit(f_net, variables, image):8.2f} ms")

    f_cc = jax.jit(lambda v, im: class_compress(net.apply(v, im, train=False)))
    cat = f_cc(variables, image)
    n_fg = int(jnp.sum(cat["mask"] != 0))
    print(f"net+compress:      {timeit(f_cc, variables, image):8.2f} ms  (fg px={n_fg})")

    f_agg = jax.jit(lambda v, im: aggregate_instances(
        class_compress(net.apply(v, im, train=False)), 16))
    agg = f_agg(variables, image)
    print(f"net+comp+agg:      {timeit(f_agg, variables, image):8.2f} ms  "
          f"(n_inst={int(jnp.sum(agg['valid']))})")

    f_vote = jax.jit(lambda v, im, k: hough_vote(
        k, aggregate_instances(class_compress(net.apply(v, im, train=False)), 16),
        max_points=1024, round_hyp_num=1000, use_pallas=on_tpu))
    out = f_vote(variables, image, key)
    print(f"net+..+vote:       {timeit(f_vote, variables, image, key):8.2f} ms  "
          f"(ratio={np.asarray(out['win_ratio'])[0][:4]})")

    def full(v, im, k):
        o = hough_vote(
            k, aggregate_instances(class_compress(net.apply(v, im, train=False)), 16),
            max_points=1024, round_hyp_num=1000, use_pallas=on_tpu)
        R, T, RT = geometry.batch_get_RT(
            o["quaternion"], o["xy"], o["z"][..., None], inv_K)
        return o["xy"], RT

    f_full = jax.jit(full)
    print(f"net+..+vote+rt:    {timeit(f_full, variables, image, key):8.2f} ms")


if __name__ == "__main__":
    main()

"""Where exactly does the quaternion path cost live?"""

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
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.ops.aggregation import aggregate_instances
    from fastposecnn_tpu.ops.class_compress import class_compress

    rng = np.random.default_rng(0)
    hp = C.inference()
    net = PoseRegressorNet(num_classes=hp.num_classes, dtype=jnp.bfloat16)
    image = jnp.asarray(rng.normal(size=(1, 480, 640, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), image[:, :64, :64])

    def t(name, fn):
        print(f"{name:28s}{timeit(jax.jit(fn), variables, image):8.2f} ms",
              flush=True)

    t("net quat head only", lambda v, im: net.apply(v, im, train=False)["quaternion"])
    t("compress z dense", lambda v, im: class_compress(
        net.apply(v, im, train=False))["z"])
    t("compress quat dense", lambda v, im: class_compress(
        net.apply(v, im, train=False))["quaternion"])
    t("agg z", lambda v, im: aggregate_instances(
        class_compress(net.apply(v, im, train=False)), 16)["z"])
    t("agg quat", lambda v, im: aggregate_instances(
        class_compress(net.apply(v, im, train=False)), 16)["quaternion"])
    t("agg scales", lambda v, im: aggregate_instances(
        class_compress(net.apply(v, im, train=False)), 16)["scales"])


if __name__ == "__main__":
    main()

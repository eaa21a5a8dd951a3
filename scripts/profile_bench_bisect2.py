"""Isolate the 19ms: dense-mask output vs RT vs dict plumbing."""

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
    from fastposecnn_tpu.pipeline import run_pipeline

    rng = np.random.default_rng(0)
    hp = C.inference()
    net = PoseRegressorNet(num_classes=hp.num_classes, dtype=jnp.bfloat16)
    image = jnp.asarray(rng.normal(size=(1, 480, 640, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), image[:, :64, :64])
    inv_K = jnp.asarray(np.linalg.inv(constants.INTRINSICS["CAMERA"]), jnp.float32)
    key = jax.random.key(1)
    pcfg = C.pipeline_config_from(hp, use_pallas=True)

    def agg_only(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        a = out["aggregated"]
        return a["class_ids"], a["xy"], a["z"]

    def agg_rt(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        a = out["aggregated"]
        return a["class_ids"], a["xy"], a["z"], a["RT"]

    def mask_only(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        return out["categorical"]["mask"]

    def mask_int8(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        return out["categorical"]["mask"].astype(jnp.uint8)

    for name, fn in [
        ("agg_only", agg_only),
        ("agg+RT", agg_rt),
        ("mask_only", mask_only),
        ("mask_uint8", mask_int8),
    ]:
        print(f"{name:12s}{timeit(jax.jit(fn), variables, image, key):8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()

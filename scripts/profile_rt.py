"""Which sub-op of batch_get_RT costs 18ms when fused?"""

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
    from fastposecnn_tpu.pipeline import run_pipeline

    rng = np.random.default_rng(0)
    hp = C.inference()
    net = PoseRegressorNet(num_classes=hp.num_classes, dtype=jnp.bfloat16)
    image = jnp.asarray(rng.normal(size=(1, 480, 640, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), image[:, :64, :64])
    inv_K = jnp.asarray(np.linalg.inv(constants.INTRINSICS["CAMERA"]), jnp.float32)
    key = jax.random.key(1)
    pcfg_novote_rt = C.pipeline_config_from(hp, use_pallas=True)
    import dataclasses

    pcfg = dataclasses.replace(pcfg_novote_rt, perform_rt_calculation=False)

    # standalone RT on concrete shapes
    q = jnp.asarray(rng.normal(size=(1, 16, 4)), jnp.float32)
    xy = jnp.asarray(rng.uniform(0, 640, (1, 16, 2)), jnp.float32)
    z = jnp.asarray(rng.uniform(500, 2000, (1, 16, 1)), jnp.float32)
    f_rt = jax.jit(lambda a, b, c: geometry.batch_get_RT(a, b, c, inv_K))
    print(f"standalone RT:      {timeit(f_rt, q, xy, z):8.2f} ms", flush=True)

    def base(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        a = out["aggregated"]
        return a["class_ids"], a["xy"], a["z"], a["quaternion"]

    print(f"fused no-RT (+quat): {timeit(jax.jit(base), variables, image, key):8.2f} ms",
          flush=True)

    def rt_T_only(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        a = out["aggregated"]
        T = geometry.backproject_to_translation(a["xy"], a["z"][..., None], inv_K)
        return a["class_ids"], T

    print(f"fused +T only:      {timeit(jax.jit(rt_T_only), variables, image, key):8.2f} ms",
          flush=True)

    def rt_R_only(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        a = out["aggregated"]
        R = geometry.quat_to_rotmat(geometry.safe_normalize(a["quaternion"]))
        return a["class_ids"], R

    print(f"fused +R only:      {timeit(jax.jit(rt_R_only), variables, image, key):8.2f} ms",
          flush=True)

    def rt_full(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        a = out["aggregated"]
        R, T, RT = geometry.batch_get_RT(
            a["quaternion"], a["xy"], a["z"][..., None], inv_K)
        return a["class_ids"], RT

    print(f"fused +full RT:     {timeit(jax.jit(rt_full), variables, image, key):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()

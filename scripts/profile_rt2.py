"""RT fused-graph pathology: which sub-expression?"""

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
    import dataclasses

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
    pcfg = dataclasses.replace(
        C.pipeline_config_from(hp, use_pallas=True),
        perform_rt_calculation=False,
    )

    def base_agg(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        return out["aggregated"]

    def t(name, fn):
        print(f"{name:24s}{timeit(jax.jit(fn), variables, image, key):8.2f} ms",
              flush=True)

    t("z+quat+xy (no RT)", lambda v, im, k: (
        lambda a: (a["class_ids"], a["xy"], a["z"], a["quaternion"])
    )(base_agg(v, im, k)))

    t("+T only", lambda v, im, k: (
        lambda a: geometry.backproject_to_translation(
            a["xy"], a["z"][..., None], inv_K)
    )(base_agg(v, im, k)))

    t("+R only", lambda v, im, k: (
        lambda a: geometry.quat_to_rotmat(geometry.safe_normalize(a["quaternion"]))
    )(base_agg(v, im, k)))

    def rt_const_quat(v, im, k):
        a = base_agg(v, im, k)
        q = jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1.0]), (1, 16, 4))
        R, T, RT = geometry.batch_get_RT(q, a["xy"], a["z"][..., None], inv_K)
        return RT

    t("+RT w/ const quat", rt_const_quat)

    def rt_const_xyz(v, im, k):
        a = base_agg(v, im, k)
        xy = jnp.broadcast_to(jnp.asarray([320.0, 240.0]), (1, 16, 2))
        z = jnp.full((1, 16, 1), 1000.0)
        R, T, RT = geometry.batch_get_RT(a["quaternion"], xy, z, inv_K)
        return RT

    t("+RT w/ const xy/z", rt_const_xyz)


if __name__ == "__main__":
    main()

"""Trace BASELINE config 2 (full-head inference, batch=4) on the device.

Writes /tmp/jax_trace_cfg2; parse with scripts/xplane_top.py. Also prints
the measured imgs/s for several batch sizes so batch scaling is visible.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu import config as C
    from fastposecnn_tpu import constants
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.pipeline import run_pipeline

    on_tpu = jax.default_backend() == "tpu"
    hp = C.inference(BATCH_SIZE=4)
    net = PoseRegressorNet(
        num_classes=hp.num_classes,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    pcfg = C.pipeline_config_from(hp, use_pallas=on_tpu)
    inv_K = jnp.asarray(
        np.linalg.inv(constants.INTRINSICS["REAL"]), jnp.float32
    )
    rng = np.random.default_rng(0)
    variables = net.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )

    @jax.jit
    def f(v, im):
        out = run_pipeline(net.apply(v, im, train=False),
                           jax.random.key(1), pcfg, inv_K)
        a = out["aggregated"]
        return a["xy"], a["z"], a["RT"], out["categorical"]["mask"]

    for b in (1, 2, 4):
        image = jnp.asarray(rng.normal(size=(b, 480, 640, 3)), jnp.float32)
        jax.block_until_ready(f(variables, image))
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = f(variables, image)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"batch={b}: {dt*1e3:.2f} ms/batch = {b/dt:.1f} imgs/s",
              flush=True)

    image = jnp.asarray(rng.normal(size=(4, 480, 640, 3)), jnp.float32)
    jax.block_until_ready(f(variables, image))
    jax.profiler.start_trace("/tmp/jax_trace_cfg2")
    for _ in range(5):
        out = f(variables, image)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print("trace written to /tmp/jax_trace_cfg2")


if __name__ == "__main__":
    main()

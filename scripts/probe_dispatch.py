"""Characterize the host-side per-dispatch overhead of the e2e bench.

Device span of the bench program is ~2.73 ms (366 FPS device-bound) but
bench.py measures ~250-271 FPS — a ~1 ms/iter host gap through the axon
tunnel. This probe A/Bs dispatch variants of the IDENTICAL computation:

  jit30/jit100   — bench.py's loop at 30 vs 100 iters (queue-depth /
                   amortization effects)
  aot100         — forward.lower(...).compile() handle (skips the jit
                   dispatch cache lookup / arg canonicalization)
  nomask100      — drop the dense uint8 mask output (informational:
                   is output handling the overhead?)
  scan8          — 8 frames per dispatch (lax.scan inside ONE program,
                   batch still 1): divides any per-dispatch host/tunnel
                   cost by 8. If per-frame time here matches the xplane
                   device bound (~2.73 ms), the residual e2e gap is
                   per-dispatch attachment latency, not program time —
                   and a host-attached serving process (or one that
                   pipelines requests) gets the device-bound rate.
  tinyout        — full pipeline, return one scalar: bounds the
                   output-fetch side separately from dispatch.

Each variant: warm, then time the loop wall; print ms/iter and FPS.
"""
import os
import pathlib
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "upb")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, args, iters):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    from fastposecnn_tpu import config as C
    from fastposecnn_tpu import constants
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.pipeline import run_pipeline
    from fastposecnn_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    hp = C.inference()
    net = PoseRegressorNet(num_classes=hp.num_classes, dtype=jnp.bfloat16)
    pcfg = C.pipeline_config_from(hp, use_pallas=True)
    inv_K = jnp.asarray(np.linalg.inv(constants.scaled_intrinsics(
        hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH)), jnp.float32)
    image = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), image[:, :64, :64, :])

    def forward_py(variables, image):
        logits = net.apply(variables, image, train=False)
        out = run_pipeline(logits, jax.random.key(1), pcfg, inv_K)
        agg = out["aggregated"]
        return (out["categorical"]["mask"].astype(jnp.uint8),
                agg["class_ids"], agg["xy"], agg["z"], agg["RT"])

    def forward_nomask_py(variables, image):
        logits = net.apply(variables, image, train=False)
        out = run_pipeline(logits, jax.random.key(1), pcfg, inv_K)
        agg = out["aggregated"]
        return (agg["class_ids"], agg["xy"], agg["z"], agg["RT"])

    def forward_scan8_py(variables, images8):
        # images8: [8, 1, H, W, 3] — 8 batch-1 frames through the FULL
        # pipeline inside one program; outputs stacked on device.
        def body(_, image):
            return 0, forward_py(variables, image)

        _, outs = jax.lax.scan(body, 0, images8)
        return outs

    def forward_tinyout_py(variables, image):
        outs = forward_py(variables, image)
        # consume everything into one scalar so nothing is DCE'd
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    forward = jax.jit(forward_py)
    forward_nomask = jax.jit(forward_nomask_py)
    aot = jax.jit(forward_py).lower(variables, image).compile()
    images8 = jnp.broadcast_to(image, (8,) + image.shape)
    aot_scan8 = jax.jit(forward_scan8_py).lower(variables, images8).compile()
    aot_tiny = jax.jit(forward_tinyout_py).lower(variables, image).compile()

    for name, fn, args, iters, per in [
        ("jit30", forward, (variables, image), 30, 1),
        ("jit100", forward, (variables, image), 100, 1),
        ("aot100", aot, (variables, image), 100, 1),
        ("nomask100", forward_nomask, (variables, image), 100, 1),
        ("scan8", aot_scan8, (variables, images8), 40, 8),
        ("tinyout", aot_tiny, (variables, image), 100, 1),
        ("jit30_b", forward, (variables, image), 30, 1),
    ]:
        dt = timed(fn, args, iters) / per
        print(f"{name:10s} {dt*1e3:7.3f} ms/frame  {1/dt:7.1f} FPS")


if __name__ == "__main__":
    main()

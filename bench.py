"""Benchmark: end-to-end single-image inference FPS on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver's north-star target of 60 FPS end-to-end
(BASELINE.md — the reference repo publishes no numbers; the CUDA original
printed per-stage ms via its TimerDecorator, FPC/tools/timer.py:53-61).

The benched program is the full INFERENCE-preset pipeline: ResNet18-FPN x4
decoders -> class compression -> CC labeling -> RANSAC hough voting
(1000 hypotheses, Pallas kernel) -> RT reconstruction, batch 1 at 480x640.
"""

import json
import time

import numpy as np


def _probe_devices(timeout_s: float = 120.0):
    """Fail fast (instead of hanging forever) when the remote-TPU tunnel is
    down: device enumeration through the axon relay blocks indefinitely
    during an outage (observed 5h+, round 3), so probe it in a thread with
    a deadline before committing the main thread to jax."""
    import threading

    out = {}

    def probe():
        import jax

        out["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in out:
        print(json.dumps({
            "metric": "e2e_inference_fps_batch1_640x480",
            "value": 0.0,
            "unit": "fps",
            "vs_baseline": 0.0,
            "error": f"device enumeration timed out after {timeout_s:.0f}s "
                     "(TPU tunnel down?) — not a performance measurement",
        }))
        raise SystemExit(2)


def main():
    _probe_devices()
    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    from fastposecnn_tpu import config as C
    from fastposecnn_tpu import constants
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.pipeline import run_pipeline

    on_tpu = jax.default_backend() == "tpu"

    hp = C.inference()
    net = PoseRegressorNet(
        num_classes=hp.num_classes,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    pcfg = C.pipeline_config_from(hp, use_pallas=True if on_tpu else False)
    inv_K = jnp.asarray(
        np.linalg.inv(constants.scaled_intrinsics(
            hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH)), jnp.float32
    )

    key = jax.random.key(0)
    image = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH, 3)),
        jnp.float32,
    )
    variables = net.init(key, image[:, :64, :64, :])  # init on small spatial
    # (conv params are spatial-size independent)

    @jax.jit
    def forward(variables, image):
        logits = net.apply(variables, image, train=False)
        out = run_pipeline(logits, jax.random.key(1), pcfg, inv_K)
        agg = out["aggregated"]
        return (
            # uint8 halves the dense-output relayout cost vs int32 (class
            # count is < 256 by construction)
            out["categorical"]["mask"].astype(jnp.uint8),
            agg["class_ids"],
            agg["xy"],
            agg["z"],
            agg["RT"],
        )

    # AOT-compile and dispatch through the compiled executable: a serving
    # process calls one frozen program, and the compiled handle skips the
    # per-call jit dispatch (signature re-canonicalization) that measured
    # ~0.3-0.6 ms/iter through the remote-TPU tunnel
    # (scripts/probe_dispatch.py: jit 3.63/3.28 ms/iter at 30/100 iters vs
    # AOT 3.01; dropping the dense mask output changes nothing, so the
    # cost is dispatch, not output handling).
    forward_c = forward.lower(variables, image).compile()

    # Warmup
    result = forward_c(variables, image)
    jax.block_until_ready(result)

    iters = 100 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        result = forward_c(variables, image)
    # Completion proof stronger than block_until_ready (which round 4
    # caught reporting impossible times through the remote-device tunnel
    # in scripts/mfu_report.py): fetch real output bytes from the final
    # program — they cannot exist before it (and, single device, every
    # program before it) has executed. result[4] is the tiny RT tensor.
    np.asarray(jax.device_get(result[4])).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "e2e_inference_fps_batch1_640x480",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

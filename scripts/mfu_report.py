"""FLOP + MFU accounting for the served pipeline (VERDICT r1 weak #5).

Uses XLA's compiled cost analysis for the exact flop count of each program
(network-only and full pipeline), measures wall-clock on the current
backend, and prints FLOPs/frame, TFLOP/s, and MFU against the chip's peak.

Run on the TPU host: `python scripts/mfu_report.py [--batch N]`.
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# bf16 peak TFLOP/s per chip (public spec sheets)
PEAK_TFLOPS = {"v5e": 197.0, "v5p": 459.0, "v4": 275.0, "v5 lite": 197.0}


def chip_peak(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for k, v in PEAK_TFLOPS.items():
        if k in kind:
            return v
    return 197.0  # default to v5e


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu import config as C
    from fastposecnn_tpu import constants
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.pipeline import run_pipeline

    on_tpu = jax.default_backend() == "tpu"
    hp = C.inference(BATCH_SIZE=args.batch)
    net = PoseRegressorNet(
        num_classes=hp.num_classes,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    pcfg = C.pipeline_config_from(hp, use_pallas=on_tpu)
    inv_K = jnp.asarray(
        np.linalg.inv(constants.INTRINSICS[hp.DATASET_NAME]), jnp.float32
    )
    b = args.batch
    image = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, 480, 640, 3)), jnp.float32
    )
    variables = net.init(jax.random.key(0), image[:1, :64, :64])

    def full(v, im):
        out = run_pipeline(net.apply(v, im, train=False),
                           jax.random.key(1), pcfg, inv_K)
        a = out["aggregated"]
        return (out["categorical"]["mask"].astype(jnp.uint8),
                a["xy"], a["z"], a["RT"])

    def model_only(v, im):
        return net.apply(v, im, train=False)

    peak = chip_peak(jax.devices()[0])
    print(f"device: {jax.devices()[0].device_kind}, "
          f"assumed bf16 peak {peak} TFLOP/s")

    for name, fn in (("model_only", model_only), ("full_pipeline", full)):
        jitted = jax.jit(fn)
        compiled = jitted.lower(variables, image).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0))
        out = jitted(variables, image)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jitted(variables, image)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        tflops = flops / dt / 1e12
        print(
            f"{name}: {flops/1e9/b:.1f} GFLOP/frame, {dt*1e3:.2f} ms/batch "
            f"({b/dt:.1f} imgs/s), {tflops:.1f} TFLOP/s = "
            f"{100*tflops/peak:.1f}% MFU"
        )


if __name__ == "__main__":
    main()

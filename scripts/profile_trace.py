"""Capture a jax.profiler trace of the full pipeline and print top ops."""

import glob
import json
import sys

import numpy as np


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
    pcfg = C.pipeline_config_from(hp, use_pallas=True)

    @jax.jit
    def full(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        a = out["aggregated"]
        return (out["categorical"]["mask"].astype(jnp.uint8),
                a["class_ids"], a["xy"], a["z"], a["RT"])

    # warmup/compile
    jax.block_until_ready(full(variables, image, key))

    trace_dir = "/tmp/jax_trace"
    jax.profiler.start_trace(trace_dir)
    for _ in range(5):
        out = full(variables, image, key)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("trace files:", files)
    if not files:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("op_profile", "overview_page^"):
        try:
            data, _ = rtd.xspace_to_tool_data(files, tool, {})
            with open(f"/tmp/trace_{tool.strip('^')}.json", "w") as f:
                f.write(data if isinstance(data, str) else str(data))
            print(f"wrote /tmp/trace_{tool.strip('^')}.json")
        except Exception as e:
            print(f"{tool} failed: {type(e).__name__}: {e}")

    # Try hlo_op stats table too
    try:
        data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats^", {})
        with open("/tmp/trace_op_stats.json", "w") as f:
            f.write(data if isinstance(data, str) else str(data))
        print("wrote /tmp/trace_op_stats.json")
    except Exception as e:
        print("op_stats failed:", type(e).__name__, e)


if __name__ == "__main__":
    main()

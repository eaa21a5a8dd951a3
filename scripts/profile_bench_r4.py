"""Trace the bench.py forward program on chip; print XLA-Modules median
span (true device time/frame) for the e2e inference pipeline.

Usage: python scripts/profile_bench_r4.py [trace_dir]
Then:  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python scripts/xplane_top.py <trace_dir> 30
"""
import os
import pathlib
import shutil
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "upb")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_trace_r4"
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
    key = jax.random.key(0)
    image = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH, 3)), jnp.float32)
    variables = net.init(key, image[:, :64, :64, :])

    @jax.jit
    def forward(variables, image):
        logits = net.apply(variables, image, train=False)
        out = run_pipeline(logits, jax.random.key(1), pcfg, inv_K)
        agg = out["aggregated"]
        return (out["categorical"]["mask"].astype(jnp.uint8),
                agg["class_ids"], agg["xy"], agg["z"], agg["RT"])

    jax.block_until_ready(forward(variables, image))
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    r = None
    for _ in range(20):
        r = forward(variables, image)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()

    import glob
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    f = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    times = []
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Modules" not in line.name:
                continue
            for e in line.events:
                name = plane.event_metadata[e.metadata_id].name
                if "jit_forward" in name:
                    times.append(e.duration_ps / 1e9)
    times.sort()
    if times:
        med = times[len(times) // 2]
        print(f"jit_forward device span: n={len(times)} median={med:.3f} ms "
              f"min={times[0]:.3f} max={times[-1]:.3f} "
              f"(=> {1000.0/med:.1f} FPS device-bound)")
    else:
        print("no jit_forward module events found")


if __name__ == "__main__":
    main()

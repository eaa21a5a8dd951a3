"""Run the BASELINE.md measurement configs and print one JSON line each.

The five configs come from the driver's BASELINE.json (mirrored in
BASELINE.md): since the reference repo publishes no numbers and the real
NOCS data isn't available in this environment, every config runs on
synthetic NOCS-format data at the reference resolution. Timings are real
device wall-clock via block_until_ready.

Usage: python scripts/baseline_runs.py [--configs 1,2,3,4,5] [--quick]
"""

import argparse
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

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
    return (time.perf_counter() - t0) / iters


def emit(name, value, unit, extra=None):
    rec = {"config": name, "value": round(value, 3), "unit": unit}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def config1_mask_only_forward(quick):
    """Config 1: ResNet18-FPN mask-head-only forward, one image."""
    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu.models import PoseRegressorNet

    on_tpu = jax.default_backend() == "tpu"
    net = PoseRegressorNet(
        num_classes=7, dtype=jnp.bfloat16 if on_tpu else jnp.float32
    )
    image = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 480, 640, 3)), jnp.float32
    )
    variables = net.init(jax.random.key(0), image[:, :64, :64])

    f = jax.jit(lambda v, im: jnp.argmax(
        net.apply(v, im, train=False)["mask"], -1))
    dt = timeit(f, variables, image, iters=5 if quick else 30)
    emit("1_mask_forward_1img", 1.0 / dt, "fps")


def config2_full_head_batch4(quick):
    """Config 2: full heads + voting aggregation, batch=4."""
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
    image = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 480, 640, 3)), jnp.float32
    )
    variables = net.init(jax.random.key(0), image[:1, :64, :64])

    @jax.jit
    def f(v, im):
        out = run_pipeline(net.apply(v, im, train=False),
                           jax.random.key(1), pcfg, inv_K)
        a = out["aggregated"]
        return a["xy"], a["z"], a["RT"], out["categorical"]["mask"]

    dt = timeit(f, variables, image, iters=3 if quick else 20)
    emit("2_full_head_batch4", 4.0 / dt, "imgs_per_s")


def _train_throughput(preset_name, quick):
    import dataclasses

    import jax

    from fastposecnn_tpu import config as C
    from fastposecnn_tpu.data.synthetic import SceneConfig, make_batch
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.train import optim
    from fastposecnn_tpu.train.task import create_train_state, make_train_step

    hp = C.PRESETS[preset_name]()
    hp = dataclasses.replace(hp, BATCH_SIZE=4 if not quick else 2)
    net = PoseRegressorNet(num_classes=hp.num_classes)
    pcfg = C.pipeline_config_from(
        hp, use_pallas=jax.default_backend() == "tpu"
    )
    from fastposecnn_tpu import constants

    inv_K = np.linalg.inv(constants.INTRINSICS["CAMERA"])
    opt = optim.make_optimizer(hp)
    state = create_train_state(net, opt, jax.random.key(0), hp)
    step = jax.jit(make_train_step(net, opt, hp, pcfg, inv_K))
    scfg = SceneConfig(height=hp.IMAGE_HEIGHT, width=hp.IMAGE_WIDTH,
                       num_classes=hp.num_classes,
                       max_instances=hp.MAX_INSTANCES)
    batch = make_batch(np.random.default_rng(0), scfg, hp.BATCH_SIZE)

    def f(st):
        st, logs = step(st, batch, jax.random.key(1))
        return st

    # includes first compile warmup inside timeit
    dt = timeit(f, state, iters=2 if quick else 10)
    return hp.BATCH_SIZE / dt


def config3_stage1_training(quick):
    """Config 3: MASK_TRAINING throughput at 480x640."""
    emit("3_stage1_mask_training", _train_throughput("MASK_TRAINING", quick),
         "imgs_per_s")


def config4_stage2_training(quick):
    """Config 4: HEAD_TRAINING throughput (full pipeline in the loss)."""
    emit("4_stage2_head_training", _train_throughput("HEAD_TRAINING", quick),
         "imgs_per_s")


def config5_eval_sweep(quick):
    """Config 5: the evaluate.py sweep on synthetic data."""
    from fastposecnn_tpu.cli import evaluate as E

    out = pathlib.Path(tempfile.mkdtemp()) / "eval"
    n = 8 if quick else 32
    t0 = time.perf_counter()
    E.main([
        "--synthetic", str(n), "--VALID_SIZE", str(n), "--BATCH_SIZE", "2",
        "--MAX_INSTANCES", "8", "--output", str(out),
        "--HV_NUM_OF_HYPOTHESES", "256",
    ])
    emit("5_eval_sweep", time.perf_counter() - t0, "s",
         {"images": n})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", default="1,2,3,4,5")
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()
    fns = {
        "1": config1_mask_only_forward,
        "2": config2_full_head_batch4,
        "3": config3_stage1_training,
        "4": config4_stage2_training,
        "5": config5_eval_sweep,
    }
    for c in args.configs.split(","):
        fns[c.strip()](args.quick)


if __name__ == "__main__":
    main()

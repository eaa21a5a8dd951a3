"""Trace the stage-1 training step on TPU and print top device ops."""

import collections
import glob
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import dataclasses

    import jax

    from fastposecnn_tpu import config as C
    from fastposecnn_tpu import constants
    from fastposecnn_tpu.data.synthetic import SceneConfig, make_batch
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.train import optim
    from fastposecnn_tpu.train.task import create_train_state, make_train_step

    import jax.numpy as jnp

    import sys
    preset = sys.argv[1] if len(sys.argv) > 1 else "MASK_TRAINING"
    hp = C.PRESETS[preset](BATCH_SIZE=2)
    if "nodense" in sys.argv[2:]:
        # A/B the cost of round-3's dense supervision (the round-2 24.4 ms
        # step predates it): zero dense weights compile the step without
        # the dense loss terms' forward+backward.
        hp = dataclasses.replace(
            hp, DENSE_QUAT_WEIGHT=0.0, DENSE_XY_WEIGHT=0.0,
            DENSE_Z_WEIGHT=0.0, DENSE_SCALES_WEIGHT=0.0,
        )
    net = PoseRegressorNet(num_classes=hp.num_classes)
    pcfg = C.pipeline_config_from(hp, use_pallas=True)
    inv_K = np.linalg.inv(constants.INTRINSICS["CAMERA"])
    opt = optim.make_optimizer(hp)
    state = create_train_state(net, opt, jax.random.key(0), hp)
    # ckpt=PATH: trace with TRAINED weights. Random-init weights make the
    # adaptive RANSAC confidence loop run to its iteration cap (garbage
    # masks/vectors -> never confident), inflating the step's voting cost
    # far beyond what any real training epoch past the first pays.
    for a in sys.argv[2:]:
        if a.startswith("ckpt="):
            from fastposecnn_tpu.train.checkpoint import load_any_checkpoint

            state, hp = load_any_checkpoint(a[5:], state, hp)
            print("loaded weights from", a[5:])
    step = jax.jit(make_train_step(net, opt, hp, pcfg, inv_K))
    scfg = SceneConfig(height=480, width=640, num_classes=hp.num_classes,
                       max_instances=hp.MAX_INSTANCES)
    batch = make_batch(np.random.default_rng(0), scfg, 2)
    batch = jax.tree.map(jnp.asarray, batch)

    state, logs = step(state, batch, jax.random.key(1))
    jax.block_until_ready(logs["pose/total_loss"])

    jax.profiler.start_trace("/tmp/jax_trace_train_" + preset)
    for i in range(3):
        state, logs = step(state, batch, jax.random.key(1))
    jax.block_until_ready(logs["pose/total_loss"])
    jax.profiler.stop_trace()
    print("trace:", glob.glob("/tmp/jax_trace_train_" + preset + "/**/*.xplane.pb", recursive=True))


if __name__ == "__main__":
    main()

"""Replay a captured fault batch through the train step.

`train/loop.py` saves the host batch that produced non-finite gradients as
`fault_batch_step<N>.npz` in the run dir (the working version of the
capture FPC/lib/pose_regressor.py:374-399 left commented out). This tool
reloads it, reruns the forward/backward with a chosen checkpoint, and
reports which loss terms / gradient subtrees are non-finite.

Usage:
  python scripts/replay_fault.py <fault.npz> [--checkpoint DIR]
      [--preset HEAD_TRAINING] [--HPARAM value ...]
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None):
    from fastposecnn_tpu import config as C

    parser = argparse.ArgumentParser()
    parser.add_argument("fault", help="fault_batch_step<N>.npz file")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--preset", default="HEAD_TRAINING",
                        choices=sorted(C.PRESETS))
    C.add_cli_overrides(parser, C.HParams())
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu import constants
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.train import checkpoint as ckpt
    from fastposecnn_tpu.train import optim
    from fastposecnn_tpu.train.task import create_train_state, make_train_step

    data = np.load(args.fault)
    batch = {
        "image": data["image"],
        "mask": data["mask"],
        "agg": {k[len("agg_"):]: data[k] for k in data.files
                if k.startswith("agg_")},
    }
    b, h, w, _ = batch["image"].shape
    hp = C.PRESETS[args.preset]()
    hp = C.apply_cli_overrides(hp, args)
    import dataclasses

    hp = dataclasses.replace(
        hp, IMAGE_HEIGHT=h, IMAGE_WIDTH=w, BATCH_SIZE=b,
        MAX_INSTANCES=batch["agg"]["valid"].shape[1],
    )
    if args.checkpoint:
        hp = ckpt.merge_arch_from_any(args.checkpoint, hp)

    net = PoseRegressorNet(num_classes=hp.num_classes,
                           encoder_name=hp.ENCODER)
    opt = optim.make_optimizer(hp)
    state = create_train_state(net, opt, jax.random.key(0), hp)
    if args.checkpoint:
        state, hp = ckpt.load_any_checkpoint(args.checkpoint, state, hp)

    pcfg = C.pipeline_config_from(hp)
    inv_K = np.linalg.inv(constants.scaled_intrinsics(hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH))
    step = jax.jit(make_train_step(net, opt, hp, pcfg, inv_K))
    db = jax.tree.map(jnp.asarray, batch)
    new_state, logs = step(state, db, jax.random.key(1))
    logs = jax.device_get(logs)

    print("replayed step logs:")
    bad = []
    for k in sorted(logs):
        v = float(logs[k])
        flag = "" if np.isfinite(v) else "   <-- NON-FINITE"
        if not np.isfinite(v):
            bad.append(k)
        print(f"  {k} = {v:.6g}{flag}")
    finite = float(logs.get("grad/finite", 1.0))
    print(f"grad/finite = {finite}")
    if finite < 1.0 or bad:
        print("REPRODUCED: non-finite values present")
        return 1
    print("not reproduced with these weights (fault was state-dependent)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

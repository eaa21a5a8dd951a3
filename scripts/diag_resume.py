"""Diagnose the c6 resume regression (round 5, 00:19 UTC).

Observed: FULL_c6 resumed from ckpt_FULL_c5.npz and logged epoch-0
val_loss 5.69 / ce 0.088 (c5 ended at 1.58 / 0.006), yet the SAME npz
evaluated through cli.evaluate on held-out seed-99 scores 19.5 deg
geodesic — the weights are demonstrably good. This script reproduces
the staged trainer's exact resume + valid path on the host CPU against
the exact valid bank the chunk staged (/tmp/rot_banks/valid), to
separate: (a) npz-loaded-into-train-state wrong, (b) valid DATA
different, (c) something chip-side (bf16 / staging / scan).

Usage: python scripts/diag_resume.py [npz] [valid_dir] [n_batches]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import os

# DIAG_TPU=1: run on the real chip (same bf16 net selection as the staged
# trainer) to separate host-path from chip-path failures.
ON_TPU = os.environ.get("DIAG_TPU") == "1"
import jax

if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:  # noqa: BLE001
        pass
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fastposecnn_tpu.train import optim
from fastposecnn_tpu.config import PRESETS, pipeline_config_from
from fastposecnn_tpu.constants import scaled_intrinsics
from fastposecnn_tpu.data.nocs import NOCSDataset, collate
from fastposecnn_tpu.models.pose_regressor import PoseRegressorNet
from fastposecnn_tpu.train import checkpoint as ckpt
from fastposecnn_tpu.train.task import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

npz = sys.argv[1] if len(sys.argv) > 1 else "evidence/rot_demo/ckpt_FULL_c5.npz"
valid_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rot_banks/valid"
n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 2

import dataclasses

hp = PRESETS["HEAD_TRAINING"]()
hp = dataclasses.replace(
    hp,
    IMAGE_HEIGHT=224, IMAGE_WIDTH=320, BATCH_SIZE=8,
    TRAIN_SIZE=1024, VALID_SIZE=128, MAX_INSTANCES=8,
    MAX_VOTE_POINTS=1024, HV_NUM_OF_HYPOTHESES=128,
    DENSE_QUAT_WEIGHT=1.0, DENSE_XY_WEIGHT=1.0, DENSE_Z_WEIGHT=1.0,
    DENSE_SCALES_WEIGHT=1.0, DENSE_SYM_QUAT_MODE="full",
    LEARNING_RATE=1.2e-5, ENCODER_LEARNING_RATE=1.2e-6,
)

net = PoseRegressorNet(
    num_classes=hp.num_classes, encoder_name=hp.ENCODER,
    dtype=jnp.bfloat16 if (ON_TPU and jax.default_backend() == "tpu")
    else jnp.float32,
    z_bias_init=hp.HEAD_Z_BIAS_INIT, scales_bias_init=hp.HEAD_SCALES_BIAS_INIT,
)
pcfg = pipeline_config_from(hp)
optimizer = optim.make_optimizer(hp)
state = create_train_state(net, optimizer, jax.random.key(0), hp)
state, hp = ckpt.load_any_checkpoint(npz, state, hp)
print("loaded", npz)

inv_K = np.linalg.inv(
    scaled_intrinsics(hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH)
)
train_step = make_train_step(net, optimizer, hp, pcfg, inv_K)
eval_step = make_eval_step(net, hp, pcfg, inv_K)

ds = NOCSDataset(
    valid_dir, max_size=hp.VALID_SIZE, augmentation="valid",
    max_instances=hp.MAX_INSTANCES,
    selected_classes=hp.SELECTED_CLASSES, dataset_name=hp.DATASET_NAME,
)
print("valid dataset:", len(ds), "samples from", valid_dir)

from fastposecnn_tpu import metrics as M

bank = M.init_pose_metric_bank()
full_valid = jnp.ones((hp.BATCH_SIZE,), jnp.float32)
for b in range(n_batches):
    samples = [ds[i] for i in range(b * hp.BATCH_SIZE, (b + 1) * hp.BATCH_SIZE)]
    batch = collate(samples)
    batch = {k: v for k, v in batch.items()}
    batch.pop("path", None)
    if ON_TPU:
        # Transfer-integrity check: the staged trainer device_puts ~1 GB
        # through the tunnel; verify round-trip bit-exactness for this
        # batch before computing losses on it.
        dev = jax.device_put(batch)
        back = jax.device_get(dev)
        flat_a, _ = jax.tree_util.tree_flatten_with_path(batch)
        flat_b = jax.tree_util.tree_leaves(back)
        for (kp, xa), xb in zip(flat_a, flat_b):
            if not np.array_equal(np.asarray(xa), np.asarray(xb)):
                print(f"  TRANSFER MISMATCH batch {b} at {kp}")
        batch = dev
    rng = jax.random.key(b)
    # Eval-mode (what val_loss measures)
    logs, bank, _ = eval_step(state, batch, rng, bank)
    logs = {k: float(v) for k, v in logs.items()}
    print(
        f"eval  batch {b}: total={logs.get('pose/total_loss'):.4f} "
        f"ce={logs.get('mask/loss_ce'):.4f} "
        f"matched={logs.get('pose/num_matched')}"
    )
    # Train-mode loss (one step; report pre-update loss)
    st2, tlogs = train_step(state, batch, rng)
    tlogs = {k: float(v) for k, v in tlogs.items()}
    print(
        f"train batch {b}: total={tlogs.get('pose/total_loss'):.4f} "
        f"ce={tlogs.get('mask/loss_ce'):.4f} "
        f"matched={tlogs.get('pose/num_matched')} "
        f"gnorm={tlogs.get('grad/global_norm'):.3f}"
    )
pose = M.compute_pose_metric_bank(jax.device_get(bank))
print({k: round(float(v), 3) for k, v in pose.items()})

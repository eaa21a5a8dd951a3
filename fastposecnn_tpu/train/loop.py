"""Host-side training loop: epochs, logging, plateau LR, checkpoints.

Parity: FPC/train.py:237-333 (run dir + HPARAM.json + Trainer.fit) and the
callback suite (FPC/callbacks.py): per-batch TB scalars, epoch averages,
best-checkpoint on the validation pose loss ('checkpoint_on',
FPC/lib/pose_regressor.py:153), every-N checkpoint
(`CheckpointEveryNSteps`, callbacks.py:570-613), per-epoch visualization of
a few validation samples (callbacks.py:262-523 — utils/visualize.py here).
"""

from __future__ import annotations

import dataclasses
import datetime
import pathlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastposecnn_tpu import metrics as M
from fastposecnn_tpu.config import HParams, pipeline_config_from
from fastposecnn_tpu.models import PoseRegressorNet
from fastposecnn_tpu.parallel import make_mesh, shard_batch, shard_state_tp
from fastposecnn_tpu.train import checkpoint as ckpt
from fastposecnn_tpu.train import optim
from fastposecnn_tpu.train.task import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from fastposecnn_tpu.utils.tb import RunLogger


def make_run_dir(hp: HParams, base: Optional[str] = None) -> pathlib.Path:
    """$LOGS/yy-mm-dd/HH-MM-EXPERIMENT-MODEL-DATASET-encoder-weights/
    (FPC/train.py:237-248)."""
    import os

    base = pathlib.Path(base or os.getenv("LOGS", "logs"))
    now = datetime.datetime.now()
    day = base / now.strftime("%y-%m-%d")
    run = day / (
        f"{now.strftime('%H-%M')}-{hp.EXPERIMENT_NAME}-{hp.MODEL}-"
        f"{hp.DATASET_NAME}-{hp.ENCODER}-{hp.ENCODER_WEIGHTS}"
    )
    run.mkdir(parents=True, exist_ok=True)
    return run


def _to_device_batch(batch, mesh):
    # Wire dtypes are preserved (dense masks travel uint8 — promoting here
    # would ship 4x the bytes); `task.upcast_batch` promotes in-graph.
    db = {
        "image": jnp.asarray(batch["image"]),
        "mask": jnp.asarray(batch["mask"]),
        "agg": {k: jnp.asarray(v) for k, v in batch["agg"].items()},
        "sample_valid": jnp.asarray(batch["sample_valid"]),
    }
    if mesh is not None:
        db = shard_batch(db, mesh)
    return db


def _pad_batch(batch, batch_size):
    """Pad a short final batch up to the static batch size, recording
    per-sample validity so padding contributes nothing anywhere: matched
    losses are masked by the (all-invalid) padded GT slots, and
    `sample_valid` weights the pixel-wise mask losses/metrics (see
    task._compute_losses)."""
    n = batch["image"].shape[0]
    if n == batch_size:
        batch = dict(batch)
        batch["sample_valid"] = np.ones((n,), np.float32)
        return batch, n

    def pad(x):
        width = [(0, batch_size - n)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), width)

    out = {
        "image": pad(batch["image"]),
        "mask": pad(batch["mask"]),
        "agg": {k: pad(v) for k, v in batch["agg"].items()},
        "sample_valid": np.concatenate(
            [np.ones((n,), np.float32),
             np.zeros((batch_size - n,), np.float32)]
        ),
    }
    return out, n


def log_epoch_visualizations(
    logger: RunLogger,
    out,
    batch,
    hp: HParams,
    epoch: int,
    run_dir: pathlib.Path,
    num_samples: int = 3,
):
    """Per-epoch qualitative figures into TB + PNGs.

    Parity: FPC/callbacks.py:262-523 (TensorboardCallback epoch-end
    visualization of a few validation samples: mask comparison, hough
    voting, pose boxes)."""
    from fastposecnn_tpu import constants
    from fastposecnn_tpu.utils import visualize as vz

    intr = constants.scaled_intrinsics(
        hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH)
    agg = out.get("aggregated")
    n = min(num_samples, batch["image"].shape[0])
    viz_dir = run_dir / "visualizations"
    viz_dir.mkdir(exist_ok=True)
    for i in range(n):
        img = vz.denormalize_image(np.asarray(batch["image"][i]))
        panels = {
            "rgb": img,
            "gt_mask": vz.colorize_mask(np.asarray(batch["mask"][i]),
                                        hp.num_classes),
            "pred_mask": vz.colorize_mask(
                np.asarray(out["categorical"]["mask"][i]), hp.num_classes
            ),
        }
        if agg is not None and "xy" in agg:
            panels["hough"] = vz.visualize_hypothesis(
                img, np.asarray(agg["xy"][i]), np.asarray(agg["valid"][i]),
                gt_centers=np.asarray(batch["agg"]["xy"][i]),
            )
        if agg is not None and "RT" in agg:
            panels["pose"] = vz.compare_pose_performance(
                img,
                np.asarray(batch["agg"]["RT"][i]),
                np.asarray(batch["agg"]["scales"][i]),
                np.asarray(agg["RT"][i]),
                np.asarray(agg["scales"][i]),
                np.asarray(batch["agg"]["valid"][i])
                & np.asarray(agg["valid"][i]),
                intr,
            )
        fig = vz.make_summary_figure(**panels)
        arr = vz.figure_to_array(fig)
        logger.log_image("valid", f"epoch_viz/sample_{i}", arr / 255.0, epoch)
        import matplotlib.pyplot as plt

        try:
            import PIL.Image as PILImage

            PILImage.fromarray(arr).save(viz_dir / f"epoch{epoch}_s{i}.png")
        except Exception:
            pass
        plt.close("all")


def fit(
    hp: HParams,
    train_loader,
    valid_loader,
    inv_intrinsics,
    run_dir: Optional[pathlib.Path] = None,
    mesh=None,
    enable_tb: bool = True,
    num_epochs: Optional[int] = None,
    resume_from: Optional[str] = None,
    visualize_every: int = 1,
):
    """Two-generic-stage trainer used by cli/train.py. Returns final state."""
    run_dir = run_dir or make_run_dir(hp)
    hp.save(run_dir / "HPARAM.json")  # FPC/train.py:277-278
    logger = RunLogger(run_dir, enabled=enable_tb)

    # Named file logger into the run dir (FPC/train.py:83-91 'fastposecnn'
    # logger -> run.log).
    import logging

    flog = logging.getLogger("fastposecnn_tpu")
    flog.setLevel(logging.INFO)
    fh = logging.FileHandler(run_dir / "run.log")
    fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    flog.addHandler(fh)
    # jax/absl install root handlers; propagation would emit every epoch
    # line a second time on stderr alongside the print() console copy,
    # doubling captured logs (round-4 ADVICE.md).
    flog.propagate = False
    flog.info("hparams: %s", hp.to_json().replace("\n", " "))

    if mesh is None and len(jax.devices()) > 1 and hp.NUM_DEVICES > 1:
        mesh = make_mesh(hp.NUM_DEVICES, tp=hp.NUM_TP)

    net = PoseRegressorNet(
        num_classes=hp.num_classes,
        encoder_name=hp.ENCODER,
        dtype=jnp.bfloat16
        if (hp.COMPUTE_DTYPE == "bfloat16" and jax.default_backend() == "tpu")
        else jnp.float32,
        z_bias_init=hp.HEAD_Z_BIAS_INIT,
        scales_bias_init=hp.HEAD_SCALES_BIAS_INIT,
    )
    pcfg = pipeline_config_from(hp)
    optimizer = optim.make_optimizer(hp)
    state = create_train_state(net, optimizer, jax.random.key(0), hp)
    if resume_from:
        state, hp = ckpt.load_any_checkpoint(
            resume_from, state, hp, optimizer=optimizer
        )
    if mesh is not None:
        state = shard_state_tp(state, mesh)  # == replicate when tp=1

    train_step = jax.jit(make_train_step(net, optimizer, hp, pcfg, inv_intrinsics))
    eval_step = jax.jit(make_eval_step(net, hp, pcfg, inv_intrinsics))

    plateau = optim.plateau_init()
    best_val = float("inf")
    rng = jax.random.key(42)
    ckpt_dir = run_dir / "checkpoints"

    for epoch in range(num_epochs or hp.NUM_EPOCHS):
        # ---- train ----
        import time as _time

        epoch_t0 = _time.perf_counter()
        n_images = 0
        host_step = int(jax.device_get(state.step))
        # Buffer device-side logs and fetch in batches: a per-step
        # device_get serializes every step on the host<->device round trip
        # (the dominant cost through a remote-attached chip; cf.
        # BASELINE.md stage-1 wall-clock note).
        pending = []
        recent_batches = {}  # host_step -> host batch (fault replay window)
        log_every = 16

        def _flush(buffered):
            for step_i, fetched in jax.device_get(buffered):
                logger.log_metrics("train", fetched, step_i)
                if fetched.get("grad/finite", 1.0) < 1.0:
                    # Fault reproduction: the reference sketched capturing
                    # the offending batch+weights for replay
                    # (FPC pose_regressor.py:374-399, commented out); here
                    # it works — the batch that produced non-finite grads
                    # is saved next to the run for offline replay.
                    fault = recent_batches.get(step_i)
                    if fault is not None:
                        path = run_dir / f"fault_batch_step{step_i}.npz"
                        flat = {
                            "image": fault["image"], "mask": fault["mask"],
                            **{f"agg_{k}": v for k, v in fault["agg"].items()},
                        }
                        np.savez_compressed(path, **flat)
                        flog.warning(
                            "non-finite gradients at step %d; batch saved "
                            "to %s", step_i, path,
                        )
            recent_batches.clear()

        for bi, batch in enumerate(train_loader):
            if batch is None:  # all samples rejected (dataset.py:456-460)
                continue
            batch, n_real = _pad_batch(batch, hp.BATCH_SIZE)
            db = _to_device_batch(batch, mesh)
            state, logs = train_step(state, db, rng)
            host_step += 1
            n_images += n_real
            pending.append((host_step, logs))
            recent_batches[host_step] = batch
            if len(pending) >= log_every:
                _flush(pending)
                pending = []
        _flush(pending)
        dt = _time.perf_counter() - epoch_t0
        logger.log_metrics(
            "train",
            {
                "throughput/images_per_s": n_images / max(dt, 1e-9),
                "optim/lr_scale": float(plateau.scale),
            },
            host_step,
            accumulate=False,
        )
        logger.log_epoch_average("train", epoch)

        # ---- validate ----
        bank = M.init_pose_metric_bank()
        val_logs_pending = []
        val_weights = []
        viz_done = False
        for bi, batch in enumerate(valid_loader):
            if batch is None:
                continue
            batch, n_real = _pad_batch(batch, hp.BATCH_SIZE)
            val_weights.append(n_real)
            db = _to_device_batch(batch, mesh)
            logs, bank, out = eval_step(state, db, jax.random.key(epoch), bank)
            val_logs_pending.append(logs)
            if (
                not viz_done
                and visualize_every
                and epoch % visualize_every == 0
            ):
                try:
                    log_epoch_visualizations(
                        logger, jax.device_get(out), batch, hp, epoch, run_dir
                    )
                except Exception as e:  # viz must never kill training
                    print(f"visualization failed: {e}")
                viz_done = True
        val_logs = jax.device_get(val_logs_pending)  # one fetch per epoch
        val_losses = [float(lg["pose/total_loss"]) for lg in val_logs]
        for lg in val_logs:
            logger.log_metrics("valid", lg, host_step)
        pose_vals = {
            f"pose/{k}": float(v)
            for k, v in M.compute_pose_metric_bank(bank).items()
        }
        logger.log_metrics("valid", pose_vals, host_step, accumulate=False)
        logger.log_epoch_average("valid", epoch)
        # Weighted by real-sample count so the short final batch counts
        # its samples once, not its batch once.
        val_loss = (
            float(np.average(val_losses, weights=val_weights))
            if val_losses
            else float("inf")
        )

        # ---- plateau LR (pose_regressor.py:417-438) ----
        plateau = optim.plateau_update(
            plateau, jnp.asarray(val_loss),
            patience=hp.PLATEAU_PATIENCE, factor=hp.PLATEAU_FACTOR,
            min_scale=hp.PLATEAU_MIN_SCALE,
        )
        state = state._replace(
            opt_state=optim.set_lr_scale(state.opt_state, plateau.scale)
        )

        # ---- checkpoints ----
        if val_loss < best_val:
            best_val = val_loss
            ckpt.save_checkpoint(ckpt_dir / "best", int(state.step), state, hp)
        if (epoch + 1) % hp.CKPT_SAVE_FREQUENCY == 0:
            ckpt.save_checkpoint(ckpt_dir / "periodic", int(state.step), state, hp)
        msg = (
            f"epoch {epoch}: val_loss={val_loss:.4f} "
            f"lr_scale={float(plateau.scale):.4f} "
            f"skipped={int(jax.device_get(state.skipped_updates))} "
            + " ".join(f"{k.split('/')[-1]}={v:.2f}" for k, v in pose_vals.items())
        )
        print(msg)
        flog.info(msg)

    ckpt.save_checkpoint(ckpt_dir / "last", int(state.step), state, hp)
    logger.log_hparams(dataclasses.asdict(hp), {"best_val_loss": best_val})
    logger.close()
    return state, run_dir

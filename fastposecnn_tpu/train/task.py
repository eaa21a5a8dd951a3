"""Training / validation steps for the pose regression task.

Parity: FPC/lib/pose_regressor.py:70-438 (`PoseRegressionTask`):
  - shared_step: forward -> match -> per-task weighted losses -> metrics
    (pose_regressor.py:173-263);
  - loss weights from FPC/train.py:159-188 (mask CE/CCE/Focal x5, quat x0.1,
    xy x0.01, z x0.1, scales x0.1), CE and CCE kept as two logged entries
    even though they are the same function of the logits;
  - NaN-loss dropping (pose_regressor.py:278-296) becomes has_data-weighted
    sums (never produces NaN in the first place);
  - the gradient inf/nan watchdog (pose_regressor.py:341-415) becomes a
    jit-safe skip: non-finite grads leave params untouched and bump
    `skipped_updates` (the reference zeroed grads and continued; its
    nan-after-inf sys.exit becomes a counter the host loop can act on).

Everything here is a pure jittable function over a TrainState pytree; the
host-side epoch loop lives in train/loop.py.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from fastposecnn_tpu import losses as L
from fastposecnn_tpu import metrics as M
from fastposecnn_tpu.config import HParams
from fastposecnn_tpu.ops.matching import gather_matched, match_instances
from fastposecnn_tpu.pipeline import PipelineConfig, run_pipeline

MATCH_KEYS = ("quaternion", "scales", "z", "xy", "T", "R", "RT")


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    skipped_updates: jnp.ndarray


def create_train_state(net, optimizer, rng, hp: HParams) -> TrainState:
    dummy = jnp.zeros((1, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH, 3), jnp.float32)
    variables = net.init(rng, dummy)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        skipped_updates=jnp.zeros((), jnp.int32),
    )


def _compute_losses(
    out: Dict[str, Any],
    batch: Dict[str, Any],
    hp: HParams,
    perform_matching: bool,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Optional[Dict[str, Any]]]:
    """Weighted multi-task loss. Returns (total, logs, matched_payload)."""
    logs = {}
    # Explicit f32: under jax_enable_x64 (golden tests) a default-dtype
    # zeros(()) is f64, which promotes the loss -> grads -> optimizer
    # moments and breaks the staged trainer's scan-carry dtype invariant.
    total = jnp.zeros((), jnp.float32)

    # Per-sample validity: 0 for zero-padded samples of a short final
    # batch. Matched losses are already protected by the GT instance
    # validity masks; the pixel-wise mask task needs this weight or the
    # padding biases it toward "everything is background on a black image".
    sw = batch.get("sample_valid")

    # Mask task (pixel-wise), FPC/train.py:161-166.
    ce = L.cross_entropy(out["logits"]["mask"], batch["mask"], sample_weight=sw)
    focal = L.focal_loss(out["logits"]["mask"], batch["mask"], sample_weight=sw)
    logs["mask/loss_ce"] = ce
    logs["mask/loss_cce"] = ce  # CCE == CE mathematically; logged separately
    logs["mask/loss_focal"] = focal
    mask_total = hp.MASK_WEIGHT * (ce + ce + focal)
    logs["mask/task_total_loss"] = mask_total
    total = total + mask_total

    # Dense per-pixel auxiliary supervision (beyond-reference, off by
    # default — see config.py DENSE_*_WEIGHT and losses.dense_supervision).
    dense_weights = {
        "quaternion": hp.DENSE_QUAT_WEIGHT,
        "xy": hp.DENSE_XY_WEIGHT,
        "z": hp.DENSE_Z_WEIGHT,
        "scales": hp.DENSE_SCALES_WEIGHT,
    }
    if any(dense_weights.values()) and "agg" in batch:
        dense_total, dense_logs = L.dense_supervision(
            out["logits"], batch["mask"], batch["agg"], dense_weights,
            sample_weight=sw,
            sym_quat_mode=getattr(hp, "DENSE_SYM_QUAT_MODE", "swing"),
        )
        logs.update(dense_logs)
        total = total + dense_total

    matched = None
    if perform_matching and out["aggregated"] is not None:
        match = match_instances(out["aggregated"], batch["agg"])
        matched = gather_matched(
            out["aggregated"], batch["agg"], match, keys=MATCH_KEYS
        )
        q, q_has = L.quaternion_loss(matched)
        xy, xy_has = L.xy_loss(matched, hp.XYLOSS_TYPE)
        z, z_has = L.z_loss(matched, hp.ZLOSS_TYPE)
        s, s_has = L.scales_loss(matched, hp.SCALESLOSS_TYPE)
        logs["quaternion/loss_quat"] = q
        logs["xy/loss_xy"] = xy
        logs["z/loss_z"] = z
        logs["scales/loss_scales"] = s
        total = (
            total
            + hp.QUAT_WEIGHT * q * q_has
            + hp.XY_WEIGHT * xy * xy_has
            + hp.Z_WEIGHT * z * z_has
            + hp.SCALES_WEIGHT * s * s_has
        )
        logs["pose/num_matched"] = jnp.sum(matched["valid"].astype(jnp.float32))

    logs["pose/total_loss"] = total
    return total, logs, matched


def upcast_image(image):
    """uint8 wire image -> ImageNet-normalized f32, in-graph; f32 images
    pass through (assumed pre-normalized by their producer)."""
    from fastposecnn_tpu.data.nocs import IMAGENET_MEAN, IMAGENET_STD

    if image.dtype == jnp.uint8:
        img = image.astype(jnp.float32) / 255.0
        return (img - IMAGENET_MEAN) / IMAGENET_STD
    return image


def upcast_batch(batch):
    """Promote compact wire dtypes to compute dtypes, in-graph.

    Dense GT masks and the color image travel host->device as uint8 (f32
    they were 78 MB + 29.5 MB per 480p/batch-8 step); the casts and the
    ImageNet normalization happen on device where they are free. Accepts
    already-promoted f32 batches unchanged (f32 images are assumed
    normalized by the producer), so hand-built test batches keep working.
    """
    batch = dict(batch)
    batch["image"] = upcast_image(batch["image"])
    if batch["mask"].dtype != jnp.int32:
        batch["mask"] = batch["mask"].astype(jnp.int32)
    if "agg" in batch and batch["agg"] is not None:
        agg = dict(batch["agg"])
        if agg["instance_masks"].dtype != jnp.float32:
            agg["instance_masks"] = agg["instance_masks"].astype(jnp.float32)
        batch["agg"] = agg
    return batch


def make_train_step(net, optimizer, hp: HParams, pcfg: PipelineConfig,
                    inv_intrinsics):
    """Builds the jittable train step closure."""
    inv_K = jnp.asarray(inv_intrinsics, jnp.float32)
    perform_matching = hp.PERFORM_MATCHING and pcfg.perform_aggregation
    if (hp.PERFORM_HOUGH_VOTING and not hp.FREEZE_TRANSLATION_TRAINING
            and hp.DENSE_XY_WEIGHT == 0.0):
        # Voting is gradient-opaque (PARITY.md deliberate deviation): the
        # matched XYLoss is still computed and logged but cannot reach the
        # xy vote field; without dense supervision the field never trains.
        print(
            "WARNING: DENSE_XY_WEIGHT=0 with hough voting on — voting is "
            "gradient-opaque, so the xy vote field receives NO gradient "
            "(matched xy loss is logged only). Set --DENSE_XY_WEIGHT 1.0 "
            "(the HEAD_TRAINING preset default) to train translation-xy.",
            flush=True,
        )

    def train_step(state: TrainState, batch, rng):
        batch = upcast_batch(batch)
        k_drop, k_pipe = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mutated = net.apply(
                variables,
                batch["image"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            out = run_pipeline(logits, k_pipe, pcfg, inv_K)
            total, logs, _ = _compute_losses(out, batch, hp, perform_matching)
            return total, (logs, mutated.get("batch_stats", state.batch_stats))

        (total, (logs, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # Gradient watchdog (jit-safe version of pose_regressor.py:341-415).
        finite = jnp.all(
            jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
            )
        )
        safe_grads = jax.tree.map(jnp.nan_to_num, grads)
        updates, new_opt = optimizer.update(
            safe_grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        params = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_params, state.params,
        )
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_opt, state.opt_state
        )
        logs["grad/finite"] = finite.astype(jnp.float32)
        logs["grad/global_norm"] = optax.global_norm(safe_grads)

        new_state = TrainState(
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
            step=state.step + 1,
            skipped_updates=state.skipped_updates + (1 - finite.astype(jnp.int32)),
        )
        return new_state, logs

    return train_step


def make_eval_step(net, hp: HParams, pcfg: PipelineConfig, inv_intrinsics):
    inv_K = jnp.asarray(inv_intrinsics, jnp.float32)
    perform_matching = hp.PERFORM_MATCHING and pcfg.perform_aggregation
    num_classes = hp.num_classes

    def eval_step(state: TrainState, batch, rng, metric_bank):
        batch = upcast_batch(batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = net.apply(variables, batch["image"], train=False)
        out = run_pipeline(logits, rng, pcfg, inv_K)
        total, logs, matched = _compute_losses(out, batch, hp, perform_matching)
        logs.update(
            {f"mask/{k}": v for k, v in M.mask_scores(
                out["categorical"]["mask"], batch["mask"], num_classes,
                sample_valid=batch.get("sample_valid"),
            ).items()}
        )
        if matched is not None:
            metric_bank = M.update_pose_metric_bank(metric_bank, matched)
        return logs, metric_bank, out

    return eval_step

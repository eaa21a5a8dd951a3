"""Optimizer stack: RAdam + Lookahead + global-norm clip + plateau LR.

Parity: FPC/lib/pose_regressor.py:417-438 (`configure_optimizers`): catalyst
RAdam wrapped in Lookahead, ReduceLROnPlateau(patience=2, factor=0.25) on the
validation pose loss; PL clips gradients to global-norm 0.15
(FPC/train.py:326).

optax ships radam; Lookahead is implemented here as a self-contained
GradientTransformation (optax's own lookahead needs a split param pytree,
which would leak into checkpoints) with the standard k=5, alpha=0.5 defaults
catalyst uses. The plateau scale rides the optimizer state as a multiplier
updated from validation results (`plateau_update`).

Freezing (FPC/lib/pose_regressor.py:694-707) is applied here by zeroing
gradients of frozen top-level modules — equivalent to requires_grad=False.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from fastposecnn_tpu.config import HParams


class LookaheadState(NamedTuple):
    slow: Any
    step: jnp.ndarray


def lookahead(sync_period: int = 5, slow_step_size: float = 0.5):
    """Lookahead as a terminal gradient transformation.

    Applied *after* the inner optimizer: receives parameter updates, tracks
    the would-be fast params, and every `sync_period` steps replaces the
    update so params land on the interpolated slow weights.
    """

    def init(params):
        return LookaheadState(slow=jax.tree.map(jnp.asarray, params),
                              step=jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params")
        step = state.step + 1
        sync = (step % sync_period) == 0

        fast = jax.tree.map(lambda p, u: p + u, params, updates)
        new_slow = jax.tree.map(
            lambda s, f: jnp.where(sync, s + slow_step_size * (f - s), s),
            state.slow,
            fast,
        )
        new_updates = jax.tree.map(
            lambda f, s, p: jnp.where(sync, s - p, f - p),
            fast,
            new_slow,
            params,
        )
        return new_updates, LookaheadState(slow=new_slow, step=step)

    return optax.GradientTransformation(init, update)


class PlateauState(NamedTuple):
    scale: jnp.ndarray
    best: jnp.ndarray
    bad_epochs: jnp.ndarray


def plateau_init() -> PlateauState:
    return PlateauState(
        scale=jnp.ones(()),
        best=jnp.asarray(jnp.inf),
        bad_epochs=jnp.zeros((), jnp.int32),
    )


def plateau_update(
    state: PlateauState,
    metric: jnp.ndarray,
    patience: int = 2,
    factor: float = 0.25,
    min_scale: float = 1e-4,
) -> PlateauState:
    """ReduceLROnPlateau semantics on a scalar validation metric."""
    improved = metric < state.best
    bad = jnp.where(improved, 0, state.bad_epochs + 1)
    trigger = bad > patience
    scale = jnp.where(
        trigger, jnp.maximum(state.scale * factor, min_scale), state.scale
    )
    return PlateauState(
        scale=scale,
        best=jnp.minimum(state.best, metric),
        bad_epochs=jnp.where(trigger, 0, bad),
    )


def _frozen_module_names(hp: HParams) -> set:
    frozen = set()
    if hp.FREEZE_ENCODER:
        frozen.add("encoder")
    if hp.FREEZE_MASK_TRAINING:
        frozen.update({"mask_decoder", "mask_head"})
    if hp.FREEZE_ROTATION_TRAINING:
        frozen.update({"rotation_decoder", "rotation_head"})
    if hp.FREEZE_TRANSLATION_TRAINING:
        frozen.update({"translation_decoder", "translation_head"})
    if hp.FREEZE_SCALES_TRAINING:
        frozen.update({"scales_decoder", "scales_head"})
    return frozen


def freeze_mask_fn(hp: HParams):
    """Returns f(params) -> pytree of per-leaf update multipliers.

    0.0 for frozen modules; ENCODER_LEARNING_RATE/LEARNING_RATE for the
    encoder (the reference declares the field, FPC/config.py:58, but its
    optimizer never applies it — here it works); 1.0 otherwise.

    Freezing gates PARAM updates only: a frozen encoder's BatchNorm
    running stats still update while training (train_step threads the
    mutated batch_stats unconditionally) — the same semantics as torch
    requires_grad=False with the module left in train mode, which is how
    the reference's stage gating behaves (FPC/lib/pose_regressor.py).
    """
    frozen = _frozen_module_names(hp)
    enc_ratio = (
        hp.ENCODER_LEARNING_RATE / hp.LEARNING_RATE
        if hp.LEARNING_RATE > 0
        else 1.0
    )

    def build(params):
        def per_module(path, leaf):
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            if top in frozen:
                return jnp.zeros(())
            if top == "encoder":
                return jnp.asarray(enc_ratio, jnp.float32)
            return jnp.ones(())

        return jax.tree_util.tree_map_with_path(per_module, params)

    return build


def _module_multiplier_transform(builder):
    def init(params):
        return builder(params)

    def update(updates, state, params=None):
        return jax.tree.map(lambda u, m: u * m, updates, state), state

    return optax.GradientTransformation(init, update)


def make_optimizer(hp: HParams) -> optax.GradientTransformation:
    """The full chain. Ordering matters:
    - freezing (x0) runs BEFORE the global-norm clip so frozen modules'
      gradients don't inflate the clip norm (PL clips trainable grads only);
    - the per-module LR ratio runs AFTER radam's moment normalization
      (applied before, Adam-style normalization would cancel it);
    - the plateau scale is injected via `inject_hyperparams` so
      `opt_state.hyperparams['lr_scale']` can be updated between epochs.
    """
    freeze_builder = freeze_mask_fn(
        dataclasses_replace_lr(hp, 1.0)
    )  # 0/1 only (ratio handled below)
    ratio_builder = freeze_mask_fn(hp)

    @optax.inject_hyperparams
    def chain(lr_scale):
        return optax.chain(
            optax.clip_by_global_norm(hp.GRADIENT_CLIP_VAL),
            optax.scale_by_radam(),
            optax.add_decayed_weights(hp.WEIGHT_DECAY),
            _module_multiplier_transform(ratio_builder),
            optax.scale(-hp.LEARNING_RATE),
            optax.scale(lr_scale),
            lookahead(sync_period=5, slow_step_size=0.5),
        )

    base = chain(lr_scale=1.0)
    return optax.chain(
        _module_multiplier_transform(freeze_builder), base
    )


def dataclasses_replace_lr(hp: HParams, ratio_to: float) -> HParams:
    """HParams copy whose encoder ratio is 1 (freeze mask only)."""
    import dataclasses

    return dataclasses.replace(
        hp, ENCODER_LEARNING_RATE=hp.LEARNING_RATE * ratio_to
    )


def set_lr_scale(opt_state, scale):
    """Write the plateau scale into the injected hyperparams."""
    # opt_state = (freeze_state, InjectHyperparamsState)
    inner = opt_state[1]
    inner.hyperparams["lr_scale"] = jnp.asarray(scale, jnp.float32)
    return opt_state

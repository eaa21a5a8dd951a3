"""Orbax checkpointing with config-travels-with-weights semantics.

Parity: FPC/lib/pose_regressor.py:506-539 (`Model.load_from_ckpt`): the
checkpoint stores the hyperparameters next to the weights; on load, the
architecture-defining fields override the caller's preset
(config.merge_from_checkpoint) so a checkpoint always reconstructs its own
network. Also covers CheckpointEveryNSteps (FPC/callbacks.py:570-613) via
`save_every` bookkeeping in the train loop, and PL's top-1 'checkpoint_on'
ModelCheckpoint (FPC/train.py:298-304) via `save_best`.
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from fastposecnn_tpu.config import HParams, merge_from_checkpoint


def _manager(directory, max_to_keep=5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        pathlib.Path(directory).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_checkpoint(directory, step: int, state, hp: HParams) -> None:
    mgr = _manager(directory)
    mgr.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(jax.tree.map(np.asarray, state)),
            hparams=ocp.args.JsonSave(hp.to_json()),
        ),
    )
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory) -> Optional[int]:
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def load_checkpoint(
    directory, abstract_state: Any, hp: HParams, step: Optional[int] = None
) -> Tuple[Any, HParams]:
    """Restore (state, merged_hparams). `abstract_state` provides the pytree
    structure/shapes (e.g. a freshly-initialized TrainState)."""
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract_state),
            hparams=ocp.args.JsonRestore(),
        ),
    )
    mgr.close()
    ckpt_hp = HParams.from_json(restored["hparams"])
    return restored["state"], merge_from_checkpoint(hp, ckpt_hp)

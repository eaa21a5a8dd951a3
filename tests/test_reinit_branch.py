"""scripts/reinit_branch.py: surgical branch re-init of a checkpoint.

The tool is on the rotation-recovery critical path (round 3): a branch
trained against contradictory targets sits in a drifted basin with large
Adam second moments, and `--resume` from a grafted checkpoint must give
that branch a genuinely fresh start while every other parameter (and its
optimizer state) continues exactly where it was.
"""
import dataclasses
import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from fastposecnn_tpu import config as C
from fastposecnn_tpu.models import PoseRegressorNet
from fastposecnn_tpu.train import checkpoint as ckpt
from fastposecnn_tpu.train import optim
from fastposecnn_tpu.train.task import create_train_state

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_reinit_branch_grafts_fresh_rotation_branch(tmp_path):
    # head_training: the real use case (stage-2 checkpoints), and the only
    # preset whose optimizer actually accumulates rotation-branch moments
    # (mask_training freezes the pose branches, leaving their mu/nu zero).
    hp = dataclasses.replace(
        C.head_training(),
        IMAGE_HEIGHT=32,
        IMAGE_WIDTH=32,
        SELECTED_CLASSES=("bg", "bottle", "bowl"),
        MAX_INSTANCES=4,
        MAX_VOTE_POINTS=128,
        HV_NUM_OF_HYPOTHESES=32,
    )
    net = PoseRegressorNet(num_classes=hp.num_classes)
    state = create_train_state(
        net, optim.make_optimizer(hp), jax.random.key(0), hp
    )
    # Perturb params + make the Adam moments nonzero so "fresh" is
    # distinguishable from "loaded" everywhere, including opt_state.
    opt = optim.make_optimizer(hp)
    grads = jax.tree.map(np.ones_like, state.params)
    import optax

    updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
    state = state._replace(
        params=optax.apply_updates(state.params, updates),
        opt_state=new_opt_state,
        step=state.step + 1,
    )

    run = tmp_path / "run"
    run.mkdir()
    hp.save(run / "HPARAM.json")
    ckpt.save_checkpoint(run / "checkpoints" / "periodic", 1, state, hp)

    out = tmp_path / "grafted"
    env = dict(
        os.environ,
        DIAG_RUN=str(run),
        BRANCH="rotation",
        OUT=str(out),
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
    )
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "reinit_branch.py")],
        env=env, check=True, cwd=REPO, timeout=600,
    )

    restored, _ = ckpt.load_checkpoint(
        out, create_train_state(
            net, optim.make_optimizer(hp), jax.random.key(3), hp
        ), hp,
    )

    # Rotation branch: params differ from the trained state.
    a = np.asarray(state.params["rotation_head"]["conv"]["kernel"])
    b = np.asarray(restored.params["rotation_head"]["conv"]["kernel"])
    assert not np.allclose(a, b)

    # Everything else: bit-identical, params AND Adam moments.
    def flat(tree):
        return {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(tree)
        }

    kept_params = 0
    for key, old in flat(state.params).items():
        if "rotation_decoder" in key or "rotation_head" in key:
            continue
        # f32: conftest enables x64, so in-test optimizer math runs f64
        # while the tool round-trips the checkpoint's f32 leaves.
        np.testing.assert_array_equal(
            np.asarray(old, np.float32),
            np.asarray(flat(restored.params)[key], np.float32),
            err_msg=key,
        )
        kept_params += 1
    assert kept_params > 0

    new_opt = flat(restored.opt_state)
    zeroed = nonzero_kept = 0
    for key, old in flat(state.opt_state).items():
        new = new_opt[key]
        if "rotation_decoder" in key or "rotation_head" in key:
            # Target branch: trained Adam moments reset to zero (lookahead
            # slow params get the fresh init instead — deterministic inits
            # like gn scale=1 can legitimately equal the loaded value, so
            # only the moments are asserted).
            is_moment = ".mu[" in key or ".nu[" in key
            if is_moment and np.any(np.asarray(old) != 0):
                np.testing.assert_array_equal(
                    np.asarray(new), 0.0, err_msg=key
                )
                zeroed += 1
        elif np.asarray(old).ndim and np.any(np.asarray(old) != 0):
            np.testing.assert_array_equal(
                np.asarray(old, np.float32), np.asarray(new, np.float32),
                err_msg=key,
            )
            nonzero_kept += 1
    assert zeroed > 0 and nonzero_kept > 0

"""Data-parallel phase-A evaluation must produce the same raw errors as the
single-device path (the reference's evaluator was single-GPU with a
"! Make it work with multiple GPUs" TODO, FPC/evaluate.py:90 — this is the
capability upgrade, so it must be numerics-neutral)."""

import dataclasses

import jax
import numpy as np
import pytest

from fastposecnn_tpu import config as C
from fastposecnn_tpu import constants


@pytest.mark.slow
def test_sharded_phase_a_matches_single_device():
    from fastposecnn_tpu.cli.evaluate import collect_raw_errors
    from fastposecnn_tpu.data.synthetic import SceneConfig, make_batch
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.parallel import make_mesh
    from fastposecnn_tpu.train import optim
    from fastposecnn_tpu.train.task import create_train_state

    hp = C.evaluating()
    hp = dataclasses.replace(
        hp, IMAGE_HEIGHT=64, IMAGE_WIDTH=64, BATCH_SIZE=2, MAX_INSTANCES=4,
        MAX_VOTE_POINTS=128, HV_NUM_OF_HYPOTHESES=32,
        SELECTED_CLASSES=("bg", "bottle", "bowl", "camera"),
    )
    scfg = SceneConfig(height=64, width=64, num_classes=hp.num_classes,
                       max_instances=4)
    rng = np.random.default_rng(0)
    batches = [make_batch(rng, scfg, hp.BATCH_SIZE) for _ in range(2)]

    net = PoseRegressorNet(num_classes=hp.num_classes)
    state = create_train_state(
        net, optim.make_optimizer(hp), jax.random.key(0), hp
    )
    pcfg = C.pipeline_config_from(hp, use_pallas=False)
    inv_K = np.linalg.inv(constants.INTRINSICS[hp.DATASET_NAME])

    single = collect_raw_errors(hp, list(batches), state, net, pcfg, inv_K)
    mesh = make_mesh(2)
    sharded = collect_raw_errors(hp, list(batches), state, net, pcfg, inv_K,
                                 mesh=mesh)
    for metric in single:
        for c in single[metric]:
            np.testing.assert_allclose(
                sharded[metric][c], single[metric][c], rtol=1e-4, atol=1e-4,
            )

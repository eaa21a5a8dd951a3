"""Plateau-LR behavior under realistic staged-mode val-loss noise.

Round-3 ran its flagship rotation demo with PLATEAU_PATIENCE=100000 —
i.e. the reference's ReduceLROnPlateau (FPC/lib/pose_regressor.py:417-438,
hard-coded patience=2 factor=0.25) effectively disabled — because cheap
staged epochs make a noisy val loss collapse lr_scale before learning
finishes (round-3 VERDICT weak #7). These tests replay the COMMITTED
round-3 demo training curves (evidence/rot_demo/DEMO_S{1,2}.csv) through
the real `optim.plateau_update` to pin the staged-mode defaults
(config.STAGED_PLATEAU_PATIENCE/FACTOR): they must survive the recorded
noise through learning onset without the escape hatch, while the
reference defaults demonstrably collapse on the same traces.
"""

import csv
import pathlib

import jax.numpy as jnp
import pytest

from fastposecnn_tpu import config as C
from fastposecnn_tpu.train import optim

EVIDENCE = pathlib.Path(__file__).resolve().parents[1] / "evidence/rot_demo"


def _val_loss_trace(name):
    path = EVIDENCE / f"{name}.csv"
    if not path.exists():
        pytest.skip(f"recorded trace {path} not committed")
    with open(path) as f:
        return [float(r["val_loss"]) for r in csv.DictReader(f)]


def _replay(trace, patience, factor, min_scale=1e-4):
    state = optim.plateau_init()
    scales = []
    for v in trace:
        state = optim.plateau_update(
            state, jnp.asarray(v), patience=patience, factor=factor,
            min_scale=min_scale,
        )
        scales.append(float(state.scale))
    return scales


@pytest.mark.parametrize("name", ["DEMO_S1", "DEMO_S2"])
def test_staged_defaults_survive_recorded_noise(name):
    """lr_scale must stay at 1.0 through the full recorded run: both
    traces were still improving at their final epoch (DEMO_S2's geodesic
    error was falling ~5 deg/100 epochs at epoch 400), so any decay on
    these traces is noise-triggered, not a true plateau."""
    trace = _val_loss_trace(name)
    scales = _replay(
        trace, C.STAGED_PLATEAU_PATIENCE, C.STAGED_PLATEAU_FACTOR
    )
    assert scales[-1] == pytest.approx(1.0), (
        f"staged defaults decayed lr on the recorded {name} trace"
    )


def test_reference_defaults_collapse_on_staged_trace():
    """Documents WHY the staged defaults exist: the reference's
    patience=2/factor=0.25 hits the 1e-4 floor by epoch ~74 of the
    recorded stage-2 trace, while rotation was still at ~75 deg and
    learning."""
    trace = _val_loss_trace("DEMO_S2")
    hp = C.HParams()
    scales = _replay(trace, hp.PLATEAU_PATIENCE, hp.PLATEAU_FACTOR)
    floor_epoch = next(
        i for i, s in enumerate(scales) if s <= hp.PLATEAU_MIN_SCALE + 1e-12
    )
    assert floor_epoch < 100


def test_staged_defaults_eventually_decay_on_true_plateau():
    """The staged defaults are a scheduler, not a disable: a genuinely
    flat val loss (longer than patience) must still decay."""
    trace = [1.0] + [1.0] * (C.STAGED_PLATEAU_PATIENCE + 2)
    scales = _replay(
        trace, C.STAGED_PLATEAU_PATIENCE, C.STAGED_PLATEAU_FACTOR
    )
    assert scales[-1] == pytest.approx(C.STAGED_PLATEAU_FACTOR)


def test_cli_default_swap_respects_explicit_flags():
    hp = C.HParams()
    swapped = C.staged_plateau_defaults(
        hp, patience_explicit=False, factor_explicit=False
    )
    assert swapped.PLATEAU_PATIENCE == C.STAGED_PLATEAU_PATIENCE
    assert swapped.PLATEAU_FACTOR == C.STAGED_PLATEAU_FACTOR

    explicit = C.staged_plateau_defaults(
        hp, patience_explicit=True, factor_explicit=True
    )
    assert explicit.PLATEAU_PATIENCE == hp.PLATEAU_PATIENCE
    assert explicit.PLATEAU_FACTOR == hp.PLATEAU_FACTOR

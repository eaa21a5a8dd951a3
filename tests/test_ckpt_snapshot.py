"""Durable npz weight snapshots (train/checkpoint.py): round-trip,
hparams travel, and load_any_checkpoint dispatch.

Why this exists: orbax checkpoints live under gitignored logs/ and host
VM restarts have destroyed trained weights twice (the round-3 demo and
the round-4 stage-5 chunk-2 run). Snapshots are single compressed .npz
files committed to git per training chunk (scripts/rotation_full.sh).
"""

import dataclasses

import jax
import numpy as np

from fastposecnn_tpu import config as C
from fastposecnn_tpu.models import PoseRegressorNet
from fastposecnn_tpu.train import checkpoint as ckpt
from fastposecnn_tpu.train import optim
from fastposecnn_tpu.train.task import create_train_state

from tests.test_train import tiny_setup


def _tiny_state():
    hp, net, _, _, _ = tiny_setup()
    opt = optim.make_optimizer(hp)
    return hp, net, opt, create_train_state(net, opt, jax.random.key(3), hp)


class TestNpzSnapshot:
    def test_round_trip_params_and_batch_stats(self, tmp_path):
        hp, net, opt, state = _tiny_state()
        path = tmp_path / "snap.npz"
        ckpt.save_npz_snapshot(path, state, hp)

        fresh = create_train_state(net, opt, jax.random.key(9), hp)
        restored, hp2 = ckpt.load_npz_snapshot(path, fresh, hp)

        # f16 storage: restored within half-precision rounding of saved.
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)
        for a, b in zip(jax.tree.leaves(state.batch_stats),
                        jax.tree.leaves(restored.batch_stats)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)
        # restored leaves keep the model's dtype, not f16
        assert all(np.asarray(x).dtype == np.float32
                   for x in jax.tree.leaves(restored.params))

    def test_arch_hparams_travel_and_dispatch(self, tmp_path):
        hp, net, opt, state = _tiny_state()
        path = tmp_path / "snap.npz"
        ckpt.save_npz_snapshot(path, state, hp)

        # merge_arch_from_any reads arch fields out of the npz
        other = dataclasses.replace(C.evaluating(), ENCODER="resnet34")
        merged = ckpt.merge_arch_from_any(path, other)
        assert merged.ENCODER == hp.ENCODER
        assert merged.SELECTED_CLASSES == hp.SELECTED_CLASSES

        # load_any_checkpoint dispatches .npz to the snapshot loader
        fresh = create_train_state(net, opt, jax.random.key(9), hp)
        restored, _ = ckpt.load_any_checkpoint(path, fresh, hp)
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)

    def test_arch_mismatch_raises(self, tmp_path):
        hp, net, opt, state = _tiny_state()
        path = tmp_path / "snap.npz"
        ckpt.save_npz_snapshot(path, state, hp)

        hp4 = dataclasses.replace(
            hp, SELECTED_CLASSES=("bg", "bottle", "bowl", "camera"))
        net4 = PoseRegressorNet(num_classes=hp4.num_classes)
        opt4 = optim.make_optimizer(hp4)
        fresh = create_train_state(net4, opt4, jax.random.key(0), hp4)
        try:
            ckpt.load_npz_snapshot(path, fresh, hp4)
        except (KeyError, ValueError):
            pass
        else:
            raise AssertionError("architecture mismatch must not load")


class TestOptimizerRefreshOnWeightsOnlyResume:
    """Round-5 FULL_c6 incident: load_any_checkpoint(npz) into a state
    whose optimizer was initialized from RANDOM template params left the
    Lookahead slow weights pointing at garbage; every 5th train step then
    synced the trained params 50% toward random init (epoch-0 val
    geodesic 71 deg from a 22.6-deg checkpoint, twice — the replay was
    bit-identical, proving it deterministic). With `optimizer` passed,
    the optimizer state must be re-derived from the LOADED params."""

    @staticmethod
    def _lookahead_slows(opt_state):
        from fastposecnn_tpu.train.optim import LookaheadState

        return [
            s for s in jax.tree_util.tree_flatten(
                opt_state, is_leaf=lambda x: isinstance(x, LookaheadState)
            )[0]
            if isinstance(s, LookaheadState)
        ]

    def test_lookahead_slow_weights_match_loaded_params(self, tmp_path):
        hp, net, opt, state = _tiny_state()
        path = tmp_path / "snap.npz"
        # make the saved params distinguishable from any fresh init
        state = state._replace(
            params=jax.tree.map(lambda p: p + 1.0, state.params)
        )
        ckpt.save_npz_snapshot(path, state, hp)

        fresh = create_train_state(net, opt, jax.random.key(9), hp)
        restored, _ = ckpt.load_any_checkpoint(
            path, fresh, hp, optimizer=opt
        )
        slows = self._lookahead_slows(restored.opt_state)
        assert slows, "optimizer chain lost its Lookahead state"
        for la in slows:
            for slow, p in zip(
                jax.tree.leaves(la.slow), jax.tree.leaves(restored.params)
            ):
                np.testing.assert_array_equal(
                    np.asarray(slow), np.asarray(p)
                )

    def test_without_optimizer_slow_weights_stay_stale(self, tmp_path):
        # documents WHY the optimizer arg matters (the incident shape)
        hp, net, opt, state = _tiny_state()
        path = tmp_path / "snap.npz"
        state = state._replace(
            params=jax.tree.map(lambda p: p + 1.0, state.params)
        )
        ckpt.save_npz_snapshot(path, state, hp)
        fresh = create_train_state(net, opt, jax.random.key(9), hp)
        restored, _ = ckpt.load_any_checkpoint(path, fresh, hp)
        la = self._lookahead_slows(restored.opt_state)[0]
        mismatch = any(
            not np.allclose(np.asarray(s), np.asarray(p), atol=1e-3)
            for s, p in zip(
                jax.tree.leaves(la.slow), jax.tree.leaves(restored.params)
            )
        )
        assert mismatch

"""Training-step tests: loss decreases, freezing works, DP sharding runs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastposecnn_tpu import config as C
from fastposecnn_tpu.data.synthetic import SceneConfig, make_batch
from fastposecnn_tpu.models import PoseRegressorNet
from fastposecnn_tpu.parallel import make_mesh, replicate, shard_batch
from fastposecnn_tpu.train import optim
from fastposecnn_tpu.train.task import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
import fastposecnn_tpu.metrics as M


def tiny_setup(hp=None, h=32, w=32, num_classes=3):
    hp = hp or C.mask_training()
    hp = dataclasses.replace(
        hp,
        IMAGE_HEIGHT=h,
        IMAGE_WIDTH=w,
        SELECTED_CLASSES=("bg", "bottle", "bowl")[:num_classes],
        MAX_INSTANCES=4,
        MAX_VOTE_POINTS=128,
        HV_NUM_OF_HYPOTHESES=32,
    )
    net = PoseRegressorNet(num_classes=hp.num_classes)
    pcfg = C.pipeline_config_from(hp, use_pallas=False)
    scfg = SceneConfig(
        height=h, width=w, num_classes=hp.num_classes, max_instances=4,
        max_scene_instances=2, box_half_extent=(4, 9),
    )
    intr = np.eye(3) + 0.0
    intr[0, 0] = intr[1, 1] = 60.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    return hp, net, pcfg, scfg, np.linalg.inv(intr)


class TestTrainStep:
    # The two full train-step tests below are compile-dominated (~3-5 min
    # each on this 1-CPU box); the default fast loop is
    # `pytest -m "not slow"`, which keeps TestDataParallel's sharded
    # train-step compile as the smoke for this path.
    @pytest.mark.slow
    def test_mask_training_loss_decreases_and_freezing(self, rng):
        # One compiled step covers both the loss-decrease and freezing
        # assertions (each extra train-step compile costs ~1 min on CPU).
        hp, net, pcfg, scfg, inv_K = tiny_setup()
        hp = dataclasses.replace(hp, LEARNING_RATE=3e-3)
        opt = optim.make_optimizer(hp)
        state = create_train_state(net, opt, jax.random.key(0), hp)
        step = jax.jit(make_train_step(net, opt, hp, pcfg, inv_K))
        batch = make_batch(rng, scfg, 2)
        p0 = jax.tree.map(np.asarray, state.params)
        losses = []
        for i in range(8):
            state, logs = step(state, batch, jax.random.key(1))
            losses.append(float(logs["pose/total_loss"]))
        assert losses[-1] < losses[0]
        assert int(state.skipped_updates) == 0
        assert int(state.step) == 8
        # rotation head frozen under MASK_TRAINING; mask head must move
        rot0 = jax.tree.leaves(p0["rotation_head"])
        rot1 = jax.tree.leaves(
            jax.tree.map(np.asarray, state.params["rotation_head"])
        )
        for a, b in zip(rot0, rot1):
            np.testing.assert_array_equal(a, b)
        mask0 = np.concatenate([x.ravel() for x in jax.tree.leaves(p0["mask_head"])])
        mask1 = np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree.leaves(state.params["mask_head"])]
        )
        assert np.abs(mask0 - mask1).max() > 0

    @pytest.mark.slow
    def test_head_training_train_and_eval_steps(self, rng):
        hp, net, pcfg, scfg, inv_K = tiny_setup(hp=C.head_training())
        opt = optim.make_optimizer(hp)
        state = create_train_state(net, opt, jax.random.key(0), hp)
        step = jax.jit(make_train_step(net, opt, hp, pcfg, inv_K))
        batch = make_batch(rng, scfg, 2)
        state, logs = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(logs["pose/total_loss"]))
        assert "quaternion/loss_quat" in logs
        # Full stage-2 gradients must be finite (regression: safe_normalize
        # NaN'd quaternion/xy grads at zero vectors, skipping every update).
        assert float(logs["grad/finite"]) == 1.0
        assert int(state.skipped_updates) == 0

        estep = jax.jit(make_eval_step(net, hp, pcfg, inv_K))
        bank = M.init_pose_metric_bank()
        logs, bank, out = estep(state, batch, jax.random.key(3), bank)
        vals = M.compute_pose_metric_bank(bank)
        for v in vals.values():
            assert np.isfinite(float(v))
        assert 0.0 <= float(logs["mask/iou"]) <= 1.0


class TestDataParallel:
    def test_sharded_train_step_8_devices(self, rng):
        hp, net, pcfg, scfg, inv_K = tiny_setup()
        mesh = make_mesh(8)
        opt = optim.make_optimizer(hp)
        state = create_train_state(net, opt, jax.random.key(0), hp)
        state = replicate(state, mesh)
        step = jax.jit(make_train_step(net, opt, hp, pcfg, inv_K))
        batch = make_batch(rng, scfg, 8)
        batch = shard_batch(batch, mesh)
        state, logs = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(logs["pose/total_loss"]))
        # Params remain replicated after the step
        leaf = jax.tree.leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    @pytest.mark.slow
    def test_tp_sharded_matches_replicated(self, rng):
        """Tensor-parallel weight sharding is numerics-neutral: one step on
        a dp=2 x tp=2 mesh with conv channels sharded over 'tp' produces the
        same loss as the replicated run (same program, partitioned)."""
        from fastposecnn_tpu.parallel import shard_state_tp

        hp, net, pcfg, scfg, inv_K = tiny_setup()
        opt = optim.make_optimizer(hp)
        base = create_train_state(net, opt, jax.random.key(0), hp)
        step = jax.jit(make_train_step(net, opt, hp, pcfg, inv_K))
        batch_host = make_batch(rng, scfg, 4)

        mesh_r = make_mesh(4, tp=1)
        s1, l1 = step(replicate(base, mesh_r), shard_batch(batch_host, mesh_r),
                      jax.random.key(1))
        mesh_tp = make_mesh(4, tp=2)
        state_tp = shard_state_tp(base, mesh_tp, min_channels=16)
        sharded = [
            x for x in jax.tree.leaves(state_tp.params)
            if "tp" in str(x.sharding.spec)
        ]
        assert sharded, "rule sharded no conv kernels"
        s2, l2 = step(state_tp, shard_batch(batch_host, mesh_tp),
                      jax.random.key(1))
        np.testing.assert_allclose(
            float(l2["pose/total_loss"]), float(l1["pose/total_loss"]),
            rtol=1e-4,
        )
        # updated params keep (at least) their tp sharding — GSPMD may
        # propagate 'tp' onto additional unconstrained outputs, never fewer
        still = [
            x for x in jax.tree.leaves(s2.params)
            if "tp" in str(x.sharding.spec)
        ]
        assert len(still) >= len(sharded)


class TestPaddedBatch:
    def test_padded_batch_matches_unpadded(self, rng):
        """A short batch padded to the static batch size must produce the
        SAME losses and mask metrics as the unpadded batch (regression:
        zero-image/background-mask padding used to leak into the pixel-wise
        CE/focal losses and dice/iou/accuracy)."""
        from fastposecnn_tpu.train.loop import _pad_batch

        hp, net, pcfg, scfg, inv_K = tiny_setup(hp=C.head_training())
        opt = optim.make_optimizer(hp)
        state = create_train_state(net, opt, jax.random.key(0), hp)
        estep = jax.jit(make_eval_step(net, hp, pcfg, inv_K))

        batch2 = make_batch(rng, scfg, 2)
        ref, _ = _pad_batch(batch2, 2)  # adds sample_valid=ones
        padded, n_real = _pad_batch(batch2, 4)
        assert n_real == 2
        assert padded["image"].shape[0] == 4
        np.testing.assert_array_equal(
            padded["sample_valid"], [1.0, 1.0, 0.0, 0.0]
        )

        logs_ref, _, _ = estep(
            state, ref, jax.random.key(7), M.init_pose_metric_bank()
        )
        logs_pad, _, _ = estep(
            state, padded, jax.random.key(7), M.init_pose_metric_bank()
        )
        for key in (
            "mask/loss_ce", "mask/loss_focal", "pose/total_loss",
            "mask/dice", "mask/iou", "mask/accuracy",
        ):
            np.testing.assert_allclose(
                float(logs_pad[key]), float(logs_ref[key]), rtol=1e-5,
                err_msg=key,
            )


class TestLegacyCheckpoint:
    def test_pre_cinpad_checkpoint_loads_and_pads(self, rng, tmp_path):
        """Checkpoints written before the C_in=4 stem pad hold [7,7,3,64]
        stem kernels (+ matching optimizer moments); loading must zero-pad
        the alpha slice transparently."""
        import jax

        from fastposecnn_tpu.train import checkpoint as ckpt

        hp, net, pcfg, scfg, inv_K = tiny_setup()
        opt = optim.make_optimizer(hp)
        state = create_train_state(net, opt, jax.random.key(0), hp)

        def strip(path, leaf):
            names = [str(getattr(p, "key", "")) for p in path]
            if "conv1" in names and getattr(leaf, "ndim", 0) == 4 \
                    and leaf.shape[:2] == (7, 7) and leaf.shape[2] == 4:
                return np.asarray(leaf)[:, :, :3, :]
            return leaf

        legacy = jax.tree_util.tree_map_with_path(strip, state)
        ckpt.save_checkpoint(tmp_path / "ck", 0, legacy, hp)
        restored, _ = ckpt.load_checkpoint(tmp_path / "ck", state, hp)
        k = restored.params["encoder"]["conv1"]["kernel"]
        assert k.shape[2] == 4
        np.testing.assert_array_equal(
            np.asarray(k[:, :, 3, :]), 0.0
        )
        np.testing.assert_array_equal(
            np.asarray(k[:, :, :3, :]),
            np.asarray(state.params["encoder"]["conv1"]["kernel"][:, :, :3]),
        )


class TestOptim:
    def test_plateau(self):
        st = optim.plateau_init()
        st = optim.plateau_update(st, jnp.asarray(1.0))
        for _ in range(4):  # no improvement -> trigger after patience=2
            st = optim.plateau_update(st, jnp.asarray(2.0))
        assert float(st.scale) == pytest.approx(0.25)

    def test_lookahead_sync(self):
        la = optim.lookahead(sync_period=2, slow_step_size=0.5)
        params = {"w": jnp.ones(3)}
        st = la.init(params)
        upd = {"w": jnp.full(3, 0.1)}
        u1, st = la.update(upd, st, params)
        p1 = jax.tree.map(lambda p, u: p + u, params, u1)
        np.testing.assert_allclose(np.asarray(p1["w"]), 1.1, rtol=1e-6)
        u2, st = la.update(upd, st, p1)
        p2 = jax.tree.map(lambda p, u: p + u, p1, u2)
        # after sync: slow = 1.0 + 0.5*(1.2-1.0) = 1.1
        np.testing.assert_allclose(np.asarray(p2["w"]), 1.1, rtol=1e-6)


class TestEncoderLR:
    def test_encoder_updates_scaled(self, rng):
        """Encoder updates must be ~ENCODER_LR/LR of an equivalent run."""
        import jax.numpy as jnp
        from fastposecnn_tpu.train import optim as O

        hp_full = tiny_setup()[0]
        hp_half = dataclasses.replace(
            hp_full, ENCODER_LEARNING_RATE=hp_full.LEARNING_RATE * 0.5
        )
        hp_eq = dataclasses.replace(
            hp_full, ENCODER_LEARNING_RATE=hp_full.LEARNING_RATE
        )
        params = {
            "encoder": {"w": jnp.ones((4,))},
            "mask_head": {"w": jnp.ones((4,))},
        }
        grads = jax.tree.map(lambda p: jnp.full_like(p, 0.3), params)

        def one_update(hp):
            opt = O.make_optimizer(hp)
            st = opt.init(params)
            upd, _ = opt.update(grads, st, params)
            return upd

        u_half = one_update(hp_half)
        u_eq = one_update(hp_eq)
        np.testing.assert_allclose(
            np.asarray(u_half["encoder"]["w"]),
            0.5 * np.asarray(u_eq["encoder"]["w"]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(u_half["mask_head"]["w"]),
            np.asarray(u_eq["mask_head"]["w"]),
            rtol=1e-6,
        )


class TestMultihostSharding:
    def test_single_process_multihost_path(self, rng):
        """shard_batch_multihost on one process must equal shard_batch, and
        the array must be usable inside jit over the mesh."""
        from fastposecnn_tpu.parallel import (
            make_mesh,
            shard_batch,
            shard_batch_multihost,
        )

        mesh = make_mesh(8)
        batch = {"x": rng.normal(size=(8, 4)).astype(np.float32)}
        a = shard_batch(batch, mesh)
        b = shard_batch_multihost(batch, mesh)
        np.testing.assert_array_equal(np.asarray(a["x"]), np.asarray(b["x"]))
        assert b["x"].sharding.is_equivalent_to(a["x"].sharding, 2)
        out = jax.jit(lambda t: t["x"].sum())(b)
        np.testing.assert_allclose(float(out), batch["x"].sum(), rtol=1e-6)

    def test_multislice_mesh_stub(self):
        from fastposecnn_tpu.parallel import make_multislice_mesh

        mesh = make_multislice_mesh(2, 4, tp=2)
        assert mesh.shape == {"slice": 2, "dp": 2, "tp": 2}

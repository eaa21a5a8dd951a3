"""Metric bank, config preset, and checkpoint round-trip tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fastposecnn_tpu import config as C
from fastposecnn_tpu import geometry, metrics as M


def payload(deg_apart, offset_m, iou_identical=True, valid=None):
    """Matched payload with controlled rotation/translation errors."""
    n = len(deg_apart)
    gt_q = np.tile([0.0, 0, 0, 1.0], (n, 1)).astype(np.float32)
    pred_q = []
    for d in deg_apart:
        # rotate about x by d degrees: quaternion (sin(d/2),0,0,cos(d/2)) xyzw
        half = np.deg2rad(d) / 2
        pred_q.append([np.sin(half), 0, 0, np.cos(half)])
    pred_q = np.asarray(pred_q, np.float32)
    gt_T = np.zeros((n, 3), np.float32)
    pred_T = np.asarray([[o, 0, 0] for o in offset_m], np.float32)
    RT = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    scales = np.ones((n, 3), np.float32)
    return {
        "valid": jnp.asarray([True] * n if valid is None else valid)[None],
        "symmetric_ids": jnp.zeros((1, n), jnp.int32),
        "class_ids": jnp.ones((1, n), jnp.int32),
        "gt_quaternion": jnp.asarray(gt_q)[None],
        "pred_quaternion": jnp.asarray(pred_q)[None],
        "gt_T": jnp.asarray(gt_T)[None],
        "pred_T": jnp.asarray(pred_T)[None],
        "gt_RT": jnp.asarray(RT)[None],
        "pred_RT": jnp.asarray(RT)[None],
        "gt_scales": jnp.asarray(scales)[None],
        "pred_scales": jnp.asarray(scales)[None],
    }


class TestMetricBank:
    def test_thresholding_and_accumulation(self):
        bank = M.init_pose_metric_bank()
        # 2 deg and 40 deg apart; offsets 0.2m (=2cm... offset*10) and 1.0m
        m1 = payload([2.0, 40.0], [0.2, 1.0])
        bank = M.update_pose_metric_bank(bank, m1)
        vals = M.compute_pose_metric_bank(bank)
        assert float(vals["degree_error_AP_5"]) == 50.0
        # offsets in 'cm' units = |T|*10 -> 2 and 10; threshold 5 -> 50%
        assert float(vals["offset_error_AP_5cm"]) == 50.0
        assert float(vals["iou_3d_mAP_0.25"]) == 100.0
        # second batch accumulates
        bank = M.update_pose_metric_bank(bank, payload([1.0], [0.1]))
        vals = M.compute_pose_metric_bank(bank)
        np.testing.assert_allclose(float(vals["degree_error_AP_5"]), 200 / 3,
                                   rtol=1e-5)

    def test_invalid_slots_ignored(self):
        bank = M.init_pose_metric_bank()
        m = payload([2.0, 2.0], [0.1, 0.1], valid=[True, False])
        bank = M.update_pose_metric_bank(bank, m)
        assert float(bank["degree_error_AP_5"]["total"]) == 1.0


class TestConfig:
    def test_presets(self):
        mask_hp = C.mask_training()
        assert mask_hp.FREEZE_ROTATION_TRAINING
        assert not mask_hp.PERFORM_AGGREGATION
        ev = C.evaluating()
        assert ev.HV_NUM_OF_HYPOTHESES == 1000
        assert ev.VALID_SIZE == 10_000
        inf = C.inference()
        assert inf.BATCH_SIZE == 1 and inf.RUNTIME_TIMING

    def test_json_roundtrip(self, tmp_path):
        hp = C.head_training(BATCH_SIZE=9)
        hp.save(tmp_path / "h.json")
        hp2 = C.HParams.load(tmp_path / "h.json")
        assert hp2.BATCH_SIZE == 9
        assert hp2.SELECTED_CLASSES == hp.SELECTED_CLASSES

    def test_ckpt_merge_only_arch_fields(self):
        ckpt_hp = C.HParams(ENCODER="resnet34", BATCH_SIZE=77)
        hp = C.merge_from_checkpoint(C.inference(), ckpt_hp)
        assert hp.ENCODER == "resnet34"  # arch field restored
        assert hp.BATCH_SIZE == 1  # run field kept from preset

    def test_cli_reflection(self):
        import argparse

        parser = argparse.ArgumentParser()
        C.add_cli_overrides(parser, C.HParams())
        args = parser.parse_args(
            ["--BATCH_SIZE", "5", "--FREEZE_ENCODER", "true",
             "--SELECTED_CLASSES", "bg", "bottle"]
        )
        hp = C.apply_cli_overrides(C.HParams(), args)
        assert hp.BATCH_SIZE == 5
        assert hp.FREEZE_ENCODER is True
        assert hp.SELECTED_CLASSES == ("bg", "bottle")


class TestCheckpointRoundtrip:
    def test_save_load(self, tmp_path):
        import dataclasses

        from fastposecnn_tpu.models import PoseRegressorNet
        from fastposecnn_tpu.train import checkpoint as ckpt
        from fastposecnn_tpu.train import optim
        from fastposecnn_tpu.train.task import create_train_state

        hp = C.mask_training(
            SELECTED_CLASSES=("bg", "bottle"), IMAGE_HEIGHT=32, IMAGE_WIDTH=32
        )
        net = PoseRegressorNet(num_classes=2)
        opt = optim.make_optimizer(hp)
        state = create_train_state(net, opt, jax.random.key(0), hp)
        ckpt.save_checkpoint(tmp_path / "ck", 3, state, hp)
        assert ckpt.latest_step(tmp_path / "ck") == 3

        # Fresh state with different preset; arch fields travel with weights
        other_hp = C.inference(
            SELECTED_CLASSES=("bg", "bottle"), IMAGE_HEIGHT=32, IMAGE_WIDTH=32,
            ENCODER="resnet34",
        )
        fresh = create_train_state(net, opt, jax.random.key(1), hp)
        restored, merged_hp = ckpt.load_checkpoint(tmp_path / "ck", fresh, other_hp)
        assert merged_hp.ENCODER == "resnet18"  # from ckpt
        assert merged_hp.BATCH_SIZE == 1  # from caller preset
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

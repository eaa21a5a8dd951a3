"""Loss-function golden tests vs independent torch/numpy implementations of
the reference formulas (FPC/lib/loss.py)."""

import jax.numpy as jnp
import numpy as np
import torch

from fastposecnn_tpu import losses as L


def matched_payload(gt_q, pred_q, sym, valid=None, **extra):
    g = np.asarray(gt_q).shape[0]
    out = {
        "valid": jnp.asarray([True] * g if valid is None else valid)[None],
        "symmetric_ids": jnp.asarray(sym, jnp.int32)[None],
        "class_ids": jnp.ones((1, g), jnp.int32),
        "gt_quaternion": jnp.asarray(gt_q, jnp.float32)[None],
        "pred_quaternion": jnp.asarray(pred_q, jnp.float32)[None],
    }
    for k, v in extra.items():
        out[k] = jnp.asarray(v, jnp.float32)[None]
    return out


class TestCrossEntropy:
    def test_matches_torch(self, rng):
        logits = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
        gt = rng.integers(0, 5, size=(2, 8, 8))
        ours = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(gt)))
        ref = torch.nn.CrossEntropyLoss()(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(gt),
        ).item()
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


class TestFocal:
    def test_matches_reference_composition(self, rng):
        """The reference feeds log-softmax outputs through a per-class
        sigmoid binary focal (pytorch_toolbelt), alpha=0.5 gamma=2."""
        logits = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
        gt = rng.integers(0, 3, size=(1, 4, 4))
        ours = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(gt)))

        x = torch.from_numpy(logits).permute(0, 3, 1, 2)
        logp = torch.log_softmax(x, dim=1)
        total = 0.0
        alpha, gamma = 0.5, 2.0
        for cls in range(3):
            t = (torch.from_numpy(gt) == cls).float()
            inp = logp[:, cls]
            logpt = -torch.nn.functional.binary_cross_entropy_with_logits(
                inp, t, reduction="none"
            )
            pt = torch.exp(logpt)
            focal = (1 - pt).pow(gamma) * (-logpt)
            focal = focal * (alpha * t + (1 - alpha) * (1 - t))
            total += focal.mean().item()
        np.testing.assert_allclose(ours, total, rtol=1e-4)


class TestQuaternionLoss:
    def test_plain_formula(self):
        gt = np.asarray([[0.0, 0, 0, 1.0], [1.0, 0, 0, 0]])
        pred = np.asarray([[0.0, 0, 0, 1.0], [0.0, 1, 0, 0]])
        m = matched_payload(gt, pred, sym=[0, 0])
        val, has = L.quaternion_loss(m)
        # dot=1 -> log(0+eps)-log(eps)=0 ; dot=0 -> log(1+eps)-log(eps)
        expect = 0.5 * (0 + (np.log(1.1) - np.log(0.1)))
        np.testing.assert_allclose(float(val), expect, rtol=1e-5)
        assert float(has) == 1.0

    def test_symmetric_y_rotation_is_free(self):
        # A pure y-rotation of the gt (in the reference's wxyz layout) must
        # incur ~zero loss for symmetric instances but not for plain ones.
        from fastposecnn_tpu import geometry

        base = np.asarray([[0.3, 0.5, -0.2, 0.79]], np.float32)
        base /= np.linalg.norm(base)
        half = np.deg2rad(77.0) / 2
        rot = np.asarray([np.cos(half), 0, np.sin(half), 0], np.float32)
        rotated = np.asarray(
            geometry.quat_multiply_wxyz(jnp.asarray(base[0]), jnp.asarray(rot))
        )[None]
        m_sym = matched_payload(base, rotated, sym=[1])
        val_sym, _ = L.quaternion_loss(m_sym)
        assert float(val_sym) < 5e-3
        m_plain = matched_payload(base, rotated, sym=[0])
        val_plain, _ = L.quaternion_loss(m_plain)
        assert float(val_plain) > 0.1

    def test_empty_matches(self):
        m = matched_payload(
            np.zeros((2, 4)), np.zeros((2, 4)), sym=[0, 0],
            valid=[False, False],
        )
        val, has = L.quaternion_loss(m)
        assert float(has) == 0.0
        assert np.isfinite(float(val))


class TestRegressionLosses:
    def test_xy_per_coordinate_sum(self):
        m = matched_payload(
            np.zeros((2, 4)), np.zeros((2, 4)), sym=[0, 0],
            gt_xy=[[10.0, 20.0], [30.0, 40.0]],
            pred_xy=[[11.0, 18.0], [33.0, 44.0]],
        )
        val, _ = L.xy_loss(m, "L1")
        # mean(|dx|) + mean(|dy|) = (1+3)/2 + (2+4)/2 = 5
        np.testing.assert_allclose(float(val), 5.0, rtol=1e-6)

    def test_z_log_space(self):
        m = matched_payload(
            np.zeros((1, 4)), np.zeros((1, 4)), sym=[0],
            gt_z=[1000.0], pred_z=[np.e * 1000.0],
        )
        val, _ = L.z_loss(m, "L1")
        np.testing.assert_allclose(float(val), 1.0, rtol=1e-5)

    def test_smooth_l1(self):
        m = matched_payload(
            np.zeros((1, 4)), np.zeros((1, 4)), sym=[0],
            gt_scales=[[0.0, 0.0, 0.0]], pred_scales=[[0.5, 2.0, 0.0]],
        )
        val, _ = L.scales_loss(m, "SmoothL1")
        np.testing.assert_allclose(float(val), 0.125 + 1.5, rtol=1e-6)

    def test_rotation_geodesic(self):
        # 90-degree rotation about z
        Rz = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        m = matched_payload(
            np.zeros((1, 4)), np.zeros((1, 4)), sym=[0],
            gt_R=[np.eye(3)], pred_R=[Rz],
        )
        val, _ = L.rotation_matrix_loss(m)
        np.testing.assert_allclose(float(val), np.pi / 2, rtol=1e-4)


class TestMaskedMSE:
    def test_masks_prediction_outside_fg(self, rng):
        pred = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
        gt = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
        cat = np.zeros((1, 4, 4), np.int32)
        cat[0, :2] = 1
        val, has = L.masked_mse(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(cat))
        fg = np.repeat((cat != 0)[..., None], 2, -1)
        expect = np.mean((pred * fg - gt) ** 2)
        np.testing.assert_allclose(float(val), expect, rtol=1e-5)
        assert float(has) == 1.0


class TestDenseSupervision:
    """losses.dense_supervision: perfect head fields => ~0; GT-channel
    selection and instance-validity / sample-weight gating."""

    WEIGHTS = {"quaternion": 1.0, "xy": 1.0, "z": 1.0, "scales": 1.0}

    def _scene_batch(self, seed=0, loss_targets=False):
        from fastposecnn_tpu.data.synthetic import (
            SceneConfig, generate_scene, perfect_logits,
        )

        cfg = SceneConfig(height=64, width=64, num_classes=4, max_instances=4)
        rng = np.random.default_rng(seed)
        scene = generate_scene(rng, cfg)
        logits = {
            k: jnp.asarray(v)
            for k, v in perfect_logits(
                scene, cfg.num_classes, loss_targets=loss_targets
            ).items()
        }
        gt_mask = jnp.asarray(scene["mask"][None].astype(np.uint8))
        agg = {k: jnp.asarray(v[None]) for k, v in scene["agg"].items()}
        return logits, gt_mask, agg

    def test_perfect_logits_zero_loss(self):
        logits, gt_mask, agg = self._scene_batch(loss_targets=True)
        total, logs = L.dense_supervision(logits, gt_mask, agg, self.WEIGHTS)
        assert float(total) < 1e-4, dict(logs)
        for k in ("quaternion/loss_dense", "xy/loss_dense", "z/loss_dense",
                  "scales/loss_dense"):
            assert k in logs and float(logs[k]) < 1e-4

    def test_wrong_fields_positive_loss(self):
        logits, gt_mask, agg = self._scene_batch()
        bad = {k: (v + 1.0 if k != "mask" else v) for k, v in logits.items()}
        total, _ = L.dense_supervision(bad, gt_mask, agg, self.WEIGHTS)
        assert float(total) > 0.5

    def test_zero_weights_trace_nothing(self):
        logits, gt_mask, agg = self._scene_batch()
        total, logs = L.dense_supervision(
            logits, gt_mask, agg,
            {"quaternion": 0.0, "xy": 0.0, "z": 0.0, "scales": 0.0},
        )
        assert float(total) == 0.0 and logs == {}

    def test_sample_weight_gates_everything(self):
        logits, gt_mask, agg = self._scene_batch()
        sw = jnp.zeros((1,), jnp.float32)
        total, logs = L.dense_supervision(
            logits, gt_mask, agg, self.WEIGHTS, sample_weight=sw
        )
        assert float(total) == 0.0

    def test_invalid_instances_excluded(self):
        logits, gt_mask, agg = self._scene_batch()
        agg = dict(agg)
        agg["valid"] = jnp.zeros_like(agg["valid"])
        # With all instances invalid the fg mask is empty -> loss 0 even
        # with corrupted fields.
        bad = {k: (v + 3.0 if k != "mask" else v) for k, v in logits.items()}
        total, _ = L.dense_supervision(bad, gt_mask, agg, self.WEIGHTS)
        assert float(total) == 0.0

    def test_dense_quat_target_is_sign_canonical(self):
        # q and -q encode the same rotation; the dense L1 target must be
        # invariant to the stored GT hemisphere or the same appearance
        # gets opposite-sign labels and the optimal field collapses to ~0
        # (the round-3 ~49 deg rotation plateau). Flipping every GT quat
        # sign must not change the loss.
        logits, gt_mask, agg = self._scene_batch()
        agg = dict(agg)
        agg["symmetric_ids"] = jnp.zeros_like(agg["symmetric_ids"])
        bad = dict(logits)
        bad["quaternion"] = logits["quaternion"] + 0.7
        _, logs_pos = L.dense_supervision(bad, gt_mask, agg,
                                          {"quaternion": 1.0})
        flipped = dict(agg)
        flipped["quaternion"] = -agg["quaternion"]
        _, logs_neg = L.dense_supervision(bad, gt_mask, flipped,
                                          {"quaternion": 1.0})
        np.testing.assert_allclose(
            float(logs_pos["quaternion/loss_dense"]),
            float(logs_neg["quaternion/loss_dense"]), rtol=1e-6,
        )
        assert float(logs_pos["quaternion/loss_dense"]) > 0.1

    def test_quat_random_is_canonical_hemisphere(self):
        from fastposecnn_tpu.data.synthetic import _quat_random

        rng = np.random.default_rng(3)
        for _ in range(64):
            q = _quat_random(rng)
            assert q[np.argmax(np.abs(q))] >= 0
            np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-6)

    def test_symmetric_instances_get_dense_swing_supervision(self):
        # Symmetric classes' rotation is only defined up to the camera-y
        # twist the symmetric metrics forgive; round-3 excluded them from
        # dense supervision entirely and their held-out geodesic stayed
        # 55-64 deg (bowl/can). They must now receive dense signal toward
        # the swing representative: a corrupted field is penalized...
        logits, gt_mask, agg = self._scene_batch()
        agg = dict(agg)
        agg["symmetric_ids"] = jnp.ones_like(agg["symmetric_ids"])
        bad = dict(logits)
        bad["quaternion"] = logits["quaternion"] + 3.0
        _, logs = L.dense_supervision(
            bad, gt_mask, agg, {"quaternion": 1.0}
        )
        assert float(logs["quaternion/loss_dense"]) > 0.5
        # ...and the optimal field is the swing target, NOT the raw GT
        # quat (which carries an arbitrary twist the loss must not pin).
        logits_t, gt_mask, agg_raw = self._scene_batch(loss_targets=True)
        agg_sym = dict(agg_raw)
        agg_sym["symmetric_ids"] = jnp.ones_like(agg_raw["symmetric_ids"])
        # loss_targets=True painted per the scene's TRUE symmetric_ids;
        # repaint with everything symmetric for this check.
        from fastposecnn_tpu import geometry

        _, logs_raw = L.dense_supervision(
            logits, gt_mask, agg_sym, {"quaternion": 1.0}
        )
        assert float(logs_raw["quaternion/loss_dense"]) > 1e-3

    def test_dense_swing_target_sign_invariant(self):
        # swing(-q) == +-swing(q): flipping every stored GT hemisphere
        # must not change the symmetric dense quat loss.
        logits, gt_mask, agg = self._scene_batch()
        agg = dict(agg)
        agg["symmetric_ids"] = jnp.ones_like(agg["symmetric_ids"])
        bad = dict(logits)
        bad["quaternion"] = logits["quaternion"] + 0.7
        _, logs_pos = L.dense_supervision(bad, gt_mask, agg,
                                          {"quaternion": 1.0})
        flipped = dict(agg)
        flipped["quaternion"] = -agg["quaternion"]
        _, logs_neg = L.dense_supervision(bad, gt_mask, flipped,
                                          {"quaternion": 1.0})
        np.testing.assert_allclose(
            float(logs_pos["quaternion/loss_dense"]),
            float(logs_neg["quaternion/loss_dense"]), rtol=1e-5,
        )

    def test_swing_canonical_is_metric_null(self):
        # The swing representative must score ~0 on BOTH symmetric degree
        # metrics (<= their 1-degree min-search discretization) while
        # being far from GT in raw geodesic terms — i.e. it removes
        # exactly the twist the metrics forgive, nothing else.
        from fastposecnn_tpu import geometry as G
        import scipy.spatial.transform as sst

        q = jnp.asarray(
            sst.Rotation.random(128, random_state=7).as_quat(), jnp.float32
        )
        s = G.quat_swing_canonical(q)
        ones = jnp.ones(q.shape[0])
        np.testing.assert_array_less(
            np.asarray(G.geodesic_quat_distance_deg(q, s, ones)), 0.51
        )
        np.testing.assert_array_less(
            np.asarray(G.quat_distance_deg(q, s, ones)), 0.51
        )
        # zero camera-y quat component, unit norm, canonical hemisphere
        np.testing.assert_allclose(np.asarray(s[:, 1]), 0.0, atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(s), axis=-1), 1.0, atol=1e-5
        )
        raw = G.geodesic_quat_distance_deg(q, s, jnp.zeros(q.shape[0]))
        assert float(jnp.mean(raw)) > 30.0

    def test_sym_quat_mode_full_ignores_symmetry_flag(self):
        # mode="full": symmetric instances are supervised toward the raw
        # canonical GT quat exactly like non-symmetric ones (right when
        # the renderer paints twist-revealing texture — synthetic.py
        # pose-cue NOCS gradients — and the target metric is the honest
        # geodesic, which never forgives twist). Flipping every
        # symmetric_id must not change the loss.
        logits, gt_mask, agg = self._scene_batch()
        bad = dict(logits)
        bad["quaternion"] = logits["quaternion"] + 0.7
        agg_sym = dict(agg)
        agg_sym["symmetric_ids"] = jnp.ones_like(agg["symmetric_ids"])
        agg_non = dict(agg)
        agg_non["symmetric_ids"] = jnp.zeros_like(agg["symmetric_ids"])
        _, a = L.dense_supervision(bad, gt_mask, agg_sym,
                                   {"quaternion": 1.0},
                                   sym_quat_mode="full")
        _, b = L.dense_supervision(bad, gt_mask, agg_non,
                                   {"quaternion": 1.0},
                                   sym_quat_mode="full")
        np.testing.assert_allclose(
            float(a["quaternion/loss_dense"]),
            float(b["quaternion/loss_dense"]), rtol=1e-6,
        )
        assert float(a["quaternion/loss_dense"]) > 0.1

    def test_sym_quat_mode_full_differs_from_swing_on_symmetric(self):
        # On an all-symmetric scene the full target (raw canonical quat,
        # twist kept) and the swing target (twist removed) must disagree:
        # a field painted with the raw targets scores ~0 under "full" but
        # positive under "swing".
        from fastposecnn_tpu import geometry as G

        logits, gt_mask, agg = self._scene_batch()
        agg = dict(agg)
        agg["symmetric_ids"] = jnp.ones_like(agg["symmetric_ids"])
        q_gt = G.quat_canonical(agg["quaternion"])
        inst = agg["instance_masks"].astype(jnp.float32)
        painted = jnp.einsum("bnhw,bnd->bhwd", inst, q_gt)
        # place the painted field at every class channel so the GT-class
        # selection picks it up regardless of class id
        ncls = logits["quaternion"].shape[-1] // 4
        full_field = jnp.tile(painted, (1, 1, 1, ncls))
        good = dict(logits)
        good["quaternion"] = full_field
        _, lf = L.dense_supervision(good, gt_mask, agg,
                                    {"quaternion": 1.0},
                                    sym_quat_mode="full")
        _, ls = L.dense_supervision(good, gt_mask, agg,
                                    {"quaternion": 1.0},
                                    sym_quat_mode="swing")
        assert float(lf["quaternion/loss_dense"]) < 1e-4
        assert float(ls["quaternion/loss_dense"]) > 1e-2

    def test_sym_quat_mode_exclude_gates_symmetric_pixels(self):
        # mode="exclude" (round-3 behavior): an all-symmetric scene gets
        # NO dense quat loss even with a corrupted field; a mixed flag
        # still penalizes the non-symmetric instances.
        logits, gt_mask, agg = self._scene_batch()
        bad = dict(logits)
        bad["quaternion"] = logits["quaternion"] + 3.0
        agg_sym = dict(agg)
        agg_sym["symmetric_ids"] = jnp.ones_like(agg["symmetric_ids"])
        _, logs = L.dense_supervision(bad, gt_mask, agg_sym,
                                      {"quaternion": 1.0},
                                      sym_quat_mode="exclude")
        assert float(logs["quaternion/loss_dense"]) == 0.0
        agg_non = dict(agg)
        agg_non["symmetric_ids"] = jnp.zeros_like(agg["symmetric_ids"])
        _, logs2 = L.dense_supervision(bad, gt_mask, agg_non,
                                       {"quaternion": 1.0},
                                       sym_quat_mode="exclude")
        assert float(logs2["quaternion/loss_dense"]) > 0.5

    def test_sym_quat_mode_invalid_raises(self):
        import pytest

        logits, gt_mask, agg = self._scene_batch()
        with pytest.raises(NotImplementedError):
            L.dense_supervision(logits, gt_mask, agg, {"quaternion": 1.0},
                                sym_quat_mode="bogus")

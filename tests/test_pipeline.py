"""End-to-end pipeline integration test on a synthetic scene with perfect
logits: the full stack must recover the GT scene (SURVEY.md §4d analogue)."""

import jax
import jax.numpy as jnp
import numpy as np

from fastposecnn_tpu import losses, metrics
from fastposecnn_tpu.data.synthetic import SceneConfig, generate_scene, perfect_logits
from fastposecnn_tpu.ops.matching import gather_matched, match_instances
from fastposecnn_tpu.pipeline import PipelineConfig, run_pipeline


def build_scene(seed=0):
    rng = np.random.default_rng(seed)
    cfg = SceneConfig()
    scene = generate_scene(rng, cfg)
    logits = {k: jnp.asarray(v) for k, v in perfect_logits(scene, cfg.num_classes).items()}
    return cfg, scene, logits


class TestFullPipeline:
    @classmethod
    def setup_class(cls):
        # One pipeline run shared by all assertions (it's pure; re-running
        # it per test method multiplied suite time ~9x).
        cls.cfg, cls.scene, cls.logits = build_scene(seed=3)
        pcfg = PipelineConfig(
            max_instances=cls.cfg.max_instances,
            max_points=512,
            hv_num_hypotheses=64,
            use_pallas=False,
        )
        inv_K = jnp.asarray(np.linalg.inv(cls.scene["intrinsics"]))
        cls.out = run_pipeline(cls.logits, jax.random.key(0), pcfg, inv_K)
        cls.gts = {
            k: jnp.asarray(v)[None] for k, v in cls.scene["agg"].items()
        }
        cls.match = match_instances(cls.out["aggregated"], cls.gts)
        cls.matched = gather_matched(
            cls.out["aggregated"], cls.gts, cls.match,
            keys=("quaternion", "scales", "z", "xy", "T", "R", "RT"),
        )

    def n_gt(self):
        return int(self.scene["agg"]["valid"].sum())

    def test_mask_recovered(self):
        np.testing.assert_array_equal(
            np.asarray(self.out["categorical"]["mask"][0]), self.scene["mask"]
        )

    def test_every_gt_matched_iou_1(self):
        valid = np.asarray(self.matched["valid"][0])
        assert valid.sum() == self.n_gt()
        iou = np.asarray(self.match["iou"][0])[valid]
        np.testing.assert_allclose(iou, 1.0, atol=1e-6)

    def test_quaternion_recovered(self):
        v = np.asarray(self.matched["valid"][0])
        gt = np.asarray(self.matched["gt_quaternion"][0])[v]
        pred = np.asarray(self.matched["pred_quaternion"][0])[v]
        dots = np.abs(np.sum(gt * pred, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-4)

    def test_center_and_depth_recovered(self):
        v = np.asarray(self.matched["valid"][0])
        gt_xy = np.asarray(self.matched["gt_xy"][0])[v]
        pred_xy = np.asarray(self.matched["pred_xy"][0])[v]
        np.testing.assert_allclose(pred_xy, gt_xy, atol=0.2)
        gt_z = np.asarray(self.matched["gt_z"][0])[v]
        pred_z = np.asarray(self.matched["pred_z"][0])[v]
        np.testing.assert_allclose(pred_z, gt_z, rtol=1e-3)

    def test_rt_recovered(self):
        v = np.asarray(self.matched["valid"][0])
        gt_T = np.asarray(self.matched["gt_T"][0])[v]
        pred_T = np.asarray(self.matched["pred_T"][0])[v]
        np.testing.assert_allclose(pred_T, gt_T, atol=2e-3)

    def test_losses_near_zero(self):
        q, has = losses.quaternion_loss(self.matched)
        assert float(has) == 1.0
        assert float(q) < 1e-2
        z, _ = losses.z_loss(self.matched)
        assert float(z) < 1e-2
        s, _ = losses.scales_loss(self.matched)
        assert float(s) < 1e-2
        xy, _ = losses.xy_loss(self.matched)
        assert float(xy) < 0.3  # pixel units
        t, _ = losses.translation_loss(self.matched)
        assert float(t) < 1e-2

    def test_metrics_perfect(self):
        bank = metrics.init_pose_metric_bank()
        bank = metrics.update_pose_metric_bank(bank, self.matched)
        vals = {k: float(v) for k, v in metrics.compute_pose_metric_bank(bank).items()}
        assert vals["degree_error_AP_5"] == 100.0
        assert vals["iou_3d_mAP_0.25"] == 100.0
        assert vals["offset_error_AP_5cm"] == 100.0
        assert vals["degree_error"] < 1.0
        assert vals["offset_error"] < 0.1

    def test_mask_scores(self):
        s = metrics.mask_scores(
            self.out["categorical"]["mask"][0],
            jnp.asarray(self.scene["mask"]),
            self.cfg.num_classes,
        )
        assert float(s["dice"]) == 1.0
        assert float(s["iou"]) == 1.0


class TestMaskOnlyPipeline:
    def test_aggregation_off(self):
        cfg, scene, logits = build_scene(seed=5)
        pcfg = PipelineConfig(perform_aggregation=False)
        out = run_pipeline(
            logits, jax.random.key(0), pcfg,
            jnp.asarray(np.linalg.inv(scene["intrinsics"])),
        )
        assert out["aggregated"] is None
        ce = losses.cross_entropy(out["logits"]["mask"], jnp.asarray(scene["mask"])[None])
        assert float(ce) < 1e-4
        fl = losses.focal_loss(out["logits"]["mask"], jnp.asarray(scene["mask"])[None])
        assert np.isfinite(fl)

"""Soft (weighted-mean) voting path tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fastposecnn_tpu.ops.voting_soft import (
    iqr_outliers,
    prune_hypotheses,
    soft_hough_vote,
    zscore_outliers,
)
from tests.test_voting import make_instance, perfect_field


class TestPruning:
    def test_zscore_flags_positive_tail(self):
        h = np.zeros((1, 16, 2), np.float32)
        h[0, :, 0] = np.linspace(-1, 1, 16)
        h[0, 5] = [30.0, 30.0]  # big positive outlier
        out = np.asarray(zscore_outliers(jnp.asarray(h), 1.0))
        assert out[0, 5]
        assert out[0].sum() <= 3

    def test_iqr_flags_both_tails(self):
        h = np.zeros((1, 17, 2), np.float32)
        h[0, :, 0] = np.linspace(0, 1, 17)
        h[0, :, 1] = np.linspace(0, 1, 17)
        h[0, 3] = [80.0, 80.0]
        h[0, 9] = [-90.0, -90.0]
        out = np.asarray(iqr_outliers(jnp.asarray(h), 1.5))
        assert out[0, 3] and out[0, 9]

    def test_replacement_median(self):
        h = np.zeros((1, 5, 2), np.float32)
        h[0, :, 0] = [1, 2, 3, 4, 100]
        h[0, :, 1] = [1, 2, 3, 4, 100]
        pruned, keep = prune_hypotheses(
            jnp.asarray(h), "iqr", drop=False, replacement="median",
            iqr_multiplier=1.5,
        )
        assert bool(keep.all())
        np.testing.assert_allclose(np.asarray(pruned[0, 4]), [3.0, 3.0])

    def test_drop_mode(self):
        h = np.zeros((1, 5, 2), np.float32)
        h[0, :, 0] = [1, 2, 3, 4, 100]
        h[0, :, 1] = [1, 2, 3, 4, 100]
        _, keep = prune_hypotheses(jnp.asarray(h), "iqr", drop=True)
        assert not bool(keep[0, 4])


class TestSoftVote:
    def test_recovers_center(self):
        center = (11.0, 8.0)
        mask, field = make_instance(center=center)
        agg = {
            "instance_masks": jnp.asarray(mask)[None, None],
            "valid": jnp.asarray([[True]]),
            "xy_dense": jnp.asarray(field)[None],
        }
        out = soft_hough_vote(
            jax.random.key(0), agg, max_points=256, num_hypotheses=64
        )
        np.testing.assert_allclose(np.asarray(out["xy"][0, 0]), center, atol=0.3)
        assert out["hypothesis"].shape == (1, 1, 64, 2)


class TestSoftPipelineIntegration:
    def test_pipeline_with_soft_voting(self):
        import jax
        import jax.numpy as jnp
        from fastposecnn_tpu.data.synthetic import SceneConfig, generate_scene, perfect_logits
        from fastposecnn_tpu.pipeline import PipelineConfig, run_pipeline

        rng = np.random.default_rng(2)
        cfg = SceneConfig()
        scene = generate_scene(rng, cfg)
        logits = {k: jnp.asarray(v) for k, v in
                  perfect_logits(scene, cfg.num_classes).items()}
        pcfg = PipelineConfig(
            max_instances=cfg.max_instances, max_points=256,
            hv_num_hypotheses=64, hv_implementation="soft", use_pallas=False,
        )
        inv_K = jnp.asarray(np.linalg.inv(scene["intrinsics"]))
        out = run_pipeline(logits, jax.random.key(0), pcfg, inv_K)
        agg = out["aggregated"]
        valid = np.asarray(agg["valid"][0])
        gt = scene["agg"]
        # every GT center has a soft-voted center nearby (instance order
        # from CC extraction differs from scene order)
        pred_xy = np.asarray(agg["xy"][0])[valid]
        for k in range(int(gt["valid"].sum())):
            d = np.linalg.norm(pred_xy - gt["xy"][k], axis=-1).min()
            assert d < 1.5, (k, d)
        assert "RT" in agg

"""Augmentation tests: ranges, determinism, geometric consistency."""

import numpy as np

from fastposecnn_tpu.data.augment import (
    AugmentConfig,
    augment_pose_training,
    augment_segmentation,
    augment_validation,
)


class TestAugment:
    def test_output_range_and_shape(self, rng):
        img = rng.random((32, 48, 3)).astype(np.float32)
        out = augment_pose_training(img, np.random.default_rng(0))
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 1

    def test_deterministic_given_seed(self, rng):
        img = rng.random((16, 16, 3)).astype(np.float32)
        a = augment_pose_training(img, np.random.default_rng(7))
        b = augment_pose_training(img, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)
        c = augment_pose_training(img, np.random.default_rng(8))
        assert np.abs(a - c).max() > 0

    def test_validation_is_noise_only(self, rng):
        img = rng.random((16, 16, 3)).astype(np.float32) * 0.5 + 0.25
        out = augment_validation(img, np.random.default_rng(0), noise_std=0.01)
        assert np.abs(out - img).max() < 0.08

    def test_segmentation_flip_consistency(self, rng):
        img = rng.random((16, 16, 3)).astype(np.float32)
        mask = (rng.random((16, 16)) > 0.5).astype(np.int32)
        # Find a seed that flips
        for seed in range(20):
            r = np.random.default_rng(seed)
            img2, mask2 = augment_segmentation(img, mask, r)
            if not np.array_equal(mask2, mask):
                assert np.array_equal(mask2, mask[:, ::-1])
                return
        raise AssertionError("no flip in 20 seeds")

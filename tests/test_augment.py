"""Augmentation tests: ranges, determinism, op behavior, OneOf structure,
perspective GT consistency."""

import numpy as np
import pytest

from fastposecnn_tpu.data import augment as A
from fastposecnn_tpu.data.augment import (
    AugmentConfig,
    augment_pose_training,
    augment_sample,
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

    def test_validation_noise_probability(self, rng):
        """Validation = noise at p=0.2 (pose_regression.py:73-77): most
        draws leave the image untouched, some perturb it."""
        img = rng.random((16, 16, 3)).astype(np.float32) * 0.5 + 0.25
        changed = [
            np.abs(augment_validation(img, np.random.default_rng(s)) - img).max()
            > 1e-6
            for s in range(200)
        ]
        frac = np.mean(changed)
        assert 0.1 < frac < 0.35  # p=0.2 +- binomial noise

    def test_segmentation_flip_consistency(self, rng):
        img = rng.random((16, 16, 3)).astype(np.float32)
        mask = (rng.random((16, 16)) > 0.5).astype(np.int32)
        for seed in range(20):
            r = np.random.default_rng(seed)
            img2, mask2 = augment_segmentation(img, mask, r)
            if not np.array_equal(mask2, mask):
                assert np.array_equal(mask2, mask[:, ::-1])
                return
        raise AssertionError("no flip in 20 seeds")


class TestOps:
    def test_clahe_flattens_histogram(self):
        """CLAHE must spread a low-contrast image across the value range."""
        rng = np.random.default_rng(0)
        img = (rng.random((64, 64, 3)) * 0.1 + 0.45).astype(np.float32)
        out = A.clahe(img, rng, AugmentConfig())
        v_in = A._rgb_to_hsv(img)[..., 2]
        v_out = A._rgb_to_hsv(np.clip(out, 0, 1))[..., 2]
        assert v_out.std() > 2.0 * v_in.std()

    def test_clahe_identity_on_uniform(self):
        """A constant image has nothing to equalize — CLAHE's clipped
        histogram redistributes to near-identity."""
        img = np.full((32, 32, 3), 0.5, np.float32)
        out = A.clahe(img, np.random.default_rng(0), AugmentConfig())
        assert np.all(np.isfinite(out))
        assert out.std() < 0.05

    def test_motion_blur_direction(self):
        """A horizontal motion kernel smears a vertical line sideways but
        leaves horizontal structure intact."""
        img = np.zeros((16, 16, 3), np.float32)
        img[:, 8] = 1.0  # vertical line

        class FixedRng:
            def uniform(self, lo, hi):
                return 0.0  # theta = 0 -> horizontal kernel

        out = A.motion_blur(img, FixedRng(), AugmentConfig())
        assert out[4, 8, 0] < 1.0  # line energy spread
        assert out[4, 7, 0] > 0.0 and out[4, 9, 0] > 0.0

    def test_noise_scale_range(self):
        """IAAAdditiveGaussianNoise scale U(0.01, 0.05) in [0,1] units."""
        img = np.full((64, 64, 3), 0.5, np.float32)
        stds = [
            (A.additive_gaussian_noise(img, np.random.default_rng(s),
                                       AugmentConfig()) - img).std()
            for s in range(20)
        ]
        assert 0.005 < min(stds) and max(stds) < 0.06

    def test_oneof_structure(self):
        """Exactly one op fires per OneOf group: with group2 (blur family)
        forced and others off, every draw blurs (high-freq energy drops)."""
        cfg = AugmentConfig(noise_p=0.0, perspective_p=0.0, group1_p=0.0,
                            group2_p=1.0, group3_p=0.0)
        rng0 = np.random.default_rng(3)
        img = (rng0.random((32, 32, 3)) > 0.5).astype(np.float32)
        for s in range(10):
            out = A.apply_photometric(img, np.random.default_rng(s), cfg)
            assert not np.array_equal(out, img)


class TestPerspective:
    def _make_sample(self, h=64, w=64):
        rng = np.random.default_rng(0)
        img = rng.random((h, w, 3)).astype(np.float32)
        mask = np.zeros((h, w), np.uint8)
        mask[20:40, 25:45] = 2
        inst = np.zeros((4, h, w), np.uint8)
        inst[0] = (mask == 2).astype(np.uint8)
        K = np.array([[70.0, 0, w / 2], [0, 70.0, h / 2], [0, 0, 1.0]])
        z = 500.0  # mm
        xy = np.array([[35.0, 30.0], [0, 0], [0, 0], [0, 0]], np.float32)
        T = (np.linalg.inv(K) @ np.r_[xy[0] * (z / 1000.0), z / 1000.0])
        R = np.eye(3, dtype=np.float32)
        RT = np.eye(4, dtype=np.float32)
        RT[:3, 3] = -R @ T
        agg = {
            "instance_masks": inst,
            "xy": xy,
            "z": np.array([z, 0, 0, 0], np.float32),
            "T": np.stack([T.astype(np.float32)] + [np.zeros(3, np.float32)] * 3),
            "RT": np.stack([RT] + [np.eye(4, dtype=np.float32)] * 3),
            "valid": np.array([True, False, False, False]),
        }
        return {
            "image": img,
            "mask": mask,
            "depth": np.full((h, w), 500.0, np.float32),
            "agg": agg,
        }, K

    def test_gt_warps_with_image(self):
        """Perspective must move mask/instance masks/xy together: the
        warped GT center stays inside the warped instance mask, and the
        class mask equals instance 0's support."""
        cfg = AugmentConfig(perspective_p=1.0, noise_p=0.0, group1_p=0.0,
                            group2_p=0.0, group3_p=0.0)
        sample, K = self._make_sample()
        orig_mask = sample["mask"].copy()
        out = augment_sample(sample, np.random.default_rng(5), cfg,
                             intrinsics=K)
        assert not np.array_equal(out["mask"], orig_mask)
        np.testing.assert_array_equal(
            (out["mask"] == 2).astype(np.uint8), out["agg"]["instance_masks"][0]
        )
        ys, xs = np.nonzero(out["agg"]["instance_masks"][0])
        cx, cy = out["agg"]["xy"][0]
        assert xs.min() - 1 <= cx <= xs.max() + 1
        assert ys.min() - 1 <= cy <= ys.max() + 1

    def test_t_rt_consistent_with_warped_xy(self):
        """T must reproject to the warped xy; RT translation = -R @ T."""
        cfg = AugmentConfig(perspective_p=1.0, noise_p=0.0, group1_p=0.0,
                            group2_p=0.0, group3_p=0.0)
        sample, K = self._make_sample()
        out = augment_sample(sample, np.random.default_rng(5), cfg,
                             intrinsics=K)
        agg = out["agg"]
        proj = K @ agg["T"][0]
        np.testing.assert_allclose(proj[:2] / proj[2], agg["xy"][0], atol=1e-3)
        np.testing.assert_allclose(agg["T"][0][2] * 1000.0, agg["z"][0],
                                   atol=1e-2)
        np.testing.assert_allclose(
            agg["RT"][0][:3, 3],
            -agg["RT"][0][:3, :3] @ agg["T"][0],
            atol=1e-5,
        )

    def test_invalid_slots_untouched(self):
        cfg = AugmentConfig(perspective_p=1.0, noise_p=0.0, group1_p=0.0,
                            group2_p=0.0, group3_p=0.0)
        sample, K = self._make_sample()
        out = augment_sample(sample, np.random.default_rng(5), cfg,
                             intrinsics=K)
        np.testing.assert_array_equal(out["agg"]["xy"][1:], 0.0)
        np.testing.assert_array_equal(out["agg"]["T"][1:], 0.0)

    def test_homography_roundtrip(self):
        """warp_points(H) then warp_points(inv(H)) is identity."""
        rng = np.random.default_rng(1)
        H = A.sample_homography(64, 64, rng, AugmentConfig())
        pts = rng.random((10, 2)) * 64
        back = A.warp_points(A.warp_points(pts, H), np.linalg.inv(H))
        np.testing.assert_allclose(back, pts, atol=1e-8)

    def test_warp_image_identity(self):
        img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
        out = A.warp_image(img, np.eye(3), order=1)
        np.testing.assert_allclose(out, img, atol=1e-6)
        m = (img[..., 0] > 0.5).astype(np.uint8)
        np.testing.assert_array_equal(A.warp_image(m, np.eye(3), order=0), m)

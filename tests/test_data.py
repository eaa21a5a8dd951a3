"""Data pipeline tests: synthetic NOCS-on-disk roundtrip through the reader."""

import numpy as np

from fastposecnn_tpu.data.nocs import CAMERADataset, collate
from fastposecnn_tpu.data.nocs_writer import write_synthetic_nocs
from fastposecnn_tpu.data.synthetic import SceneConfig


class TestNOCSRoundtrip:
    def test_write_scan_read(self, tmp_path, rng):
        cfg = SceneConfig(height=60, width=80)
        write_synthetic_nocs(tmp_path, num_samples=6, scene_cfg=cfg)
        ds = CAMERADataset(tmp_path, max_instances=8, normalize=False)
        assert len(ds) == 6
        s = ds[0]
        assert s is not None
        assert s["image"].shape == (60, 80, 3)
        assert s["mask"].shape == (60, 80)
        agg = s["agg"]
        n = int(agg["valid"].sum())
        assert n >= 1
        # class mask must agree with instance masks + class ids
        for k in range(n):
            region = agg["instance_masks"][k] > 0
            assert (s["mask"][region] == agg["class_ids"][k]).all()
        # quaternions unit norm; z positive
        np.testing.assert_allclose(
            np.linalg.norm(agg["quaternion"][:n], axis=-1), 1.0, atol=1e-5
        )
        assert (agg["z"][:n] > 0).all()

    def test_write_touches_completion_marker(self, tmp_path):
        # A mid-render kill leaves scenes but no marker; reuse checks
        # (cli/train._render_if_empty) must then discard the torn bank
        # instead of clamping the staged buffer below TRAIN_SIZE (the
        # 919-of-1024 incident, BASELINE.md round 4). The scanner must
        # also ignore the marker file.
        cfg = SceneConfig(height=60, width=80)
        write_synthetic_nocs(tmp_path, num_samples=2, scene_cfg=cfg)
        assert (tmp_path / ".complete").exists()
        ds = CAMERADataset(tmp_path, max_instances=8, normalize=False)
        assert len(ds) == 2

    def test_gt_geometry_consistency(self, tmp_path):
        # T re-derived by the reader from stored RTs must match the scene's
        # T up to the int-quantization of the projected origin.
        cfg = SceneConfig(height=60, width=80)
        write_synthetic_nocs(tmp_path, num_samples=3, scene_cfg=cfg, seed=7)
        ds = CAMERADataset(tmp_path, max_instances=8, normalize=False)
        s = ds[1]
        agg = s["agg"]
        n = int(agg["valid"].sum())
        for k in range(n):
            RT = agg["RT"][k]
            inv = np.linalg.inv(RT)
            np.testing.assert_allclose(
                inv[2, 3] * 1000.0, agg["z"][k], rtol=1e-4
            )
            # T back-projects near the projected origin
            np.testing.assert_allclose(agg["T"][k][2] * 1000, agg["z"][k], rtol=1e-4)

    def test_gt_xy_in_image_frame_at_reduced_resolution(self, tmp_path):
        # At a working resolution below the native 640x480 the projected
        # center GT must land ON the rendered instance (same pixel frame as
        # the image), not at native-frame coordinates ~2x away. Guards the
        # round-3 scaled_intrinsics fix (constants.scaled_intrinsics): the
        # dense vote-field targets are derived from this xy, so a frame
        # mismatch silently poisons xy/offset training at reduced sizes.
        cfg = SceneConfig(
            height=224, width=320, render_pose_cues=True, max_instances=8
        )
        write_synthetic_nocs(tmp_path, num_samples=2, scene_cfg=cfg, seed=3)
        ds = CAMERADataset(tmp_path, max_instances=8, normalize=False)
        checked = 0
        for s in (ds[0], ds[1]):
            agg = s["agg"]
            for k in range(int(agg["valid"].sum())):
                ys, xs = np.nonzero(agg["instance_masks"][k])
                centroid = np.array([xs.mean(), ys.mean()])
                err = np.linalg.norm(agg["xy"][k] - centroid)
                # cuboid centroid vs projected origin differ by a few px;
                # the native-frame bug puts the center ~100+ px away.
                assert err < 25.0, (k, agg["xy"][k], centroid)
                checked += 1
        assert checked >= 2

    def test_collate_and_none_handling(self, tmp_path):
        cfg = SceneConfig(height=60, width=80)
        write_synthetic_nocs(tmp_path, num_samples=4, scene_cfg=cfg)
        ds = CAMERADataset(tmp_path, max_instances=8)
        batch = collate([ds[i] for i in range(4)])
        assert batch["image"].shape == (4, 60, 80, 3)
        assert batch["agg"]["instance_masks"].shape == (4, 8, 60, 80)
        assert collate([None, None]) is None

    def test_class_filtering(self, tmp_path):
        cfg = SceneConfig(height=60, width=80)
        write_synthetic_nocs(tmp_path, num_samples=6, scene_cfg=cfg, seed=3)
        ds_all = CAMERADataset(tmp_path, max_instances=8)
        ds_sub = CAMERADataset(
            tmp_path,
            selected_classes=("bg", "bottle"),
            max_instances=8,
        )
        assert len(ds_sub) <= len(ds_all)
        for i in range(len(ds_sub)):
            s = ds_sub[i]
            if s is None:
                continue
            agg = s["agg"]
            n = int(agg["valid"].sum())
            assert (agg["class_ids"][:n] == 1).all()


class TestAugmentationWiring:
    """Augmentation is applied inside __getitem__ (FPC dataset.py:242-245)
    and varies per epoch but is reproducible within one."""

    def test_train_augmentation_varies_by_epoch(self, tmp_path):
        from fastposecnn_tpu.data.augment import AugmentConfig

        cfg = SceneConfig(height=60, width=80)
        write_synthetic_nocs(tmp_path, num_samples=2, scene_cfg=cfg)
        plain = CAMERADataset(tmp_path, max_instances=8, normalize=False)
        # Perspective pinned off so this test isolates the photometric
        # wiring (TestPerspective in test_augment.py covers geometry).
        aug = CAMERADataset(
            tmp_path, max_instances=8, normalize=False, augmentation="train",
            aug_cfg=AugmentConfig(perspective_p=0.0),
        )
        base = plain[0]["image"]
        aug.epoch = 0
        e0 = aug[0]["image"]
        e0_again = aug[0]["image"]
        aug.epoch = 1
        e1 = aug[0]["image"]
        assert not np.allclose(e0, base)       # augmentation happened
        np.testing.assert_array_equal(e0, e0_again)  # reproducible in-epoch
        assert not np.allclose(e0, e1)         # differs across epochs
        # GT untouched by photometric augmentation
        np.testing.assert_array_equal(
            aug[0]["mask"], plain[0]["mask"]
        )

    def test_train_perspective_warps_gt_with_image(self, tmp_path):
        """With perspective forced on, the dense mask and instance masks
        move together and stay mutually consistent."""
        from fastposecnn_tpu.data.augment import AugmentConfig

        cfg = SceneConfig(height=60, width=80)
        write_synthetic_nocs(tmp_path, num_samples=2, scene_cfg=cfg)
        plain = CAMERADataset(tmp_path, max_instances=8, normalize=False)
        aug = CAMERADataset(
            tmp_path, max_instances=8, normalize=False, augmentation="train",
            aug_cfg=AugmentConfig(perspective_p=1.0),
        )
        p, a = plain[0], aug[0]
        assert not np.array_equal(a["mask"], p["mask"])
        # class mask == union of per-instance masks painted with class ids
        rebuilt = np.zeros_like(a["mask"])
        agg = a["agg"]
        for k in range(int(agg["valid"].sum())):
            rebuilt[agg["instance_masks"][k] > 0] = agg["class_ids"][k]
        np.testing.assert_array_equal(rebuilt, a["mask"])

    def test_valid_mode_is_noise_only_and_loader_advances_epoch(
        self, tmp_path
    ):
        from fastposecnn_tpu.data.augment import AugmentConfig
        from fastposecnn_tpu.data.loader import PrefetchLoader

        cfg = SceneConfig(height=60, width=80)
        write_synthetic_nocs(tmp_path, num_samples=2, scene_cfg=cfg)
        # noise_p=1 so every draw perturbs (the parity default 0.2 makes
        # "did noise fire" seed-dependent; probability is covered by
        # test_augment.py::test_validation_noise_probability)
        ds = CAMERADataset(
            tmp_path, max_instances=8, normalize=False, augmentation="valid",
            aug_cfg=AugmentConfig(noise_p=1.0),
        )
        plain = CAMERADataset(tmp_path, max_instances=8, normalize=False)
        delta = ds[0]["image"] - plain[0]["image"]
        assert 0 < np.abs(delta).max() < 0.4   # small gaussian noise
        np.testing.assert_array_equal(ds[0]["mask"], plain[0]["mask"])
        loader = PrefetchLoader(ds, 2, shuffle=False, num_workers=1)
        first = [b["image"].copy() for b in loader if b is not None]
        second = [b["image"].copy() for b in loader if b is not None]
        assert ds.epoch == 1  # loader propagated its epoch
        assert not np.allclose(first[0], second[0])

    def test_abandoned_iteration_stops_producer(self, tmp_path):
        """Breaking out of loader iteration must not leave the producer
        thread blocked on the bounded queue (with backend='process' that
        thread pins a whole forked worker pool)."""
        import threading
        import time

        from fastposecnn_tpu.data.loader import PrefetchLoader

        cfg = SceneConfig(height=60, width=80)
        write_synthetic_nocs(tmp_path, num_samples=8, scene_cfg=cfg)
        ds = CAMERADataset(tmp_path, max_instances=8, normalize=False)
        loader = PrefetchLoader(ds, 1, shuffle=False, num_workers=1,
                                prefetch=1)
        before = threading.active_count()
        epoch_before = loader.epoch
        for batch in loader:
            break  # abandon after one batch; producer has 7 more queued up
        deadline = time.monotonic() + 10.0
        while threading.active_count() > before and \
                time.monotonic() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before, \
            "producer thread still alive after abandoned iteration"
        # an aborted epoch must not advance the shuffle/augment stream
        assert loader.epoch == epoch_before


class TestCueBoostRenderer:
    """SceneConfig.cue_boost (round-5 cue-ceiling A/B arm)."""

    def test_base_renderer_unchanged_and_boost_differs(self):
        """cue_boost=False must keep the EXACT base render (same RNG
        stream, same pixels — committed training banks stay valid), while
        cue_boost=True changes instance appearance but not GT."""
        from fastposecnn_tpu.data.synthetic import generate_scene

        base1 = generate_scene(np.random.default_rng(7), SceneConfig(
            height=96, width=128, render_pose_cues=True))
        base2 = generate_scene(np.random.default_rng(7), SceneConfig(
            height=96, width=128, render_pose_cues=True))
        boost = generate_scene(np.random.default_rng(7), SceneConfig(
            height=96, width=128, render_pose_cues=True, cue_boost=True))

        np.testing.assert_array_equal(base1["image"], base2["image"])
        # identical geometry/GT (the boost is pure texture)...
        np.testing.assert_array_equal(base1["mask"], boost["mask"])
        for k in ("quaternion", "scales", "xy", "z", "valid", "RT"):
            np.testing.assert_array_equal(base1["agg"][k], boost["agg"][k])
        # ...but different pixels on the instances
        on = base1["mask"] > 0
        assert on.any()
        assert np.abs(base1["image"][on] - boost["image"][on]).max() > 0.05

    def test_boost_carries_higher_spatial_frequency(self):
        """The tri-axis carriers must add high-frequency energy on the
        instance surface — the twist cue the base renderer lacks."""
        from fastposecnn_tpu.data.synthetic import generate_scene

        def hf_energy(scene):
            # PER-CHANNEL gradients: the boost carriers live in separate
            # channels (R<-x, G<-y, B<-z) and largely cancel in a channel
            # mean. Training resolution: small boxes under-resolve the
            # stripes at toy sizes.
            img = scene["image"]
            on = scene["mask"] > 0
            es = []
            for c in range(3):
                gy, gx = np.gradient(img[..., c])
                es.append(np.hypot(gy, gx)[on].mean())
            return float(np.mean(es))

        cfgs = dict(height=224, width=320, render_pose_cues=True,
                    max_scene_instances=2)
        vals = []
        for boost in (False, True):
            e = [hf_energy(generate_scene(
                    np.random.default_rng(s),
                    SceneConfig(cue_boost=boost, **cfgs)))
                 for s in range(3)]
            vals.append(np.mean(e))
        assert vals[1] > 1.4 * vals[0], vals

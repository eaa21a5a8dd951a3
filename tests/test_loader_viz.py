"""PrefetchLoader behavior + visualization/report smoke tests."""

import numpy as np

from fastposecnn_tpu.data.loader import PrefetchLoader


class FakeDataset:
    def __init__(self, n, h=8, w=8, g=2, reject=()):
        self.n, self.h, self.w, self.g = n, h, w, g
        self.reject = set(reject)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i in self.reject:
            return None
        return {
            "path": f"s{i}",
            "image": np.full((self.h, self.w, 3), i, np.float32),
            "mask": np.zeros((self.h, self.w), np.int32),
            "agg": {"class_ids": np.zeros((self.g,), np.int32),
                    "valid": np.zeros((self.g,), bool)},
        }


class TestPrefetchLoader:
    def test_batching_and_order_deterministic(self):
        ds = FakeDataset(7)
        loader = PrefetchLoader(ds, batch_size=3, shuffle=False, num_workers=2)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["image"].shape == (3, 8, 8, 3)
        assert batches[-1]["image"].shape == (1, 8, 8, 3)
        ids = [b["image"][0, 0, 0, 0] for b in batches]
        assert ids == [0.0, 3.0, 6.0]

    def test_shuffle_changes_across_epochs(self):
        ds = FakeDataset(16)
        loader = PrefetchLoader(ds, batch_size=4, shuffle=True, seed=1)
        e1 = [b["image"][:, 0, 0, 0].tolist() for b in loader]
        e2 = [b["image"][:, 0, 0, 0].tolist() for b in loader]
        assert e1 != e2  # epoch counter reseeds the permutation
        assert sorted(sum(e1, [])) == sorted(sum(e2, []))

    def test_rejected_samples_and_drop_last(self):
        ds = FakeDataset(6, reject={0, 1, 2})
        loader = PrefetchLoader(ds, batch_size=3, shuffle=False)
        batches = list(loader)
        assert batches[0] is None  # all three rejected -> None batch
        assert batches[1]["image"].shape[0] == 3
        loader2 = PrefetchLoader(FakeDataset(7), batch_size=3, shuffle=False,
                                 drop_last=True)
        assert len(list(loader2)) == 2


class TestVizSmoke:
    def test_figures_build(self, rng, tmp_path):
        import matplotlib.pyplot as plt

        from fastposecnn_tpu.utils import visualize as vz

        img = rng.random((32, 32, 3)).astype(np.float32)
        mask = rng.integers(0, 4, (32, 32))
        fig = vz.make_summary_figure(
            rgb=img, mask=vz.colorize_mask(mask, 4),
            z=vz.colorize_dense(rng.random((32, 32))),
        )
        arr = vz.figure_to_array(fig)
        assert arr.ndim == 3 and arr.shape[2] == 3
        plt.close("all")

    def test_hough_and_pose_overlays(self, rng):
        from fastposecnn_tpu.utils import visualize as vz

        img = rng.random((32, 32, 3)).astype(np.float32)
        centers = np.asarray([[10.0, 12.0], [20.0, 8.0]])
        valid = np.asarray([True, False])
        out = vz.visualize_hypothesis(img, centers, valid,
                                      gt_centers=centers + 1)
        assert out.shape == img.shape
        K = np.asarray([[60.0, 0, 16], [0, 60, 16], [0, 0, 1]])
        RT = np.eye(4); RT[2, 3] = -1.0
        out2 = vz.compare_pose_performance(
            img, RT[None], np.ones((1, 3)) * 0.3, RT[None],
            np.ones((1, 3)) * 0.3, np.asarray([True]), K,
        )
        assert out2.shape == img.shape

    def test_ap_plot_and_report(self, tmp_path):
        import matplotlib.pyplot as plt

        from fastposecnn_tpu.utils.report import save_aps
        from fastposecnn_tpu.utils.visualize import plot_aps

        thr = {"3d_iou": np.linspace(0, 1, 5)}
        aps = {"3d_iou": {"bottle": np.linspace(1, 0, 5), "mean": np.linspace(1, 0, 5)}}
        fig = plot_aps(aps, thr, {"3d_iou": "IoU"}, {"3d_iou": "x"},
                       ["bottle", "mean"])
        fig.savefig(tmp_path / "aps.png")
        plt.close(fig)
        out = save_aps(tmp_path / "t.xlsx", thr, aps, ["bottle", "mean"])
        assert out.exists()


class TestVizFamilies:
    """New visualization families (FPC visualize.py:50-292, 296-399,
    1045-1139, 1272-1349)."""

    def test_dense_colorizers_shapes(self, rng):
        from fastposecnn_tpu.utils import visualize as vz

        h, w = 24, 32
        quat = rng.normal(size=(h, w, 4)).astype(np.float32)
        quat[:5] = 0  # background rows
        out = vz.colorize_quaternion(quat)
        assert out.shape == (h, w, 3)
        np.testing.assert_array_equal(out[:5], 0.0)  # bg -> black
        assert vz.colorize_quaternion(quat, bg="white")[:5].min() == 1.0
        assert vz.colorize_z(rng.random((h, w))).shape == (h, w, 3)
        assert vz.colorize_scales(rng.random((h, w, 3))).shape == (h, w, 3)
        assert vz.colorize_xy(rng.random((h, w, 2))).shape == (h, w, 3)
        mask = (rng.random((h, w)) > 0.5).astype(np.int32)
        ang = vz.colorize_xy_angle(mask, rng.normal(size=(h, w, 2)))
        np.testing.assert_array_equal(ang[mask == 0], 0.0)

    def test_hough_voting_overlay(self, rng):
        from fastposecnn_tpu.utils import visualize as vz

        mask = np.zeros((32, 32), np.float32)
        mask[8:20, 8:20] = 1.0
        hyp = rng.uniform(0, 32, size=(16, 2))
        hyp[0] = (-40, 90)  # out of frame -> clamped visible
        img = vz.visualize_hough_voting(mask, hyp, hyp[:8], np.r_[14.0, 14.0])
        assert img.shape == (32, 32, 3)
        # winner drawn red at (14,14)
        np.testing.assert_array_equal(img[14, 14], (1.0, 0.0, 0.0))
        assert (img[..., 2] == 1).any()  # some blue hypothesis pixels

    def test_quaternion_quiver_and_qv_mult(self):
        from fastposecnn_tpu.utils import visualize as vz

        # 90-degree rotation about z (xyzw): x-axis -> y-axis
        q = np.asarray([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
        r = vz.qv_mult(q, np.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(r, [0.0, 1.0, 0.0], atol=1e-12)
        fig = vz.plot_quaternions(np.stack([q, q]))
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_compare_all_performance_grid(self, rng):
        from fastposecnn_tpu.utils import visualize as vz

        h, w, n = 24, 32, 3
        cat = {
            "mask": rng.integers(0, 3, size=(h, w)),
            "z": rng.random((h, w)).astype(np.float32),
            "scales": rng.random((h, w, 3)).astype(np.float32),
            "quaternion": rng.normal(size=(h, w, 4)).astype(np.float32),
            "xy": rng.normal(size=(h, w, 2)).astype(np.float32),
        }
        agg = {
            "valid": np.asarray([True, False, False]),
            "hypothesis": rng.uniform(0, 30, size=(n, 8, 2)),
            "pruned_hypothesis": rng.uniform(0, 30, size=(n, 8, 2)),
            "xy": rng.uniform(0, 30, size=(n, 2)),
        }
        figs = vz.compare_all_performance(
            rng.random((h, w, 3)), cat, num_classes=3,
            gt_mask=cat["mask"], aggregated=agg,
        )
        assert len(figs) == 3
        import matplotlib.pyplot as plt

        for f in figs:
            plt.close(f)

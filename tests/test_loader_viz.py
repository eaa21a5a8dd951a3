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

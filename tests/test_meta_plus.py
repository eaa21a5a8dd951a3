"""Offline-prep tests: Umeyama alignment recovers a known pose from a
synthetic coord+depth rendering, and the full meta+ writer round-trips
through the dataset reader."""

import json
import pathlib

import numpy as np
import scipy.spatial.transform as sst
from PIL import Image

from fastposecnn_tpu import constants
from fastposecnn_tpu.data.meta_plus import (
    align_instance,
    create_meta_plus_dataset,
    rt_to_quat,
    umeyama,
)


class TestUmeyama:
    def test_recovers_similarity(self, rng):
        src = rng.normal(size=(200, 3))
        R = sst.Rotation.random(random_state=0).as_matrix()
        s, t = 0.37, np.array([0.2, -0.5, 1.4])
        dst = s * src @ R.T + t
        s2, R2, t2 = umeyama(src, dst)
        np.testing.assert_allclose(s2, s, rtol=1e-9)
        np.testing.assert_allclose(R2, R, atol=1e-9)
        np.testing.assert_allclose(t2, t, atol=1e-9)


def render_instance(intrinsics, R, s, h=120, w=160, box=(40, 30, 80, 70)):
    """Synthesize coord/depth maps consistent with inv_RT = [sR | t].

    t is placed at the camera-space center of the pixel box so the patch
    lands inside the model cube. Returns (coord, depth, mask, t).
    """
    x0, y0, x1, y1 = box
    ys, xs = np.mgrid[y0:y1, x0:x1]
    # curved depth surface (non-planar for a well-posed alignment)
    z = 1.2 + 0.0004 * (xs - (x0 + x1) / 2) ** 2 + 0.0003 * (ys - y0) ** 2
    inv_K = np.linalg.inv(intrinsics)
    pix = np.stack([xs * z, ys * z, z], axis=-1)
    cam = pix @ inv_K.T
    cz = 1.2 + 0.0001 * ((x1 - x0) ** 2 / 4)
    t = inv_K @ np.array([(x0 + x1) / 2 * cz, (y0 + y1) / 2 * cz, cz])
    # model coords: p = (1/s) R^T (c - t)
    p = (cam - t) @ R / s
    keep = np.all(np.abs(p) < 0.5, axis=-1)
    coord = np.zeros((h, w, 3))
    depth = np.zeros((h, w), np.uint16)
    mask = np.zeros((h, w), bool)
    coord[ys[keep], xs[keep]] = p[keep] + 0.5
    depth[ys[keep], xs[keep]] = (z[keep] * 1000).astype(np.uint16)
    mask[ys[keep], xs[keep]] = True
    return coord, depth, mask, t


class TestAlignInstance:
    def test_recovers_known_pose(self):
        K = constants.INTRINSICS["CAMERA"].copy()
        K[0] *= 160 / 640
        K[1] *= 120 / 480
        R = sst.Rotation.from_euler("xyz", [20, -35, 50], degrees=True).as_matrix()
        s = 0.6
        coord, depth, mask, t = render_instance(K, R, s)
        assert mask.sum() > 200
        res = align_instance(coord, depth, mask, K)
        assert res is not None
        s2, RT = res
        np.testing.assert_allclose(s2, s, rtol=0.02)
        inv_RT = np.linalg.inv(RT)
        np.testing.assert_allclose(inv_RT[:3, :3] / s2, R, atol=0.02)
        np.testing.assert_allclose(inv_RT[:3, 3], t, atol=0.01)

    def test_quat_consistency(self):
        K = constants.INTRINSICS["CAMERA"].copy()
        K[0] *= 160 / 640
        K[1] *= 120 / 480
        R = sst.Rotation.from_euler("zyx", [10, 40, -25], degrees=True).as_matrix()
        coord, depth, mask, _t = render_instance(K, R, 0.6)
        _, RT = align_instance(coord, depth, mask, K)
        quat, _T, factor = rt_to_quat(RT.copy())
        # reconstruct rotation from quaternion and compare directions
        R_rec = sst.Rotation.from_quat(quat).as_matrix()
        np.testing.assert_allclose(
            np.abs(np.diag(R_rec.T @ (RT[:3, :3] / np.cbrt(np.linalg.det(RT[:3, :3]))))),
            1.0, atol=0.05,
        )


class TestCreateMetaDataset:
    def test_writes_and_reader_accepts(self, tmp_path):
        K = constants.INTRINSICS["CAMERA"]
        R = sst.Rotation.from_euler("xyz", [15, 25, -30], degrees=True).as_matrix()
        coord, depth, mask, _t = render_instance(
            K, R, 0.8, h=480, w=640, box=(200, 150, 400, 330),
        )
        d = tmp_path / "00000"
        d.mkdir()
        color = (np.random.default_rng(0).random((480, 640, 3)) * 255).astype(
            np.uint8
        )
        Image.fromarray(color).save(d / "0000_color.png")
        inst_mask = np.where(mask, 1, 255).astype(np.uint8)
        Image.fromarray(inst_mask).save(d / "0000_mask.png")
        Image.fromarray((coord * 255).astype(np.uint8)).save(d / "0000_coord.png")
        Image.fromarray(depth).save(d / "0000_depth.png")
        (d / "0000_meta.txt").write_text("1 1 model_a\n")

        n = create_meta_plus_dataset(tmp_path, K)
        assert n == 1
        meta = json.loads((d / "0000_meta+.json").read_text())
        assert meta["instance_dict"] == {"1": 1}
        assert len(meta["RTs"]) == 1

        from fastposecnn_tpu.data.nocs import CAMERADataset

        ds = CAMERADataset(tmp_path, max_instances=4)
        s = ds[0]
        assert s is not None
        assert int(s["agg"]["valid"].sum()) == 1
        assert s["agg"]["z"][0] > 0


class TestObjModelScales:
    """Scale extraction from the NOCS obj_models library
    (create_meta+.py:170-185 CAMERA, :310-320 REAL)."""

    def test_camera_bbox_difference(self, tmp_path):
        from fastposecnn_tpu.data.meta_plus import obj_model_scale

        mdl = tmp_path / "03642806" / "fe2236c135bc169e7e1c85c5c15da7fb"
        mdl.mkdir(parents=True)
        bbox = np.asarray([[0.21, 0.14, 0.30], [-0.21, -0.14, -0.30]])
        np.savetxt(mdl / "bbox.txt", bbox)
        s = obj_model_scale(
            tmp_path, ("03642806", "fe2236c135bc169e7e1c85c5c15da7fb"),
            "CAMERA",
        )
        np.testing.assert_allclose(s, bbox[0] - bbox[1], atol=1e-12)

    def test_real_vector_normalized(self, tmp_path):
        from fastposecnn_tpu.data.meta_plus import obj_model_scale

        v = np.asarray([0.2, 0.3, 0.6])
        np.savetxt(tmp_path / "mug_brown_starbucks_norm.txt", v)
        s = obj_model_scale(tmp_path, ("mug_brown_starbucks_norm",), "REAL")
        np.testing.assert_allclose(s, v / np.linalg.norm(v), atol=1e-12)
        np.testing.assert_allclose(np.linalg.norm(s), 1.0, atol=1e-12)

    def test_missing_returns_none(self, tmp_path):
        from fastposecnn_tpu.data.meta_plus import obj_model_scale

        assert obj_model_scale(tmp_path, ("nope",), "REAL") is None
        assert obj_model_scale(None, ("a", "b"), "CAMERA") is None
        assert obj_model_scale(tmp_path, (), "CAMERA") is None

    def test_sample_prefers_obj_models(self, tmp_path):
        """create_meta_plus_for_sample uses the bbox scale when the library
        is provided (fallback otherwise exercised by TestCreateMetaDataset).
        """
        from fastposecnn_tpu.data.meta_plus import (
            create_meta_plus_for_sample,
        )

        K = constants.INTRINSICS["CAMERA"]
        R = sst.Rotation.from_euler(
            "xyz", [15, 25, -30], degrees=True
        ).as_matrix()
        coord, depth, mask, _t = render_instance(
            K, R, 0.8, h=480, w=640, box=(200, 150, 400, 330),
        )
        d = tmp_path / "scene"
        d.mkdir()
        color = np.zeros((480, 640, 3), np.uint8)
        Image.fromarray(color).save(d / "0000_color.png")
        Image.fromarray(np.where(mask, 1, 255).astype(np.uint8)).save(
            d / "0000_mask.png"
        )
        Image.fromarray((coord * 255).astype(np.uint8)).save(
            d / "0000_coord.png"
        )
        Image.fromarray(depth).save(d / "0000_depth.png")
        (d / "0000_meta.txt").write_text("1 6 02880940 modelhash\n")

        lib = tmp_path / "obj_models"
        (lib / "02880940" / "modelhash").mkdir(parents=True)
        bbox = np.asarray([[0.15, 0.1, 0.2], [-0.15, -0.1, -0.2]])
        np.savetxt(lib / "02880940" / "modelhash" / "bbox.txt", bbox)

        meta = create_meta_plus_for_sample(
            d / "0000_color.png", K, obj_models_dir=lib,
            dataset_name="CAMERA",
        )
        np.testing.assert_allclose(
            meta["scales"][0], bbox[0] - bbox[1], atol=1e-12
        )

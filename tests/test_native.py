"""Native library tests: PNG decode + CC labeling golden vs PIL/scipy."""

import numpy as np
import pytest
import scipy.ndimage
from PIL import Image

from fastposecnn_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="native library not built"
)


class TestPngDecode:
    def test_rgb_roundtrip(self, tmp_path, rng):
        img = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
        p = tmp_path / "x.png"
        Image.fromarray(img).save(p)
        out = nl.decode_png(p)
        np.testing.assert_array_equal(out, img)

    def test_gray16_roundtrip(self, tmp_path, rng):
        depth = (rng.random((16, 24)) * 60000).astype(np.uint16)
        p = tmp_path / "d.png"
        Image.fromarray(depth).save(p)
        out = nl.decode_png(p)
        np.testing.assert_array_equal(out.squeeze(), depth)

    def test_decode_normalized(self, tmp_path, rng):
        img = (rng.random((12, 18, 3)) * 255).astype(np.uint8)
        p = tmp_path / "c.png"
        Image.fromarray(img).save(p)
        out = nl.decode_normalized(p, 12, 18)
        mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        std = np.asarray([0.229, 0.224, 0.225], np.float32)
        expect = (img.astype(np.float32) / 255.0 - mean) / std
        np.testing.assert_allclose(out, expect, atol=1e-6)

    def test_missing_file_errors(self, tmp_path):
        with pytest.raises(IOError):
            nl.png_info(tmp_path / "nope.png")


class TestNativeCC:
    def test_matches_scipy_exactly(self, rng):
        for _ in range(5):
            fg = rng.random((48, 64)) > 0.55
            labels, n = nl.cc_label(fg)
            ref, n_ref = scipy.ndimage.label(fg)
            assert n == n_ref
            np.testing.assert_array_equal(labels, ref)

    def test_batch(self, rng):
        fg = rng.random((4, 32, 32)) > 0.5
        labels, counts = nl.cc_label_batch(fg, num_threads=2)
        for b in range(4):
            ref, n_ref = scipy.ndimage.label(fg[b])
            assert counts[b] == n_ref
            np.testing.assert_array_equal(labels[b], ref)


class TestNativeAugmentParity:
    """The C augment hot ops (native/fpcnn_native.cpp "Augmentation hot
    ops") mirror the numpy kernels' float32 evaluation order; parity must
    be BIT-exact so a (seed, epoch, sample) triple renders the same
    augmented sample whichever path serves it."""

    def _both(self, fn, seed, monkeypatch):
        import copy

        r1 = np.random.default_rng(seed)
        r2 = np.random.default_rng(seed)
        monkeypatch.setenv("FPCNN_NO_NATIVE_AUGMENT", "1")
        ref = fn(r1)
        monkeypatch.delenv("FPCNN_NO_NATIVE_AUGMENT")
        out = fn(r2)
        return ref, out

    @pytest.fixture
    def img(self, rng):
        # Non-tile-divisible dims exercise the CLAHE edge tiles.
        return rng.random((95, 121, 3)).astype(np.float32)

    def test_photometric_ops_bit_exact(self, rng, img, monkeypatch):
        from fastposecnn_tpu.data import augment as A

        cfg = A.AugmentConfig()
        for fn in (
            lambda r: A.hsv_jitter(img, r, cfg),
            lambda r: A.clahe(img, r, cfg),
            lambda r: A.box_blur(img),
            lambda r: A.motion_blur(img, r, cfg),
            lambda r: A.sharpen(img, r, cfg),
        ):
            ref, out = self._both(fn, 11, monkeypatch)
            np.testing.assert_array_equal(out, ref)

    def test_warps_bit_exact(self, rng, img, monkeypatch):
        from fastposecnn_tpu.data import augment as A

        cfg = A.AugmentConfig()
        H = A.sample_homography(*img.shape[:2], rng, cfg)
        mask = (rng.random(img.shape[:2]) * 7).astype(np.uint8)
        depth = rng.random(img.shape[:2]).astype(np.float32)
        for arr, order in ((img, 1), (mask, 0), (depth, 0)):
            ref, out = self._both(
                lambda r, a=arr, o=order: A.warp_image(a, H, o), 0,
                monkeypatch,
            )
            assert out.dtype == ref.dtype
            np.testing.assert_array_equal(out, ref)

    def test_full_sample_compose_bit_exact(self, rng, monkeypatch):
        from fastposecnn_tpu.data import augment as A
        from fastposecnn_tpu.data.synthetic import SceneConfig, generate_scene

        scene = generate_scene(
            np.random.default_rng(5),
            SceneConfig(height=96, width=128, max_instances=4,
                        render_pose_cues=True),
        )
        import copy

        cfg = A.AugmentConfig()

        def fn(r):
            s = copy.deepcopy(scene)
            return A.augment_sample(
                {
                    "image": s["image"],
                    "mask": (s["mask"] > 0).astype(np.uint8),
                    "agg": s["agg"],
                },
                r, cfg, intrinsics=scene["intrinsics"],
            )

        ref, out = self._both(fn, 3, monkeypatch)
        np.testing.assert_array_equal(out["image"], ref["image"])
        np.testing.assert_array_equal(out["mask"], ref["mask"])
        np.testing.assert_array_equal(
            out["agg"]["instance_masks"], ref["agg"]["instance_masks"]
        )
        np.testing.assert_array_equal(out["agg"]["xy"], ref["agg"]["xy"])


class TestNativePngEncode:
    def test_roundtrip_exact(self, rng, tmp_path):
        from PIL import Image

        rgb = (rng.random((24, 36, 3)) * 255).astype(np.uint8)
        gray = (rng.random((24, 36)) * 255).astype(np.uint8)
        d16 = (rng.random((24, 36)) * 65535).astype(np.uint16)
        for name, arr in (("rgb", rgb), ("gray", gray), ("d16", d16)):
            p = tmp_path / f"{name}.png"
            nl.encode_png(p, arr)
            back = np.asarray(Image.open(p))
            assert back.dtype == arr.dtype
            np.testing.assert_array_equal(back, arr)
            native_back = nl.decode_png(p).squeeze()
            np.testing.assert_array_equal(native_back, arr)

    def test_bad_dtype_rejected(self, tmp_path):
        with pytest.raises(ValueError):
            nl.encode_png(tmp_path / "x.png", np.zeros((4, 4), np.float32))

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

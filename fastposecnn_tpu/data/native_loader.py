"""ctypes bindings for the native runtime library (native/fpcnn_native.so).

Provides PNG decode (incl. fused decode+ImageNet-normalize) and union-find
CC labeling. Builds lazily via `make -C native` on first use when a
toolchain is present; all callers fall back to the pure-Python path when
the library is unavailable (`available()` is False).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "fpcnn_native.so"
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        return None

    lib.fpcnn_png_info.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_int)
    ] * 4
    lib.fpcnn_png_info.restype = ctypes.c_int
    lib.fpcnn_png_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.fpcnn_png_decode.restype = ctypes.c_int
    lib.fpcnn_decode_normalize.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.fpcnn_decode_normalize.restype = ctypes.c_int
    lib.fpcnn_png_encode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.fpcnn_png_encode.restype = ctypes.c_int
    lib.fpcnn_cc_label.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fpcnn_cc_label.restype = ctypes.c_int
    lib.fpcnn_cc_label_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    lib.fpcnn_cc_label_batch.restype = None
    _f32p = ctypes.POINTER(ctypes.c_float)
    _f64p = ctypes.POINTER(ctypes.c_double)
    lib.fpcnn_aug_hsv_jitter.argtypes = [
        _f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.fpcnn_aug_hsv_jitter.restype = None
    lib.fpcnn_aug_clahe.argtypes = [
        _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
    ]
    lib.fpcnn_aug_clahe.restype = None
    lib.fpcnn_aug_warp_bilinear.argtypes = [
        _f32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f64p,
    ]
    lib.fpcnn_aug_warp_bilinear.restype = None
    lib.fpcnn_aug_warp_nearest.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f64p,
    ]
    lib.fpcnn_aug_warp_nearest.restype = None
    lib.fpcnn_aug_conv3x3.argtypes = [
        _f32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p,
        ctypes.c_float,
    ]
    lib.fpcnn_aug_conv3x3.restype = None
    lib.fpcnn_aug_sharpen.argtypes = [
        _f32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double,
    ]
    lib.fpcnn_aug_sharpen.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def png_info(path) -> Tuple[int, int, int, int]:
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    rc = lib.fpcnn_png_info(str(path).encode(), w, h, c, bd)
    if rc:
        raise IOError(f"png_info({path}) failed rc={rc}")
    return h.value, w.value, c.value, bd.value


def decode_png(path) -> np.ndarray:
    """Decode to [H, W, C] uint8 or uint16."""
    lib = _load()
    h, w, c, bd = png_info(path)
    dtype = np.uint16 if bd == 16 else np.uint8
    out = np.empty((h, w, c) if c > 1 else (h, w), dtype)
    rc = lib.fpcnn_png_decode(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h, c, bd,
    )
    if rc:
        raise IOError(f"png_decode({path}) failed rc={rc}")
    return out


def encode_png(path, arr: np.ndarray, compress_level: int = 1) -> None:
    """Write [H, W] / [H, W, {3,4}] uint8 or [H, W] uint16 as PNG."""
    lib = _load()
    arr = np.ascontiguousarray(arr)
    if arr.dtype == np.uint8:
        bd = 8
    elif arr.dtype == np.uint16:
        bd = 16
    else:
        raise ValueError(f"encode_png: unsupported dtype {arr.dtype}")
    h, w = arr.shape[:2]
    c = 1 if arr.ndim == 2 else arr.shape[2]
    rc = lib.fpcnn_png_encode(
        str(path).encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h, c, bd, compress_level,
    )
    if rc:
        raise IOError(f"png_encode({path}) failed rc={rc}")


def decode_normalized(path, height: int, width: int) -> np.ndarray:
    """Fused decode + ImageNet normalization -> [H, W, 3] float32."""
    lib = _load()
    out = np.empty((height, width, 3), np.float32)
    rc = lib.fpcnn_decode_normalize(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        width, height,
    )
    if rc:
        raise IOError(f"decode_normalize({path}) failed rc={rc}")
    return out


def cc_label(fg: np.ndarray) -> Tuple[np.ndarray, int]:
    """scipy.ndimage.label-compatible 4-connectivity labeling, [H, W]."""
    lib = _load()
    fg8 = np.ascontiguousarray(fg.astype(np.uint8))
    h, w = fg8.shape
    labels = np.empty((h, w), np.int32)
    n = lib.fpcnn_cc_label(
        fg8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return labels, n


# -- augmentation hot ops (see native/fpcnn_native.cpp "Augmentation hot
# ops"; numpy-parity asserted by tests/test_native.py) ----------------------

_F32P = ctypes.POINTER(ctypes.c_float)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def aug_hsv_jitter(img: np.ndarray, dh: float, ds: float, dv: float):
    """Fused clip->rgb2hsv->jitter->hsv2rgb on [H, W, 3] float32; returns a
    new array (the input is not mutated)."""
    lib = _load()
    out = np.ascontiguousarray(img, np.float32).copy()
    h, w = out.shape[:2]
    lib.fpcnn_aug_hsv_jitter(out.ctypes.data_as(_F32P), h, w, dh, ds, dv)
    return out


def aug_clahe(img: np.ndarray, tiles: int, clip_limit: float):
    lib = _load()
    out = np.ascontiguousarray(img, np.float32).copy()
    h, w = out.shape[:2]
    lib.fpcnn_aug_clahe(out.ctypes.data_as(_F32P), h, w, tiles, clip_limit)
    return out


def aug_warp_bilinear(img: np.ndarray, H_inv: np.ndarray) -> np.ndarray:
    """Inverse-map bilinear warp of [H, W(, C)] float32, zero fill."""
    lib = _load()
    squeeze = img.ndim == 2
    src = np.ascontiguousarray(
        img[..., None] if squeeze else img, np.float32
    )
    h, w, c = src.shape
    dst = np.empty_like(src)
    Hi = np.ascontiguousarray(H_inv, np.float64)
    lib.fpcnn_aug_warp_bilinear(
        src.ctypes.data_as(_F32P), dst.ctypes.data_as(_F32P), h, w, c,
        Hi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return dst[..., 0] if squeeze else dst


def aug_warp_nearest(img: np.ndarray, H_inv: np.ndarray) -> np.ndarray:
    """Nearest (np.round half-even) warp, zero fill, any element dtype."""
    lib = _load()
    squeeze = img.ndim == 2
    src = np.ascontiguousarray(img[..., None] if squeeze else img)
    h, w, c = src.shape
    dst = np.empty_like(src)
    Hi = np.ascontiguousarray(H_inv, np.float64)
    lib.fpcnn_aug_warp_nearest(
        src.ctypes.data_as(_U8P), dst.ctypes.data_as(_U8P), h, w, c,
        src.dtype.itemsize,
        Hi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return dst[..., 0] if squeeze else dst


def aug_conv3x3(img: np.ndarray, kern: np.ndarray, scale: float = 1.0):
    """3x3 conv with edge padding on [H, W(, C)] float32."""
    lib = _load()
    squeeze = img.ndim == 2
    src = np.ascontiguousarray(
        img[..., None] if squeeze else img, np.float32
    )
    h, w, c = src.shape
    dst = np.empty_like(src)
    k = np.ascontiguousarray(kern, np.float32)
    lib.fpcnn_aug_conv3x3(
        src.ctypes.data_as(_F32P), dst.ctypes.data_as(_F32P), h, w, c,
        k.ctypes.data_as(_F32P), scale,
    )
    return dst[..., 0] if squeeze else dst


def aug_sharpen(img: np.ndarray, alpha: float, lightness: float):
    """Fused unsharp mask: img*(1-alpha) + clip(img + img*lightness -
    box_blur3(img), 0, 1)*alpha."""
    lib = _load()
    src = np.ascontiguousarray(img, np.float32)
    h, w = src.shape[:2]
    c = 1 if src.ndim == 2 else src.shape[2]
    dst = np.empty_like(src)
    lib.fpcnn_aug_sharpen(
        src.ctypes.data_as(_F32P), dst.ctypes.data_as(_F32P), h, w, c,
        alpha, lightness,
    )
    return dst


def cc_label_batch(fg: np.ndarray, num_threads: int = 4):
    """Batched labeling [B, H, W] -> (labels [B, H, W], counts [B])."""
    lib = _load()
    fg8 = np.ascontiguousarray(fg.astype(np.uint8))
    b, h, w = fg8.shape
    labels = np.empty((b, h, w), np.int32)
    counts = np.empty((b,), np.int32)
    lib.fpcnn_cc_label_batch(
        fg8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b, h, w,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads,
    )
    return labels, counts

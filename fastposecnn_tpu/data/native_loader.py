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

"""Data augmentation pipelines.

Parity: FPC/tools/transforms/pose_regression.py:33-77 — pose training uses
*photometric-only* augmentation (no geometric warps, which would invalidate
the stored RT ground truth): gaussian noise, perspective is listed but the
reference's pose pipeline actually applies IAAPerspective only through the
commented path; the active list is noise / CLAHE-ish contrast / brightness /
gamma / sharpen / blur / contrast / HSV. Validation = gaussian noise only
(transforms/pose_regression.py:73-77). The segmentation variant
(transforms/segmentation.py:21-74) adds horizontal flips and crops, which
are safe when only the mask is supervised.

Implemented in numpy on the host (these run inside loader workers), seeded
per sample; every op is cheap and vectorized. albumentations is not in this
image.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class AugmentConfig:
    noise_std: float = 0.02
    brightness: float = 0.2
    contrast: float = 0.2
    gamma: tuple = (0.8, 1.2)
    hue: float = 0.02
    saturation: float = 0.2
    blur_prob: float = 0.2
    sharpen_prob: float = 0.2
    p: float = 0.9  # overall per-op application probability scale


def _rgb_to_hsv(img):
    maxc = img.max(-1)
    minc = img.min(-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-8), 0.0)
    rc = (maxc - img[..., 0]) / np.maximum(delta, 1e-8)
    gc = (maxc - img[..., 1]) / np.maximum(delta, 1e-8)
    bc = (maxc - img[..., 2]) / np.maximum(delta, 1e-8)
    h = np.where(
        img[..., 0] == maxc,
        bc - gc,
        np.where(img[..., 1] == maxc, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = (h / 6.0) % 1.0
    h = np.where(delta == 0, 0.0, h)
    return np.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = np.floor(h * 6.0).astype(int) % 6
    f = h * 6.0 - np.floor(h * 6.0)
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    out = np.zeros(hsv.shape, hsv.dtype)
    for idx, (rr, gg, bb) in enumerate(
        [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]
    ):
        m = i == idx
        out[..., 0] = np.where(m, rr, out[..., 0])
        out[..., 1] = np.where(m, gg, out[..., 1])
        out[..., 2] = np.where(m, bb, out[..., 2])
    return out


def _box_blur(img, k=3):
    pad = k // 2
    padded = np.pad(img, [(pad, pad), (pad, pad), (0, 0)], mode="edge")
    out = np.zeros_like(img)
    for dy in range(k):
        for dx in range(k):
            out += padded[dy : dy + img.shape[0], dx : dx + img.shape[1]]
    return out / (k * k)


def augment_pose_training(
    image: np.ndarray, rng: np.random.Generator, cfg: AugmentConfig = None
) -> np.ndarray:
    """Photometric augmentation for pose training. `image` float [0,1] HWC."""
    cfg = cfg or AugmentConfig()
    img = image.astype(np.float32)

    if rng.random() < cfg.p:  # brightness/contrast
        img = img * (1 + rng.uniform(-cfg.contrast, cfg.contrast))
        img = img + rng.uniform(-cfg.brightness, cfg.brightness)
    if rng.random() < cfg.p:  # gamma
        img = np.clip(img, 0, 1) ** rng.uniform(*cfg.gamma)
    if rng.random() < cfg.p * 0.5:  # HSV jitter
        hsv = _rgb_to_hsv(np.clip(img, 0, 1))
        hsv[..., 0] = (hsv[..., 0] + rng.uniform(-cfg.hue, cfg.hue)) % 1.0
        hsv[..., 1] = np.clip(
            hsv[..., 1] * (1 + rng.uniform(-cfg.saturation, cfg.saturation)),
            0, 1,
        )
        img = _hsv_to_rgb(hsv)
    if rng.random() < cfg.blur_prob:
        img = _box_blur(img)
    elif rng.random() < cfg.sharpen_prob:
        img = np.clip(img + (img - _box_blur(img)) * 0.7, 0, 1)
    img = img + rng.normal(0, cfg.noise_std, img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


def augment_validation(
    image: np.ndarray, rng: np.random.Generator, noise_std: float = 0.01
) -> np.ndarray:
    """Validation augmentation = gaussian noise only
    (transforms/pose_regression.py:73-77)."""
    return np.clip(
        image + rng.normal(0, noise_std, image.shape).astype(np.float32), 0, 1
    )


def augment_segmentation(
    image: np.ndarray,
    mask: np.ndarray,
    rng: np.random.Generator,
    cfg: AugmentConfig = None,
):
    """Segmentation-only training may flip geometrically
    (transforms/segmentation.py:21-74) — mask transforms with the image."""
    img = augment_pose_training(image, rng, cfg)
    if rng.random() < 0.5:
        img = img[:, ::-1].copy()
        mask = mask[:, ::-1].copy()
    return img, mask

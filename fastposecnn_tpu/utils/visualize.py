"""Visualization figure builders (matplotlib / cv2).

Parity: FPC/tools/visualize.py families:
  - colorized dense maps (mask / quaternion / scales / z / xy,
    visualize.py:50-292);
  - hough-voting overlay (hypothesis + winner dots, visualize.py:296-399);
  - summary grid figure (visualize.py:404-458);
  - GT-vs-pred pose comparison (compare_pose_performance_v5,
    visualize.py:985-1040);
  - AP curve plots (plot_aps, visualize.py:1231-1267).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from fastposecnn_tpu.constants import colormap
from fastposecnn_tpu.utils import draw


def denormalize_image(image: np.ndarray) -> np.ndarray:
    """Undo ImageNet normalization to [0,1] for display."""
    mean = np.asarray([0.485, 0.456, 0.406])
    std = np.asarray([0.229, 0.224, 0.225])
    img = image * std + mean
    return np.clip(img, 0, 1)


def colorize_mask(mask: np.ndarray, num_classes: int) -> np.ndarray:
    cmap = colormap(num_classes)
    return cmap[np.clip(mask, 0, num_classes - 1)]


def colorize_dense(data: np.ndarray) -> np.ndarray:
    """Map a [H,W] or [H,W,C] dense field to a [0,1] RGB image."""
    if data.ndim == 2:
        data = data[..., None]
    c = data.shape[-1]
    lo, hi = np.nanmin(data), np.nanmax(data)
    norm = (data - lo) / max(hi - lo, 1e-8)
    if c == 1:
        return plt.get_cmap("viridis")(norm[..., 0])[..., :3]
    if c == 2:
        return np.concatenate([norm, 0.5 * np.ones_like(norm[..., :1])], -1)
    return norm[..., :3]


def make_summary_figure(**images) -> plt.Figure:
    """Side-by-side grid (FPC/tools/visualize.py:404-458)."""
    n = len(images)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    if n == 1:
        axes = [axes]
    for ax, (name, img) in zip(axes, images.items()):
        ax.imshow(np.asarray(img))
        ax.set_title(name)
        ax.axis("off")
    fig.tight_layout()
    return fig


def visualize_hypothesis(
    image: np.ndarray,
    centers: np.ndarray,  # [N, 2] voted centers (x, y)
    valid: np.ndarray,
    gt_centers: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Winner (and GT) center dots over the image
    (FPC/tools/visualize.py:296-399 reduced to the data our pipeline keeps)."""
    img = (np.asarray(image) * 255).astype(np.uint8).copy()
    import cv2

    for i in range(centers.shape[0]):
        if not valid[i]:
            continue
        cv2.circle(img, (int(centers[i, 0]), int(centers[i, 1])), 4, (255, 0, 0), -1)
        if gt_centers is not None:
            cv2.circle(
                img, (int(gt_centers[i, 0]), int(gt_centers[i, 1])), 4,
                (0, 255, 0), 1,
            )
    return img.astype(np.float32) / 255.0


def compare_pose_performance(
    image: np.ndarray,
    gt_RTs: np.ndarray,
    gt_scales: np.ndarray,
    pred_RTs: np.ndarray,
    pred_scales: np.ndarray,
    valid: np.ndarray,
    intrinsics: np.ndarray,
) -> np.ndarray:
    """GT (green) vs pred (red) boxes+axes on one image
    (compare_pose_performance_v5, FPC/tools/visualize.py:985-1040)."""
    img = (np.asarray(image) * 255).astype(np.uint8)
    for i in range(gt_RTs.shape[0]):
        if not valid[i]:
            continue
        img = draw.draw_RT(img, gt_RTs[i], gt_scales[i], intrinsics, (0, 255, 0))
        img = draw.draw_RT(img, pred_RTs[i], pred_scales[i], intrinsics, (255, 0, 0))
    return img.astype(np.float32) / 255.0


def plot_aps(
    aps: Dict[str, Dict[str, np.ndarray]],
    thresholds: Dict[str, np.ndarray],
    titles: Dict[str, str],
    x_labels: Dict[str, str],
    cls_names: Sequence[str],
) -> plt.Figure:
    """AP-vs-threshold curves, one subplot per metric
    (FPC/tools/visualize.py:1231-1267)."""
    keys = list(aps.keys())
    fig, axes = plt.subplots(1, len(keys), figsize=(5 * len(keys), 4))
    if len(keys) == 1:
        axes = [axes]
    for ax, key in zip(axes, keys):
        xs = np.asarray(thresholds[key])
        for name in cls_names:
            if name in aps[key]:
                ax.plot(xs, 100 * np.asarray(aps[key][name]), label=name)
        ax.set_title(titles.get(key, key))
        ax.set_xlabel(x_labels.get(key, ""))
        ax.set_ylabel("AP %")
        ax.set_ylim(0, 100)
        ax.grid(alpha=0.3)
    axes[-1].legend(fontsize=8)
    fig.tight_layout()
    return fig


def figure_to_array(fig: plt.Figure) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf

"""Synthetic NOCS-like scenes with exact ground truth.

Two uses:
  1. integration tests: build *perfect* network logits from GT and check the
     whole pipeline (class compress -> CC -> aggregation -> voting -> RT ->
     matching -> losses/metrics) recovers the scene;
  2. benchmarking and the synthetic dataset-on-disk fixture
     (data/nocs_writer.py) when the real NOCS data is unavailable.

GT layout mirrors the reference's per-instance agg_data
(FPC/tools/dataset.py:373-434): class_ids, symmetric_ids, instance_masks,
quaternion (xyzw), scales, xy (x, y pixel center), z (mm), T, R, RT — but
padded to MAX_INSTANCES with a validity mask instead of ragged arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from fastposecnn_tpu import constants




@dataclasses.dataclass
class SceneConfig:
    height: int = 120
    width: int = 160
    num_classes: int = 7  # incl. background
    max_instances: int = 8
    min_instances: int = 1
    max_scene_instances: int = 3
    z_range: tuple = (600.0, 2500.0)
    scale_range: tuple = (0.08, 0.4)
    box_half_extent: tuple = (8, 26)
    dataset: str = "CAMERA"
    # Pose-informative rendering: when True, an instance's pixel extent is
    # derived from its physical scales and depth (so z and scales are
    # observable) and its fill color is Lambert-shaded by the rotated
    # object normal (so the quaternion is observable up to the shading
    # symmetry). Default False keeps the legacy flat render that the
    # pipeline-mechanics tests were tuned on.
    render_pose_cues: bool = False


def _quat_random(rng) -> np.ndarray:
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def generate_scene(rng: np.random.Generator, cfg: SceneConfig) -> Dict[str, np.ndarray]:
    """Generate one scene. Returns dense GT + padded instance GT."""
    h, w = cfg.height, cfg.width
    intr = constants.INTRINSICS[cfg.dataset].copy()
    # Rescale intrinsics from the native 640x480 to the scene size.
    intr[0] *= w / constants.IMAGE_WIDTH
    intr[1] *= h / constants.IMAGE_HEIGHT

    g = cfg.max_instances
    mask = np.zeros((h, w), np.int32)
    inst_masks = np.zeros((g, h, w), np.float32)
    class_ids = np.zeros((g,), np.int32)
    sym_ids = np.zeros((g,), np.int32)
    quats = np.zeros((g, 4), np.float32)
    scales = np.zeros((g, 3), np.float32)
    xys = np.zeros((g, 2), np.float32)
    zs = np.zeros((g,), np.float32)
    valid = np.zeros((g,), bool)

    sym_class_set = set(
        constants.dataset_spec(cfg.dataset).symmetric_class_ids()
    )

    n_inst = int(rng.integers(cfg.min_instances, cfg.max_scene_instances + 1))
    occupied = np.zeros((h, w), bool)
    placed = 0
    fx, fy = intr[0, 0], intr[1, 1]
    for _ in range(n_inst * 4):
        if placed >= n_inst:
            break
        inst_scales = rng.uniform(*cfg.scale_range, 3)
        inst_z = float(rng.uniform(*cfg.z_range))
        if cfg.render_pose_cues:
            # pixel half-extent = projected physical half-extent (m -> px):
            # scales are edge lengths in meters, z in mm.
            half_w = int(np.clip(inst_scales[0] / 2 * fx / (inst_z / 1000),
                                 3, w // 3))
            half_h = int(np.clip(inst_scales[1] / 2 * fy / (inst_z / 1000),
                                 3, h // 3))
            hw_half = np.asarray([half_h, half_w])
        else:
            hw_half = rng.integers(
                cfg.box_half_extent[0], cfg.box_half_extent[1], 2
            )
        if hw_half[0] + 2 >= h // 2 or hw_half[1] + 2 >= w // 2:
            continue
        cy = int(rng.integers(hw_half[0] + 1, h - hw_half[0] - 1))
        cx = int(rng.integers(hw_half[1] + 1, w - hw_half[1] - 1))
        y0, y1 = cy - hw_half[0], cy + hw_half[0]
        x0, x1 = cx - hw_half[1], cx + hw_half[1]
        region = np.zeros((h, w), bool)
        region[y0:y1, x0:x1] = True
        if (region & occupied).any():
            continue
        occupied |= region
        cls = int(rng.integers(1, cfg.num_classes))
        k = placed
        mask[region] = cls
        inst_masks[k][region] = 1.0
        class_ids[k] = cls
        sym_ids[k] = 1 if cls in sym_class_set else 0
        quats[k] = _quat_random(rng)
        scales[k] = inst_scales
        xys[k] = (cx, cy)
        zs[k] = inst_z
        valid[k] = True
        placed += 1

    # Derive T / R / RT from (quat, xy, z) in host numpy. (This used to call
    # the jnp geometry code eagerly; on a remote-TPU backend every eager op
    # is a ~0.4 s AOT round trip, turning synthetic data generation into
    # seconds per scene. scipy's quaternion->R matches geometry.quat_to_rotmat
    # exactly — tests/test_geometry.py::TestQuatRotmat.)
    import scipy.spatial.transform as _sst

    inv_intr = np.linalg.inv(intr)
    z_m = zs[:, None] / 1000.0
    T = np.concatenate([xys * z_m, z_m], axis=-1) @ inv_intr.T
    q_safe = np.where(valid[:, None], quats, np.asarray([0.0, 0.0, 0.0, 1.0]))
    R = _sst.Rotation.from_quat(q_safe).as_matrix()
    RT = np.zeros((g, 4, 4))
    RT[:, :3, :3] = R
    RT[:, :3, 3] = -np.einsum("kij,kj->ki", R, T)
    RT[:, 3, 3] = 1.0
    R[~valid] = 0
    T[~valid] = 0
    RT[~valid] = 0

    # Simple render: class-colored boxes + noise. With render_pose_cues the
    # fill is Lambert-shaded by the rotated object +z normal (rotation
    # observable) and a second tint channel carries the rotated +x axis.
    image = rng.normal(0.0, 0.05, size=(h, w, 3)).astype(np.float32)
    for k in range(g):
        if valid[k]:
            color = np.asarray(
                [0.2 + 0.1 * class_ids[k], 0.9 - 0.1 * class_ids[k], 0.4]
            )
            if cfg.render_pose_cues:
                n_z = R[k] @ np.asarray([0.0, 0.0, 1.0])
                n_x = R[k] @ np.asarray([1.0, 0.0, 0.0])
                shade = 0.55 + 0.45 * n_z[2]
                color = color * shade + 0.25 * np.asarray(
                    [n_x[0], n_x[1], n_x[2]]
                )
            image[inst_masks[k] > 0] += color

    return {
        "image": image,
        "mask": mask,
        "intrinsics": intr,
        "agg": {
            "class_ids": class_ids,
            "symmetric_ids": sym_ids,
            "instance_masks": inst_masks,
            "quaternion": quats.astype(np.float32),
            "scales": scales.astype(np.float32),
            "xy": xys.astype(np.float32),
            "z": zs.astype(np.float32),  # [G] scalar depth in mm
            "T": T.astype(np.float32),
            "R": R.astype(np.float32),
            "RT": RT.astype(np.float32),
            "valid": valid,
        },
    }


def make_batch(
    rng: np.random.Generator, cfg: SceneConfig, batch_size: int
) -> Dict[str, np.ndarray]:
    """Stack `batch_size` scenes into the training batch layout:
    image [B,H,W,3], mask [B,H,W], agg {k: [B,G,...]}."""
    scenes = [generate_scene(rng, cfg) for _ in range(batch_size)]
    batch = {
        "image": np.stack([s["image"] for s in scenes]),
        # Compact wire dtypes: dense masks ship uint8 and are upcast
        # in-graph (train/task.py upcast_batch) — the f32 GT instance-mask
        # stack alone was 78 MB/step at 480p/batch-4, dominating host->device
        # transfer through slow links.
        "mask": np.stack([s["mask"] for s in scenes]).astype(np.uint8),
        "agg": {
            k: np.stack([s["agg"][k] for s in scenes])
            for k in scenes[0]["agg"]
        },
    }
    batch["agg"]["instance_masks"] = batch["agg"]["instance_masks"].astype(
        np.uint8
    )
    return batch


def perfect_logits(scene: Dict[str, np.ndarray], num_classes: int) -> Dict[str, np.ndarray]:
    """Build idealized network outputs from GT (for pipeline tests).

    mask: +-10 logits of the GT class; quaternion/scales/z: GT value painted
    into the GT class's channel group; xy: exact unit vectors toward each
    instance's center.
    """
    mask = scene["mask"]
    agg = scene["agg"]
    h, w = mask.shape
    cm1 = num_classes - 1

    mask_logits = np.full((h, w, num_classes), -10.0, np.float32)
    for c in range(num_classes):
        mask_logits[..., c][mask == c] = 10.0

    quat = np.zeros((h, w, cm1, 4), np.float32)
    xy = np.zeros((h, w, cm1, 2), np.float32)
    z = np.zeros((h, w, cm1), np.float32)
    scales = np.zeros((h, w, cm1, 3), np.float32)

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    for k in range(agg["valid"].shape[0]):
        if not agg["valid"][k]:
            continue
        m = agg["instance_masks"][k] > 0
        c = int(agg["class_ids"][k]) - 1
        quat[m, c, :] = agg["quaternion"][k]
        scales[m, c, :] = agg["scales"][k]
        z[m, c] = np.log(agg["z"][k])
        dx = agg["xy"][k, 0] - xs
        dy = agg["xy"][k, 1] - ys
        norm = np.sqrt(dx * dx + dy * dy)
        norm[norm == 0] = 1.0
        xy[m, c, 0] = (dx / norm)[m]
        xy[m, c, 1] = (dy / norm)[m]

    # Flatten to the model's class-major flat channel layout
    # (models/pose_regressor.py layout note).
    return {
        "mask": mask_logits[None],
        "quaternion": quat.reshape(h, w, cm1 * 4)[None],
        "xy": xy.reshape(h, w, cm1 * 2)[None],
        "z": z[None],
        "scales": scales.reshape(h, w, cm1 * 3)[None],
    }

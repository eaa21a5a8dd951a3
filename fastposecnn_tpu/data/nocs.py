"""NOCS-format dataset reader with padded, static-shape batches.

Parity: FPC/tools/dataset.py:98-529 (`NOCSDataset`, `my_collate_fn`):
  - scans a directory tree for `*_color.png` samples with non-empty
    instance dicts (dataset.py:277-357);
  - per sample: color / mask / depth / `*_meta+.json`; distractor objects
    (mask ids absent from instance_dict) are dropped; classes outside
    `selected_classes` are dropped (dataset.py:183-210);
  - per-instance GT (agg_data): class id, symmetric flag, instance mask,
    quaternion, scales / norm_factor, projected-center xy, depth z,
    T / R / RT derived from the stored RTs (dataset.py:373-434 +
    data_manipulation.py:962-1003);
  - invalid samples (z <= 0) are rejected (dataset.py:216-218).

TPU-first deltas:
  - instances are padded to `max_instances` with a validity mask instead of
    ragged concatenation; a batch is {'image' [B,H,W,3], 'mask' [B,H,W],
    'agg' {k: [B,G,...]}} — exactly what the jitted train step consumes;
  - images come out NHWC uint8 and are ImageNet-normalized ON DEVICE
    (train/task.py:upcast_batch) — same math as the reference's
    smp.get_preprocessing_fn('resnet18','imagenet') (dataset.py:592-596)
    at a quarter of the host->device bytes. `normalize=False` returns
    un-normalized f32 in [0, 1].
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from fastposecnn_tpu import constants



IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def standardize_depth(depth: np.ndarray) -> np.ndarray:
    """16-bit NOCS depth handling (FPC/tools/data_manipulation.py:153-163):
    3-channel encoded depth becomes high*256+low; plain 16-bit passes."""
    if depth.ndim == 3 and depth.shape[2] >= 2:
        return (
            depth[:, :, 1].astype(np.uint16) * 256
            + depth[:, :, 2].astype(np.uint16)
        ).astype(np.uint16)
    return depth.astype(np.uint16)


def extract_instance_gt(
    RTs: np.ndarray, intrinsics: np.ndarray
) -> Dict[str, np.ndarray]:
    """Per-instance xy/z/R/T from stored RTs.

    Parity: FPC/tools/data_manipulation.py:962-1003
    (`extract_xyz_R_T_from_RTs`): xy = int-quantized projection of the
    object origin; z = inv(RT)[2,3] * 1000; T = back-projection of that
    quantized origin; R = RT[:3,:3].
    """
    n = RTs.shape[0]
    xy = np.zeros((n, 2), np.float32)
    z = np.zeros((n,), np.float32)
    R = np.zeros((n, 3, 3), np.float32)
    T = np.zeros((n, 3), np.float32)
    inv_K = np.linalg.inv(intrinsics)
    for i in range(n):
        inv_RT = np.linalg.inv(RTs[i])
        origin_cam = inv_RT[:3, 3]  # object origin in the viewing frame
        proj = intrinsics @ origin_cam
        # Reference quantizes projections to int32 (data_manipulation.py:926).
        xy[i] = (proj[:2] / proj[2]).astype(np.int32)
        z[i] = inv_RT[2, 3] * 1000.0
        z_m = z[i] / 1000.0
        T[i] = inv_K @ np.array([xy[i, 0] * z_m, xy[i, 1] * z_m, z_m])
        R[i] = RTs[i][:3, :3]
    return {"xy": xy, "z": z, "R": R, "T": T}


class NOCSDataset:
    """Directory-backed NOCS dataset (CAMERA or REAL layout)."""

    def __init__(
        self,
        dataset_dir,
        dataset_name: str = "CAMERA",
        selected_classes: Optional[Sequence[str]] = None,
        max_size: Optional[int] = None,
        max_instances: int = 16,
        image_size: Optional[tuple] = None,  # (H, W) crop/pad target
        normalize: bool = True,
        use_native: Optional[bool] = None,  # None -> auto-detect
        augmentation: Optional[str] = None,  # None | 'train' | 'valid'
        aug_seed: int = 0,
        aug_cfg=None,  # data.augment.AugmentConfig override
    ):
        self.dataset_dir = pathlib.Path(dataset_dir)
        self.dataset_name = dataset_name
        self.spec = constants.dataset_spec(dataset_name, selected_classes)
        self.all_classes = list(constants.CLASSES[dataset_name])
        self.classes = list(self.spec.classes)
        # raw class id (position in the full class list) -> selected index
        self.class_values_map = {
            self.all_classes.index(c): self.classes.index(c)
            for c in self.classes
        }
        self.symmetric_ids = set(self.spec.symmetric_class_ids())
        self.max_instances = max_instances
        self.image_size = image_size
        self.normalize = normalize
        self.intrinsics = self.spec.intrinsics
        if use_native is None:
            from fastposecnn_tpu.data import native_loader

            use_native = native_loader.available()
        self.use_native = use_native
        # Augmentation is applied inside __getitem__ pre-normalization,
        # selected per split at dataset build — exactly the reference recipe
        # (FPC/tools/dataset.py:242-245, 578-587). `epoch` is advanced by
        # PrefetchLoader so draws differ across epochs but stay reproducible.
        if augmentation not in (None, "train", "valid"):
            raise ValueError(f"unknown augmentation mode {augmentation!r}")
        self.augmentation = augmentation
        self.aug_seed = aug_seed
        self.aug_cfg = aug_cfg
        self.epoch = 0
        self.max_size = max_size
        self.images_fps = self._scan(self.dataset_dir, max_size)

    def repoint(self, dataset_dir) -> None:
        """Point the dataset at a different directory tree (same NOCS
        format) and rescan the file list. Used by the train CLI's rotating
        synthetic bank pool to swap fresh scene banks between staged
        epochs without rebuilding the dataset object."""
        self.dataset_dir = pathlib.Path(dataset_dir)
        self.images_fps = self._scan(self.dataset_dir, self.max_size)

    def _read_image(self, fp, index: int = 0) -> np.ndarray:
        """Decode and augment (pre-normalization, FPC dataset.py:242-257)
        the color image, using the native libpng path when built
        (native/fpcnn_native.cpp).

        With `normalize=True` (the default) the image is returned as RAW
        uint8 and ImageNet normalization happens ON DEVICE
        (train/task.py:upcast_batch) — the f32 image was 29.5 MB per
        batch-8 step of host->device traffic vs 7.4 MB as uint8, and the
        subtract/divide is free inside the XLA program. `normalize=False`
        returns un-normalized f32 in [0, 1] (legacy)."""
        if self.use_native:
            from fastposecnn_tpu.data import native_loader as nl

            raw = nl.decode_png(fp)
            if raw.ndim == 2:
                raw = np.repeat(raw[..., None], 3, axis=-1)
            raw = raw[..., :3]
        else:
            raw = np.asarray(Image.open(fp).convert("RGB"))
        # Augmentation happens at SAMPLE level in __getitem__ (the train
        # compose includes a geometric perspective warp that must move the
        # masks/depth/GT centers with the image — data/augment.py).
        if self.normalize:
            return raw.astype(np.uint8)
        return raw.astype(np.float32) / 255.0

    # -- scanning -------------------------------------------------------
    def _scan(self, root: pathlib.Path, max_size) -> List[pathlib.Path]:
        found: List[pathlib.Path] = []
        stack = [root]
        while stack:
            d = stack.pop(0)
            if not d.exists():
                continue
            for child in sorted(d.iterdir()):
                if child.is_dir():
                    stack.append(child)
                elif child.name.endswith("_color.png"):
                    if self._has_instances(child):
                        found.append(child)
            if max_size is not None and len(found) >= max_size:
                break
        return found[:max_size] if max_size is not None else found

    def _meta_path(self, color_fp: pathlib.Path) -> pathlib.Path:
        return pathlib.Path(str(color_fp).replace("_color.png", "_meta+.json"))

    def _has_instances(self, color_fp) -> bool:
        meta_fp = self._meta_path(color_fp)
        if not meta_fp.exists():
            return False
        meta = json.loads(meta_fp.read_text())
        return any(
            int(cls) in self.class_values_map
            for cls in meta.get("instance_dict", {}).values()
        )

    def __len__(self):
        return len(self.images_fps)

    # -- sample loading ---------------------------------------------------
    def __getitem__(self, i: int) -> Optional[Dict[str, np.ndarray]]:
        fp = self.images_fps[i]
        image = self._read_image(fp, index=i)

        mask_fp = str(fp).replace("_color.png", "_mask.png")
        mask_raw = np.asarray(Image.open(mask_fp))
        if self.dataset_name == "CAMERA" and mask_raw.ndim == 3:
            mask_raw = mask_raw[:, :, 0]
        mask_raw = mask_raw.astype(np.int64)
        mask_raw[mask_raw == 255] = 0  # background (dataset.py:170-171)

        depth_fp = pathlib.Path(str(fp).replace("_color.png", "_depth.png"))
        depth = (
            standardize_depth(np.asarray(Image.open(depth_fp)))
            if depth_fp.exists()
            else np.zeros(mask_raw.shape, np.uint16)
        )

        meta = json.loads(self._meta_path(fp).read_text())

        # Keep only non-distractor, selected-class instances.
        kept = []  # (instance_id, mapped_class, row index into meta arrays)
        for row, (iid, cls) in enumerate(meta["instance_dict"].items()):
            if int(cls) in self.class_values_map:
                kept.append((int(iid), self.class_values_map[int(cls)], row))

        g = self.max_instances
        h, w = mask_raw.shape
        agg = {
            "class_ids": np.zeros((g,), np.int32),
            "symmetric_ids": np.zeros((g,), np.int32),
            "instance_masks": np.zeros((g, h, w), np.uint8),
            "quaternion": np.zeros((g, 4), np.float32),
            "scales": np.zeros((g, 3), np.float32),
            "xy": np.zeros((g, 2), np.float32),
            "z": np.zeros((g,), np.float32),
            "T": np.zeros((g, 3), np.float32),
            "R": np.zeros((g, 3, 3), np.float32),
            "RT": np.zeros((g, 4, 4), np.float32),
            "valid": np.zeros((g,), bool),
        }

        RTs = np.asarray(meta["RTs"], np.float64)
        quats = np.asarray(meta["quaternions"], np.float32)
        scales = np.asarray(meta["scales"], np.float32)
        norm_factors = np.asarray(meta["norm_factors"], np.float32)
        # Intrinsics in the SAME pixel frame as this sample's images: the
        # projected-center GT (and with it the dense vote-field targets and
        # downstream RT unprojection) must live at the loaded resolution,
        # not the native 640x480 (constants.scaled_intrinsics; identity for
        # full-res real NOCS).
        K = constants.scaled_intrinsics(self.dataset_name, h, w)
        derived = extract_instance_gt(RTs, K)

        class_mask = np.zeros((h, w), np.int32)
        for k, (iid, cls, row) in enumerate(kept[:g]):
            region = mask_raw == iid
            class_mask[region] = cls
            agg["class_ids"][k] = cls
            agg["symmetric_ids"][k] = 1 if cls in self.symmetric_ids else 0
            agg["instance_masks"][k] = region
            agg["quaternion"][k] = quats[row]
            # Scales are divided by the normalizing factor (dataset.py:429).
            agg["scales"][k] = scales[row] / norm_factors[row]
            # GT xy is stored flipped then re-flipped to (x, y)
            # (dataset.py:432 + data_manipulation.py:977).
            agg["xy"][k] = derived["xy"][row]
            agg["z"][k] = derived["z"][row]
            agg["T"][k] = derived["T"][row]
            agg["R"][k] = derived["R"][row]
            agg["RT"][k] = RTs[row]
            agg["valid"][k] = True

        # Reject corrupt samples (z <= 0), dataset.py:216-218.
        if (agg["z"][agg["valid"]] <= 0).any():
            return None

        sample = {
            "path": str(fp),
            "image": image,
            "mask": class_mask.astype(np.uint8),
            "depth": depth.astype(np.float32),
            "agg": agg,
        }

        if self.augmentation:
            from fastposecnn_tpu.data import augment as A

            # Reproducible per (seed, epoch, sample): differs across epochs,
            # stable within one (thread-safe — no shared rng state).
            aug_rng = np.random.default_rng((self.aug_seed, self.epoch, i))
            if self.augmentation == "train":
                # Full as-designed compose (perspective + photometric) with
                # consistent GT warping; see data/augment.py's parity note.
                sample = A.augment_sample(
                    sample, aug_rng, self.aug_cfg, intrinsics=K
                )
            else:
                img = sample["image"].astype(np.float32)
                if sample["image"].dtype == np.uint8:
                    img = img / 255.0
                sample["image"] = A.augment_validation(
                    img, aug_rng, self.aug_cfg
                )
            if self.normalize:
                # back to the uint8 wire; rint so requantization is
                # unbiased (truncation would shift every channel ~0.5/255
                # down), quantization error < 0.5/255 per channel
                sample["image"] = np.clip(
                    np.rint(sample["image"] * 255.0), 0, 255
                ).astype(np.uint8)

        return sample


    def get_random_batched_sample(self, batch_size: int = 1, seed: int = 0):
        """Random collated batch (FPC/tools/dataset.py:359-371)."""
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(self), size=batch_size, replace=False)
        return collate([self[int(i)] for i in idx])


class CAMERADataset(NOCSDataset):
    def __init__(self, dataset_dir, **kw):
        super().__init__(dataset_dir, dataset_name="CAMERA", **kw)


class REALDataset(NOCSDataset):
    def __init__(self, dataset_dir, **kw):
        super().__init__(dataset_dir, dataset_name="REAL", **kw)


def collate(samples: Sequence[Optional[dict]]) -> Optional[Dict]:
    """Stack samples; drop Nones; None batch if everything was rejected
    (my_collate_fn semantics, dataset.py:453-529, but fixed-shape)."""
    samples = [s for s in samples if s is not None]
    if not samples:
        return None
    batch = {
        "image": np.stack([s["image"] for s in samples]),
        "mask": np.stack([s["mask"] for s in samples]),
        "agg": {
            k: np.stack([s["agg"][k] for s in samples])
            for k in samples[0]["agg"]
        },
    }
    batch["path"] = [s["path"] for s in samples]
    return batch

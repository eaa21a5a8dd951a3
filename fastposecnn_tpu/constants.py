"""Dataset constants for the NOCS CAMERA/REAL datasets.

Parity: FPC/tools/project.py:47-137 (intrinsics, class lists, symmetric
classes, colormap). Values are data facts about the public NOCS dataset, not
code: CAMERA intrinsics fx=fy=577.5 cx=319.5 cy=239.5; REAL intrinsics
fx=591.0125 fy=590.16775 cx=322.525 cy=244.11084.
"""

from __future__ import annotations

import dataclasses

import numpy as np

CAMERA_CLASSES = ("bg", "bottle", "bowl", "camera", "can", "laptop", "mug")
REAL_CLASSES = CAMERA_CLASSES
# Classes treated as rotationally symmetric about their y axis
# (FPC/tools/project.py:90-94,122-126).
SYMMETRIC_CLASSES = ("bowl", "can", "bottle")

INTRINSICS = {
    "CAMERA": np.array(
        [[577.5, 0.0, 319.5], [0.0, 577.5, 239.5], [0.0, 0.0, 1.0]], dtype=np.float64
    ),
    "REAL": np.array(
        [[591.0125, 0.0, 322.525], [0.0, 590.16775, 244.11084], [0.0, 0.0, 1.0]],
        dtype=np.float64,
    ),
}

CLASSES = {"CAMERA": CAMERA_CLASSES, "REAL": REAL_CLASSES}

IMAGE_HEIGHT = 480
IMAGE_WIDTH = 640


def scaled_intrinsics(dataset_name: str, height: int, width: int) -> np.ndarray:
    """Intrinsics rescaled from the native 640x480 capture resolution to a
    (height, width) working resolution (uniform resampling: fx/cx scale with
    width, fy/cy with height). Identity at the native size, so full-res real
    NOCS behavior is unchanged; at reduced working sizes this keeps the
    projected-center GT, the dense vote-field targets, and RT unprojection
    in the SAME pixel coordinate frame as the rendered image. (The reference
    only ever runs at the native size — FPC/tools/dataset.py has no resize —
    so this consistency rule is ours.)"""
    K = INTRINSICS[dataset_name].copy()
    K[0] *= width / IMAGE_WIDTH
    K[1] *= height / IMAGE_HEIGHT
    return K


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """Static description of one NOCS-style dataset."""

    name: str
    classes: tuple
    symmetric_classes: tuple
    intrinsics: np.ndarray

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    def symmetric_class_ids(self) -> tuple:
        return tuple(
            self.classes.index(c) for c in self.symmetric_classes if c in self.classes
        )


def dataset_spec(name: str, selected_classes=None) -> DatasetSpec:
    classes = tuple(selected_classes) if selected_classes else CLASSES[name]
    return DatasetSpec(
        name=name,
        classes=classes,
        symmetric_classes=tuple(c for c in SYMMETRIC_CLASSES if c in classes),
        intrinsics=INTRINSICS[name],
    )


def colormap(num_classes: int, bg_index: int = 0) -> np.ndarray:
    """HSV colormap with black background (FPC/tools/project.py:52-66)."""
    import matplotlib.cm

    cmap = matplotlib.cm.get_cmap("hsv")
    out = np.zeros((num_classes, 3))
    for x in range(num_classes):
        out[x] = np.array(cmap(x / num_classes)[:3]) if x != bg_index else 0.0
    return out

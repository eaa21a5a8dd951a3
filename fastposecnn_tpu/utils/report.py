"""AP tables to Excel/CSV.

Parity: FPC/tools/excel_tools.py:8-48 (`save_aps_to_excel`): one sheet per
metric, classes as columns, thresholds as index. Falls back to CSV when no
Excel engine is installed (openpyxl is absent in this image).
"""

from __future__ import annotations

import pathlib
from typing import Dict, Sequence

import numpy as np
import pandas as pd


def aps_to_frames(
    thresholds: Dict[str, np.ndarray],
    aps: Dict[str, Dict[str, np.ndarray]],
    cls_names: Sequence[str],
) -> Dict[str, pd.DataFrame]:
    frames = {}
    for metric, per_class in aps.items():
        cols = {}
        for name in cls_names:
            if name in per_class:
                cols[name] = 100 * np.asarray(per_class[name])
        frames[metric] = pd.DataFrame(
            cols, index=np.asarray(thresholds[metric])
        )
    return frames


def save_aps(
    path,
    thresholds: Dict[str, np.ndarray],
    aps: Dict[str, Dict[str, np.ndarray]],
    cls_names: Sequence[str],
) -> pathlib.Path:
    path = pathlib.Path(path)
    frames = aps_to_frames(thresholds, aps, cls_names)
    try:
        with pd.ExcelWriter(path) as writer:
            for metric, frame in frames.items():
                frame.to_excel(writer, sheet_name=metric[:31])
        return path
    except (ImportError, ModuleNotFoundError, ValueError):
        # No Excel engine: one CSV per metric next to the requested path.
        out = path.with_suffix("")
        out.mkdir(parents=True, exist_ok=True)
        for metric, frame in frames.items():
            frame.to_csv(out / f"{metric}.csv")
        return out

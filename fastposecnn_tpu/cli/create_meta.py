"""Offline data-prep CLI: raw NOCS -> `*_meta+.json`.

Parity: FPC/tools/create_meta+.py CLI (`--DATASET_NAME`,
`--SUBSET_DATASET_NAME`, create_meta+.py:852-868). Alignment is the
self-contained Umeyama implementation in data/meta_plus.py instead of the
external NOCS_CVPR2019 import the reference requires.
"""

from __future__ import annotations

import argparse
import os
import pathlib

from fastposecnn_tpu import constants
from fastposecnn_tpu.data.meta_plus import create_meta_plus_dataset


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--DATASET_NAME", default="CAMERA",
                        choices=["CAMERA", "REAL"])
    parser.add_argument("--root", default=None,
                        help="raw dataset root (default: env NOCS_<NAME>_RAW)")
    parser.add_argument("--obj_models_dir", default=None,
                        help="NOCS obj_models library for bbox scales "
                             "(default: env NOCS_OBJ_MODELS; reference "
                             "create_meta+.py:865)")
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args(argv)

    root = args.root or os.getenv(f"NOCS_{args.DATASET_NAME}_RAW")
    if not root or not pathlib.Path(root).exists():
        raise SystemExit("raw dataset root not found; pass --root")
    obj_models = args.obj_models_dir or os.getenv("NOCS_OBJ_MODELS")

    n = create_meta_plus_dataset(
        root,
        constants.INTRINSICS[args.DATASET_NAME],
        overwrite=args.overwrite,
        obj_models_dir=obj_models,
        dataset_name=args.DATASET_NAME,
    )
    print(f"wrote {n} meta+ files under {root}")


if __name__ == "__main__":
    main()

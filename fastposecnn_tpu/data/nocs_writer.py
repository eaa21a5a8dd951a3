"""Write synthetic scenes to disk in the NOCS on-disk layout.

Produces the exact file family the reference's offline prep emits
(FPC/tools/create_meta+.py:694-696): `XXXX_color.png`, `XXXX_mask.png`,
`XXXX_depth.png`, `XXXX_meta+.json` with
{instance_dict, scales, RTs, norm_factors, quaternions} — so the dataset
reader, the CLIs and the native loader can all be exercised without the
real NOCS download (unavailable in this zero-egress environment).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
from PIL import Image

from fastposecnn_tpu.data import native_loader as _nl
from fastposecnn_tpu.data.synthetic import SceneConfig, generate_scene


def _save_png(path, arr: np.ndarray) -> None:
    """Lossless PNG write; native libpng encoder when built (~2x PIL at
    the Z_BEST_SPEED level the throwaway banks use), PIL otherwise."""
    if _nl.available():
        _nl.encode_png(path, arr, compress_level=1)
    else:
        Image.fromarray(arr).save(path, compress_level=1)


def write_synthetic_nocs(
    root,
    num_samples: int = 8,
    seed: int = 0,
    scene_cfg: SceneConfig = None,
    subdir_every: int = 4,
) -> pathlib.Path:
    root = pathlib.Path(root)
    cfg = scene_cfg or SceneConfig()
    rng = np.random.default_rng(seed)
    for i in range(num_samples):
        d = root / f"{i // subdir_every:05d}"
        d.mkdir(parents=True, exist_ok=True)
        prefix = d / f"{i % subdir_every:04d}"
        scene = generate_scene(rng, cfg)
        agg = scene["agg"]
        valid = agg["valid"]
        n = int(valid.sum())

        img = np.clip(scene["image"], 0, 1)
        _save_png(f"{prefix}_color.png", (img * 255).astype(np.uint8))

        # Instance-id mask: ids 1..n; background 255 like NOCS raw masks.
        inst_mask = np.full(scene["mask"].shape, 255, np.uint8)
        for k in range(n):
            inst_mask[agg["instance_masks"][k] > 0] = k + 1
        _save_png(f"{prefix}_mask.png", inst_mask)

        # Depth: per-pixel object z in mm (uint16), 0 background.
        depth = np.zeros(scene["mask"].shape, np.uint16)
        for k in range(n):
            depth[agg["instance_masks"][k] > 0] = np.uint16(agg["z"][k])
        _save_png(f"{prefix}_depth.png", depth)

        meta = {
            "instance_dict": {
                str(k + 1): int(agg["class_ids"][k]) for k in range(n)
            },
            "scales": agg["scales"][valid].tolist(),
            "RTs": agg["RT"][valid].astype(np.float64).tolist(),
            "norm_factors": [1.0] * n,
            "quaternions": agg["quaternion"][valid].tolist(),
        }
        pathlib.Path(f"{prefix}_meta+.json").write_text(json.dumps(meta))
    # Completion marker: a killed render leaves scenes but no marker, so
    # reuse checks (cli/train._render_if_empty) can tell a whole bank
    # from a torn one. (Observed: a VM kill mid-render left 230/256
    # scenes + one torn; the relaunch adopted it and the staged trainer
    # clamped its device buffer to 919 samples for the entire run.)
    # The dataset scanner only picks *_color.png, so the marker is inert.
    (root / ".complete").touch()
    return root


def _main(argv=None) -> None:
    """`python -m fastposecnn_tpu.data.nocs_writer` — generate one synthetic
    NOCS-format scene bank. Exists so trainers can regenerate the NEXT bank
    in a background process while the chip trains on the current one
    (cli/train.py async restaging); also handy for building fixed datasets.
    """
    import argparse

    p = argparse.ArgumentParser(description=_main.__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, required=True)
    p.add_argument("--seed", type=int, required=True)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--num_classes", type=int, default=7)
    p.add_argument("--max_instances", type=int, default=8)
    p.add_argument("--pose_cues", action="store_true")
    p.add_argument("--cue_boost", action="store_true")
    a = p.parse_args(argv)
    cfg = SceneConfig(
        height=a.height, width=a.width, num_classes=a.num_classes,
        max_instances=a.max_instances, render_pose_cues=a.pose_cues,
        cue_boost=a.cue_boost,
    )
    write_synthetic_nocs(a.out, a.num, a.seed, cfg)


if __name__ == "__main__":
    _main()

"""Offline dataset preparation: raw NOCS -> `*_meta+.json` ground truth.

Parity: FPC/tools/create_meta+.py (852 lines): for every raw NOCS image it
parses `*_meta.txt`, computes per-instance scales from the object-model
bbox, aligns GT RTs from the coord+depth maps (the reference imports the
external NOCS_CVPR2019 repo's `utils.align`, create_meta+.py:18-19,228),
orthogonalizes to quaternion + normalizing factor, rebuilds the translation
from the projected origin, and writes
{instance_dict, scales, RTs, norm_factors, quaternions}.

This module is self-contained: the Umeyama similarity alignment that NOCS'
`align` performs is implemented here directly (standard closed-form
[Umeyama 1991] on the NOCS-coord <-> back-projected-depth correspondence).
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, Optional, Tuple

import numpy as np
import scipy.spatial.transform


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform src -> dst.

    src, dst: [N, 3]. Returns (scale s, rotation R [3,3], translation t [3])
    with dst ~= s * R @ src + t. Closed form per Umeyama (TPAMI 1991), the
    same estimation NOCS' utils.align uses for pose fitting.
    """
    n = src.shape[0]
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / n
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (sc**2).sum() / n
    s = float(np.trace(np.diag(D) @ S) / var_s) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def align_instance(
    coord: np.ndarray,  # [H, W, 3] NOCS coordinate map (0..1)
    depth_mm: np.ndarray,  # [H, W] uint16 depth in mm
    mask: np.ndarray,  # [H, W] bool instance mask
    intrinsics: np.ndarray,
    max_points: int = 5000,
    seed: int = 0,
) -> Optional[Tuple[float, np.ndarray]]:
    """Estimate the instance RT from its NOCS coords + observed depth.

    Returns (scale_factor, RT [4,4], world->camera like the meta+ RTs) or
    None when too few valid points. This is the role `nocs_utils.align`
    plays in FPC/tools/create_meta+.py:228.
    """
    ys, xs = np.nonzero(mask & (depth_mm > 0))
    if ys.shape[0] < 9:
        return None
    if ys.shape[0] > max_points:
        sel = np.random.default_rng(seed).choice(
            ys.shape[0], max_points, replace=False
        )
        ys, xs = ys[sel], xs[sel]

    z = depth_mm[ys, xs].astype(np.float64) / 1000.0
    inv_K = np.linalg.inv(intrinsics)
    pix = np.stack([xs * z, ys * z, z], axis=-1)
    cam = (inv_K @ pix.T).T  # [N, 3] camera-space points (meters)

    nocs = coord[ys, xs].astype(np.float64) - 0.5  # centered model coords

    s, R, t = umeyama(nocs, cam, with_scale=True)
    # RT convention used throughout the repo: inv(RT) maps object -> camera
    # (see geometry.project_to_image); build inv_RT then invert.
    inv_RT = np.eye(4)
    inv_RT[:3, :3] = s * R
    inv_RT[:3, 3] = t
    RT = np.linalg.inv(inv_RT)
    return s, RT


def rt_to_quat(RT: np.ndarray, normalize: bool = True):
    """RT -> (quaternion xyzw, translation, normalizing factor).

    Parity: FPC/tools/data_manipulation.py:1080-1120 (`RT_2_quat`): scale out
    the max element first so the rotation block orthogonalizes cleanly, then
    scipy Rotation for the quaternion.
    """
    RT = np.array(RT, np.float64)
    if normalize:
        factor = float(np.amax(RT))
        RT[:3, :] = RT[:3, :] / factor
    else:
        factor = 1.0
    rot = scipy.spatial.transform.Rotation.from_matrix(RT[:3, :3])
    quat = rot.as_quat()
    T = RT[:3, 3]
    return quat, T, factor


def parse_meta_txt(path) -> Dict[int, Dict]:
    """Parse NOCS `*_meta.txt`.

    CAMERA lines: `inst_id class_id symmetry_id reference_id`
    (create_meta+.py:170-185); REAL lines: `inst_id class_id model_name`
    (create_meta+.py:310-320). All tokens after class_id are kept in
    'model_tokens'.
    """
    out = {}
    for line in pathlib.Path(path).read_text().splitlines():
        parts = line.split()
        if len(parts) < 2:
            continue
        iid, cls = int(parts[0]), int(parts[1])
        out[iid] = {
            "class_id": cls,
            "model": parts[2] if len(parts) > 2 else None,
            "model_tokens": tuple(parts[2:]),
        }
    return out


def obj_model_scale(
    obj_models_dir, model_tokens, dataset_name: str = "CAMERA"
) -> Optional[np.ndarray]:
    """Per-instance 3D-bbox scale from the object-model library.

    Parity (FPC/tools/create_meta+.py):
      CAMERA (:170-185): bbox.txt at `<dir>/<symmetry_id>/<reference_id>/
        bbox.txt` holds two corner rows; scale = bbox[0] - bbox[1].
      REAL (:310-320): `<dir>/<model_name>.txt` holds one 3-vector,
        L2-normalized at extraction.
    Returns None when the file is absent (caller falls back).
    """
    if obj_models_dir is None or not model_tokens:
        return None
    d = pathlib.Path(obj_models_dir)
    if dataset_name == "REAL":
        fp = d / f"{model_tokens[0]}.txt"
        if not fp.exists():
            return None
        v = np.loadtxt(str(fp), dtype=np.float64).reshape(-1)[:3]
        return v / np.linalg.norm(v)
    # CAMERA: needs symmetry_id + reference_id
    if len(model_tokens) < 2:
        return None
    fp = d / model_tokens[0] / model_tokens[1] / "bbox.txt"
    if not fp.exists():
        return None
    bbox = np.loadtxt(str(fp), dtype=np.float64)
    return bbox[0, :] - bbox[1, :]


def create_meta_plus_for_sample(
    color_fp: pathlib.Path,
    intrinsics: np.ndarray,
    model_scales: Optional[Dict[str, np.ndarray]] = None,
    obj_models_dir=None,
    dataset_name: str = "CAMERA",
) -> Optional[dict]:
    """Build one meta+ dict from the raw NOCS files next to `color_fp`.

    Requires `*_mask.png`, `*_coord.png`, `*_depth.png`, `*_meta.txt`.
    Scale source priority (create_meta+.py:170-185, 310-320):
      1. `obj_models_dir` — the NOCS obj_models library (bbox.txt files,
         CAMERA/REAL layouts per `obj_model_scale`);
      2. `model_scales` — explicit model-id -> [3] extents mapping;
      3. fallback: the NOCS-coord extent of the instance's visible points.
    """
    from PIL import Image

    base = str(color_fp).replace("_color.png", "")
    paths = {k: pathlib.Path(f"{base}_{k}.png") for k in ("mask", "coord", "depth")}
    meta_txt = pathlib.Path(f"{base}_meta.txt")
    if not all(p.exists() for p in paths.values()) or not meta_txt.exists():
        return None

    mask = np.asarray(Image.open(paths["mask"]))
    if mask.ndim == 3:
        mask = mask[:, :, 0]
    coord = np.asarray(Image.open(paths["coord"])).astype(np.float64) / 255.0
    # NOCS coord maps store z flipped (NOCS convention).
    coord = coord[:, :, :3]
    coord[:, :, 2] = 1.0 - coord[:, :, 2]
    from fastposecnn_tpu.data.nocs import standardize_depth

    depth = standardize_depth(np.asarray(Image.open(paths["depth"])))

    instances = parse_meta_txt(meta_txt)
    meta = {
        "instance_dict": {},
        "scales": [],
        "RTs": [],
        "norm_factors": [],
        "quaternions": [],
    }
    for iid, info in instances.items():
        imask = mask == iid
        if not imask.any():
            continue
        res = align_instance(coord, depth, imask, intrinsics)
        if res is None:
            continue
        s, RT = res
        quat, _T, factor = rt_to_quat(RT.copy())
        scales = obj_model_scale(
            obj_models_dir, info["model_tokens"], dataset_name
        )
        if scales is None and model_scales and info["model"] in model_scales:
            scales = np.asarray(model_scales[info["model"]], np.float64)
        if scales is None:
            pts = coord[imask] - 0.5
            scales = (pts.max(axis=0) - pts.min(axis=0)) * s
        meta["instance_dict"][str(iid)] = info["class_id"]
        meta["scales"].append(scales.tolist())
        meta["RTs"].append(RT.tolist())
        meta["norm_factors"].append(factor)
        meta["quaternions"].append(np.asarray(quat).tolist())
    if not meta["instance_dict"]:
        return None
    return meta


def create_meta_plus_dataset(root, intrinsics, model_scales=None,
                             overwrite=False, obj_models_dir=None,
                             dataset_name: str = "CAMERA") -> int:
    """Walk a raw NOCS tree and write `*_meta+.json` next to each color
    image (create_meta+.py:602-696). Returns number written."""
    root = pathlib.Path(root)
    count = 0
    for color_fp in sorted(root.rglob("*_color.png")):
        out_fp = pathlib.Path(str(color_fp).replace("_color.png", "_meta+.json"))
        if out_fp.exists() and not overwrite:
            continue
        meta = create_meta_plus_for_sample(
            color_fp, intrinsics, model_scales,
            obj_models_dir=obj_models_dir, dataset_name=dataset_name,
        )
        if meta is None:
            continue
        out_fp.write_text(json.dumps(meta))
        count += 1
    return count

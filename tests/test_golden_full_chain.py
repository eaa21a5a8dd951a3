"""Composed full-chain golden: logits -> matched RT payload, ours vs a
torch transcription of the reference's ENTIRE post-network pipeline.

test_golden_torch.py pins each stage individually; this test wires the
torch transcriptions together exactly as the reference does —

  gtf.class_compress (gpu_tensor_funcs.py:52-99)
  -> AggregationLayer.forward (aggregation_layer.py:61-156)
  -> ransac_voting_layer_v3 (ransac_voting_gpu.py:518-605, incl. the CUDA
     kernel math of ransac_voting_kernel.cu:11-167 and the normal-form LSQ
     refinement 583-600)
  -> samplewise_get_RT (gpu_tensor_funcs.py:204-253)
  -> batchwise_find_matches (matching.py:226-325)

— and runs both chains on the same analytically-perfect synthetic logits
(every unit vector points exactly at its instance center, so both RANSAC
implementations recover the same centers despite different RNG). Catches
inter-stage glue bugs the per-stage goldens cannot: channel-order
mismatches, mm/m unit slips, winner-into-'xy' replacement semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from test_golden_torch import (
    torch_reference_aggregate,
    torch_reference_find_matches,
    torch_reference_get_RT,
)

from fastposecnn_tpu.data.synthetic import (
    SceneConfig,
    generate_scene,
    perfect_logits,
)
from fastposecnn_tpu.ops.matching import gather_matched, match_instances
from fastposecnn_tpu.pipeline import PipelineConfig, run_pipeline


def torch_class_compress(logits_nhwc, num_classes):
    """Exact transcription of gtf.class_compress
    (FPC/lib/gpu_tensor_funcs.py:37-99), NCHW torch doubles."""
    cm1 = num_classes - 1
    t = {
        k: torch.from_numpy(np.asarray(v)).permute(0, 3, 1, 2).double()
        for k, v in logits_nhwc.items()
        if k != "z"
    }
    t["z"] = torch.from_numpy(np.asarray(logits_nhwc["z"])) \
        .permute(0, 3, 1, 2).double()

    cat_mask = torch.argmax(torch.nn.LogSoftmax(dim=1)(t["mask"]), dim=1)
    b, _, h, w = t["mask"].shape
    class_masks = torch.zeros((b, num_classes, h, w)).scatter(
        1, torch.unsqueeze(cat_mask, dim=1), 1
    )[:, 1:]

    out = {"mask": cat_mask}
    for key in ("quaternion", "scales", "xy", "z"):
        chunks = torch.stack(torch.chunk(t[key], cm1, dim=1), dim=1)
        masked = torch.where(
            torch.unsqueeze(class_masks, dim=2).bool(),
            chunks,
            torch.tensor(0.0).double(),
        )
        comp = torch.sum(masked, dim=1)  # [B, k, H, W]
        if key == "z":
            comp = torch.squeeze(comp, dim=1)
        elif key in ("quaternion", "xy"):
            norm = comp.norm(dim=1, keepdim=True)
            comp = comp / torch.where(norm != 0, norm, torch.ones_like(norm))
        out[key] = comp
    return out


def torch_v3_center(mask_hw, xy_dense_2hw, round_hyp_num=128,
                    inlier_thresh=0.999, seed=0):
    """One-instance transcription of ransac_voting_layer_v3
    (ransac_voting_gpu.py:518-605) with the CUDA kernels' math inlined
    (ransac_voting_kernel.cu:11-167). With a perfect unit-vector field the
    round loop converges immediately, so one round is the exact reference
    behavior (its confidence test passes after round 1)."""
    g = torch.Generator().manual_seed(seed)
    cur_mask = mask_hw.bool()
    coords = torch.nonzero(cur_mask).double()[:, [1, 0]]  # (x, y)
    tn = coords.shape[0]
    direct = xy_dense_2hw.permute(1, 2, 0)[cur_mask]  # [tn, 2]
    idxs = torch.randint(0, tn, (round_hyp_num, 2), generator=g)

    # --- generate_hypothesis_kernel (.cu:11-48), normal form n=(dy, -dx)
    d0, d1 = direct[idxs[:, 0]], direct[idxs[:, 1]]
    c0, c1 = coords[idxs[:, 0]], coords[idxs[:, 1]]
    nx0, ny0 = d0[:, 1], -d0[:, 0]
    nx1, ny1 = d1[:, 1], -d1[:, 0]
    det_y = nx1 * ny0 - nx0 * ny1
    det_x = ny1 * nx0 - ny0 * nx1
    rhs0 = nx0 * c0[:, 0] + ny0 * c0[:, 1]
    rhs1 = nx1 * c1[:, 0] + ny1 * c1[:, 1]
    ok = (det_y.abs() >= 1e-6) & (det_x.abs() >= 1e-6)
    hyp = torch.zeros((round_hyp_num, 2), dtype=torch.double)
    hyp[ok, 0] = ((ny1 * rhs0 - ny0 * rhs1) / det_x)[ok]
    hyp[ok, 1] = ((nx1 * rhs0 - nx0 * rhs1) / det_y)[ok]

    # --- voting_for_hypothesis_kernel (.cu:88-167): cosine inlier test
    def inliers_for(pts):
        dxy = pts[:, None, :] - coords[None, :, :]  # [hn, tn, 2]
        norm1 = direct.norm(dim=1)[None, :]
        norm2 = dxy.norm(dim=2)
        cos = (dxy * direct[None]).sum(2) / (norm1 * norm2)
        return (norm1 > 1e-6) & (norm2 > 1e-6) & (cos > inlier_thresh)

    counts = inliers_for(hyp).sum(1)
    win = int(torch.argmax(counts))
    win_pt = hyp[win:win + 1]

    # --- LSQ refinement over the winner's inliers
    # (ransac_voting_gpu.py:583-600): normal-form ATA \ ATb
    inl = inliers_for(win_pt)[0].double()  # [tn]
    normal = torch.stack([direct[:, 1], -direct[:, 0]], dim=1) * inl[:, None]
    rhs = (normal * coords).sum(1)
    ATA = normal.T @ normal
    ATb = (normal * rhs[:, None]).sum(0)
    refined = torch.linalg.solve(ATA, ATb)
    return refined


def test_full_chain_matches_reference_transcription():
    rng = np.random.default_rng(11)
    cfg = SceneConfig()
    scene = generate_scene(rng, cfg)
    logits = perfect_logits(scene, cfg.num_classes)

    # ---- ours: one jit pipeline + matching
    pcfg = PipelineConfig(
        max_instances=cfg.max_instances,
        max_points=512,
        hv_num_hypotheses=64,
        use_pallas=False,
    )
    inv_K_np = np.linalg.inv(scene["intrinsics"])
    out = run_pipeline(
        {k: jnp.asarray(v) for k, v in logits.items()},
        jax.random.key(0), pcfg, jnp.asarray(inv_K_np, jnp.float32),
    )
    gts = {k: jnp.asarray(v)[None] for k, v in scene["agg"].items()}
    match = match_instances(out["aggregated"], gts)
    ours = gather_matched(
        out["aggregated"], gts, match, keys=("quaternion", "z", "xy", "RT")
    )

    # ---- reference transcription chain
    cat = torch_class_compress(logits, cfg.num_classes)
    agg = torch_reference_aggregate(
        np.asarray(cat["mask"], np.int32),
        cat["quaternion"].permute(0, 2, 3, 1).float().numpy(),
        cat["scales"].permute(0, 2, 3, 1).float().numpy(),
        cat["xy"].permute(0, 2, 3, 1).float().numpy(),
        cat["z"].float().numpy(),
    )
    n_inst = agg["class_ids"].shape[0]
    centers = torch.stack([
        torch_v3_center(agg["instance_masks"][i], agg["xy"][i], seed=i)
        for i in range(n_inst)
    ])
    # hough_voting.py:61: the winner replaces 'xy'; samplewise_get_RT then
    # consumes (quaternion, xy, z)
    agg["xy"] = centers
    R, T, RT = torch_reference_get_RT(
        agg["quaternion"], agg["xy"], agg["z"],
        torch.from_numpy(inv_K_np).double(),
    )
    agg["RT"] = RT
    valid_gt = scene["agg"]["valid"]
    t_gts = {
        "instance_masks": torch.from_numpy(
            scene["agg"]["instance_masks"][valid_gt]).double(),
        "class_ids": torch.from_numpy(
            scene["agg"]["class_ids"][valid_gt]).long(),
        "symmetric_ids": torch.from_numpy(
            scene["agg"]["symmetric_ids"][valid_gt]).long(),
        "sample_ids": torch.zeros(int(valid_gt.sum()), dtype=torch.long),
        "quaternion": torch.from_numpy(
            scene["agg"]["quaternion"][valid_gt]).double(),
        "z": torch.from_numpy(scene["agg"]["z"][valid_gt]).double(),
        "xy": torch.from_numpy(scene["agg"]["xy"][valid_gt]).double(),
        "RT": torch.from_numpy(scene["agg"]["RT"][valid_gt]).double(),
    }
    t_preds = {
        "instance_masks": agg["instance_masks"],
        "class_ids": agg["class_ids"].long(),
        "quaternion": agg["quaternion"],
        "z": agg["z"][:, 0],
        "xy": agg["xy"],
        "RT": agg["RT"],
    }
    want = torch_reference_find_matches(
        t_preds, t_gts, keys=["quaternion", "z", "xy", "RT"]
    )

    # ---- compare: same number of matches; per-GT pred payloads agree
    valid = np.asarray(ours["valid"][0])
    assert want is not None
    assert int(valid.sum()) == want["class_ids"].shape[0]

    gt_quats = scene["agg"]["quaternion"][valid_gt]
    for k in range(want["class_ids"].shape[0]):
        gq = want["quaternion"][0, k].numpy()
        gt_i = int(np.argmin(np.linalg.norm(gt_quats - gq, axis=-1)))
        # our slot index for this GT: position among valid GT slots
        slot = np.nonzero(valid_gt)[0][gt_i]
        assert valid[slot]
        np.testing.assert_allclose(
            np.asarray(ours["pred_quaternion"][0, slot]),
            want["quaternion"][1, k].numpy(), atol=1e-3,
        )
        np.testing.assert_allclose(
            float(np.asarray(ours["pred_z"][0, slot])),
            float(want["z"][1, k]), rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(ours["pred_xy"][0, slot]),
            want["xy"][1, k].numpy(), atol=0.05,
        )
        np.testing.assert_allclose(
            np.asarray(ours["pred_RT"][0, slot]),
            want["RT"][1, k].numpy(), atol=2e-3,
        )

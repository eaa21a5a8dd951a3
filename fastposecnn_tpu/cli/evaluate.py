"""Two-phase evaluation CLI.

Parity: FPC/evaluate.py:
  Phase A (results file absent): run the whole validation set through the
  model, match GT<->pred, store raw per-class errors (evaluate.py:82-194
  saves matches; we store the derived errors directly — same information
  for the AP math, far smaller).
  Phase B: 50-point AP curves for 3D-IoU / rotation / translation
  (evaluate.py:297-313), table APs at {IoU .25/.5, 5/10 deg, 5/10 cm},
  joint 5deg5cm / 10deg5cm / 10deg10cm APs (evaluate.py:319-330), plot PNG +
  Excel/CSV export (evaluate.py:313,341).

Error math runs in native float64 on host via `fastposecnn_tpu.eval_host`
(numpy; the reference computes symmetric quaternion distance in double,
gpu_tensor_funcs.py:797 — jnp would silently downcast to f32 without
jax_enable_x64, which the TPU runtime does not support).
"""

from __future__ import annotations

import argparse
import functools
import pathlib

import numpy as np

from fastposecnn_tpu import config as C
from fastposecnn_tpu import constants

APS_NUM_OF_POINTS = 50  # FPC/evaluate.py:40


def collect_raw_errors(hp, valid_loader, state, net, pcfg, inv_K,
                       draw: int = 0, draw_dir=None,
                       fpc_compat_iou: bool = False, mesh=None):
    """Phase A: forward + match + per-class raw errors (+ optional figures,
    FPC/evaluate.py:161-187 DRAW).

    `mesh`: optional ('dp','tp') Mesh — the batch is sharded over dp and
    params replicated, so the forward runs data-parallel across devices.
    The reference's evaluator is single-GPU with a literal
    "! Make it work with multiple GPUs" TODO (FPC/evaluate.py:90); here the
    same jitted program partitions over however many chips are attached.
    """
    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu import eval_host
    from fastposecnn_tpu.ops.matching import gather_matched, match_instances
    from fastposecnn_tpu.pipeline import run_pipeline

    if mesh is not None:
        from fastposecnn_tpu.parallel import shard_state_tp

        state = shard_state_tp(state, mesh)  # == replicate when tp=1

    from fastposecnn_tpu.train.task import upcast_batch

    # The hot path returns only the matched payload; the full pipeline
    # output (dense logits + categorical fields + instance-mask stack,
    # ~0.6 GB/batch at 480p/8) is materialized ONLY for the first `draw`
    # batches via a separate jitted program, so XLA can DCE everything the
    # error math does not need.
    def _forward(params, batch_stats, batch, key, with_out):
        batch = upcast_batch(batch)
        variables = {"params": params, "batch_stats": batch_stats}
        logits = net.apply(variables, batch["image"], train=False)
        out = run_pipeline(logits, key, pcfg, jnp.asarray(inv_K, jnp.float32))
        match = match_instances(out["aggregated"], batch["agg"])
        matched = gather_matched(
            out["aggregated"], batch["agg"], match,
            keys=("quaternion", "scales", "z", "xy", "T", "R", "RT"),
        )
        return (matched, out) if with_out else (matched, None)

    forward_match = jax.jit(functools.partial(_forward, with_out=False))
    forward_match_draw = jax.jit(functools.partial(_forward, with_out=True))

    num_classes = hp.num_classes
    raw = {
        "3d_iou": {c: [] for c in range(1, num_classes)},
        "degree_error": {c: [] for c in range(1, num_classes)},
        "degree_error_geodesic": {c: [] for c in range(1, num_classes)},
        "offset_error": {c: [] for c in range(1, num_classes)},
    }
    from fastposecnn_tpu.train.loop import _pad_batch, _to_device_batch

    for bi, batch in enumerate(valid_loader):
        if batch is None:
            continue
        batch, n_real = _pad_batch(batch, hp.BATCH_SIZE)
        db = _to_device_batch(batch, mesh)
        drawing = draw and bi < draw and draw_dir is not None
        fwd = forward_match_draw if drawing else forward_match
        matched, out = fwd(
            state.params, state.batch_stats, db, jax.random.key(bi)
        )
        matched = jax.device_get(matched)
        if drawing:
            _save_comparison_figure(hp, batch, matched, out, bi, draw_dir)
        valid = matched["valid"][:n_real]
        cls = matched["class_ids"][:n_real]
        # Native-f64 error math on host for metric parity (eval_host asserts
        # float64 outputs; gpu_tensor_funcs.py:797 uses .double()).
        deg = eval_host.quat_distance_deg(
            matched["gt_quaternion"][:n_real],
            matched["pred_quaternion"][:n_real],
            matched["symmetric_ids"][:n_real],
        )
        # TRUE rotation angle alongside the reference's chord-as-radians
        # parity metric (which reads random predictions as ~49 deg).
        deg_geo = eval_host.geodesic_quat_distance_deg(
            matched["gt_quaternion"][:n_real],
            matched["pred_quaternion"][:n_real],
            matched["symmetric_ids"][:n_real],
        )
        iou = eval_host.asymmetric_3d_iou(
            matched["gt_RT"][:n_real],
            matched["pred_RT"][:n_real],
            matched["gt_scales"][:n_real],
            matched["pred_scales"][:n_real],
            fpc_compat=fpc_compat_iou,
        )
        off = eval_host.offset_error_cm(
            matched["gt_T"][:n_real], matched["pred_T"][:n_real]
        )
        for c in range(1, num_classes):
            sel = valid & (cls == c)
            raw["degree_error"][c].append(deg[sel])
            raw["degree_error_geodesic"][c].append(deg_geo[sel])
            raw["3d_iou"][c].append(iou[sel])
            raw["offset_error"][c].append(off[sel])

    return {
        metric: {c: np.concatenate(v) if v else np.zeros((0,))
                 for c, v in per.items()}
        for metric, per in raw.items()
    }


def _save_comparison_figure(hp, batch, matched, out, bi, draw_dir):
    """The reference's DRAW option saves compare_all_performance figures
    (FPC/evaluate.py:161-187): gt / pred / poses grid triple."""
    import jax
    import matplotlib.pyplot as plt

    from fastposecnn_tpu import constants
    from fastposecnn_tpu.utils import visualize as vz

    intr = constants.scaled_intrinsics(
        hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH)
    img = vz.denormalize_image(np.asarray(batch["image"][0]))
    cat = jax.device_get(out["categorical"])
    agg = jax.device_get(out["aggregated"])
    gt_fig, pred_fig, poses_fig = vz.compare_all_performance(
        img,
        {k: np.asarray(v[0]) for k, v in cat.items()},
        hp.num_classes,
        gt_mask=np.asarray(batch["mask"][0]),
        matched={k: np.asarray(v[0]) for k, v in matched.items()},
        aggregated={k: np.asarray(v[0]) for k, v in agg.items()},
        intrinsics=intr,
    )
    for name, fig in (("gt", gt_fig), ("pred", pred_fig),
                      ("poses", poses_fig)):
        fig.savefig(str(pathlib.Path(draw_dir) / f"eval_{bi:04d}_{name}.png"))
        plt.close(fig)


def compute_aps(raw, class_names):
    """Phase B AP computation (FPC/evaluate.py:196-330).

    Pure host numpy (eval_host mirrors of the jnp AP math): f64 end to end
    and zero device traffic — the eager jnp formulation pushed ~200 tiny
    ops through the remote-TPU tunnel at ~0.4 s each."""
    from fastposecnn_tpu import eval_host

    figure_thresholds = {
        "3d_iou": np.linspace(0, 1, APS_NUM_OF_POINTS),
        "degree_error": np.linspace(0, 60, APS_NUM_OF_POINTS),
        "degree_error_geodesic": np.linspace(0, 60, APS_NUM_OF_POINTS),
        "offset_error": np.linspace(0, 10, APS_NUM_OF_POINTS),
    }
    table_thresholds = {
        "3d_iou": np.asarray([0.25, 0.50]),
        "degree_error": np.asarray([5.0, 10.0]),
        "degree_error_geodesic": np.asarray([5.0, 10.0]),
        "offset_error": np.asarray([5.0, 10.0]),
    }
    greater = {"3d_iou": True, "degree_error": False,
               "degree_error_geodesic": False, "offset_error": False}

    def build(thresholds):
        aps = {}
        for metric, per_class in raw.items():
            aps[metric] = {}
            curves = []
            for c, values in per_class.items():
                curve = eval_host.calculate_ap(
                    values,
                    np.ones(values.shape, bool),
                    thresholds[metric],
                    greater_is_better=greater[metric],
                )
                aps[metric][class_names[c]] = curve
                curves.append(curve)
            aps[metric]["mean"] = np.mean(np.stack(curves), axis=0)
        return aps

    figure_aps = build(figure_thresholds)
    table_aps = build(table_thresholds)

    # Joint degree+offset APs at (5,5), (10,5), (10,10) — evaluate.py:224-227.
    joint = {}
    deg_t = np.asarray([5.0, 10.0, 10.0])
    off_t = np.asarray([5.0, 5.0, 10.0])
    curves = []
    for c in raw["degree_error"]:
        d = raw["degree_error"][c]
        o = raw["offset_error"][c]
        curve = eval_host.calculate_joint_ap(
            d, o, np.ones(d.shape, bool), deg_t, off_t,
        )
        joint[class_names[c]] = curve
        curves.append(curve)
    joint["mean"] = np.mean(np.stack(curves), axis=0)
    table_aps["degree_error+offset_error"] = joint
    table_thresholds["degree_error+offset_error"] = np.asarray(
        [5.5, 10.5, 10.10]
    )  # label-style index like evaluate.py:334

    return figure_aps, figure_thresholds, table_aps, table_thresholds


def main(argv=None):
    from fastposecnn_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--valid_dir", default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic_pose_cues", action="store_true")
    parser.add_argument("--synthetic_cue_boost", action="store_true")
    parser.add_argument(
        "--synthetic_seed", type=int, default=999983,
        help="scene-bank seed for --synthetic; default is disjoint from the "
             "train CLI's stream (train banks use 0,2,3,..., its valid "
             "split uses 1) so a held-out evaluation stays held out",
    )
    parser.add_argument("--output", default="eval_output")
    parser.add_argument("--draw", type=int, default=0,
                        help="save comparison figures for first N batches "
                             "(FPC evaluate.py DRAW option)")
    parser.add_argument("--fpc_compat_iou", action="store_true",
                        help="replicate the reference evaluator's 3D-IoU "
                             "corner-axis reduction quirk "
                             "(gpu_tensor_funcs.py:511-525) for bit-parity "
                             "with its published-style numbers; default is "
                             "the geometrically correct axis-aligned IoU")
    C.add_cli_overrides(parser, C.HParams())
    args = parser.parse_args(argv)

    hp = C.evaluating()
    hp = C.apply_cli_overrides(hp, args)
    if hp.CHECKPOINT:
        # arch fields travel with the weights (pose_regressor.py:516-525);
        # merge before dataset/model construction (SELECTED_CLASSES filters).
        from fastposecnn_tpu.train import checkpoint as _ckpt

        hp = _ckpt.merge_arch_from_any(hp.CHECKPOINT, hp)

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    results_path = out_dir / f"raw_errors_{hp.VALID_SIZE}.npz"

    class_names = list(hp.SELECTED_CLASSES)

    if not results_path.exists():
        import jax

        from fastposecnn_tpu.data.loader import PrefetchLoader
        from fastposecnn_tpu.data.nocs import NOCSDataset
        from fastposecnn_tpu.models import PoseRegressorNet
        from fastposecnn_tpu.train import checkpoint as ckpt
        from fastposecnn_tpu.train import optim
        from fastposecnn_tpu.train.task import create_train_state

        valid_dir = args.valid_dir
        if args.synthetic:
            import tempfile

            from fastposecnn_tpu.data.nocs_writer import write_synthetic_nocs
            from fastposecnn_tpu.data.synthetic import SceneConfig

            valid_dir = write_synthetic_nocs(
                pathlib.Path(tempfile.mkdtemp()) / "valid", args.synthetic,
                args.synthetic_seed,
                SceneConfig(height=hp.IMAGE_HEIGHT, width=hp.IMAGE_WIDTH,
                            num_classes=hp.num_classes,
                            max_instances=hp.MAX_INSTANCES,
                            render_pose_cues=args.synthetic_pose_cues,
                            cue_boost=args.synthetic_cue_boost),
            )
        ds = NOCSDataset(
            valid_dir, dataset_name=hp.DATASET_NAME,
            selected_classes=hp.SELECTED_CLASSES, max_size=hp.VALID_SIZE,
            max_instances=hp.MAX_INSTANCES,
        )
        loader = PrefetchLoader(ds, hp.BATCH_SIZE, shuffle=False,
                                num_workers=hp.NUM_WORKERS)
        net = PoseRegressorNet(num_classes=hp.num_classes,
                               encoder_name=hp.ENCODER)
        optimizer = optim.make_optimizer(hp)
        state = create_train_state(net, optimizer, jax.random.key(0), hp)
        if hp.CHECKPOINT:
            state, hp = ckpt.load_any_checkpoint(hp.CHECKPOINT, state, hp)
        pcfg = C.pipeline_config_from(hp)
        inv_K = np.linalg.inv(constants.scaled_intrinsics(
            hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH))
        mesh = None
        if hp.NUM_DEVICES > 1:
            dp = max(hp.NUM_DEVICES // hp.NUM_TP, 1)
            if len(jax.devices()) < hp.NUM_DEVICES:
                print(
                    f"WARNING: --NUM_DEVICES={hp.NUM_DEVICES} requested but "
                    f"only {len(jax.devices())} device(s) visible — falling "
                    "back to single-device evaluation."
                )
            elif hp.BATCH_SIZE % dp != 0:
                # the batch shards over dp = NUM_DEVICES / NUM_TP only
                print(
                    f"WARNING: --NUM_DEVICES={hp.NUM_DEVICES} requested but "
                    f"BATCH_SIZE={hp.BATCH_SIZE} is not divisible by "
                    f"dp={hp.NUM_DEVICES}//NUM_TP({hp.NUM_TP})={dp} — "
                    "falling back to single-device evaluation. Pick a "
                    f"BATCH_SIZE that is a multiple of {dp}."
                )
            else:
                from fastposecnn_tpu.parallel import make_mesh

                mesh = make_mesh(hp.NUM_DEVICES, tp=hp.NUM_TP)
                print(f"phase A: data-parallel over {mesh.shape} mesh")
        raw = collect_raw_errors(hp, loader, state, net, pcfg, inv_K,
                                 draw=args.draw, draw_dir=out_dir,
                                 fpc_compat_iou=args.fpc_compat_iou,
                                 mesh=mesh)
        np.savez(
            results_path,
            **{f"{m}/{c}": v for m, per in raw.items() for c, v in per.items()},
        )
        print(f"phase A: wrote {results_path}")
    else:
        print(f"phase A skipped: {results_path} exists")

    # ---- Phase B ----
    loaded = np.load(results_path)
    raw = {}
    for key in loaded.files:
        metric, c = key.rsplit("/", 1)
        raw.setdefault(metric, {})[int(c)] = loaded[key]

    figure_aps, fig_thr, table_aps, table_thr = compute_aps(raw, class_names)

    from fastposecnn_tpu.utils.report import save_aps
    from fastposecnn_tpu.utils.visualize import plot_aps

    plot_names = class_names[1:] + ["mean"]
    fig = plot_aps(
        figure_aps, fig_thr,
        titles={"3d_iou": "3D Iou AP", "degree_error": "Rotation AP",
                "degree_error_geodesic": "Rotation AP (geodesic)",
                "offset_error": "Translation AP"},
        x_labels={"3d_iou": "3D IoU %", "degree_error": "Rotation error/degree",
                  "degree_error_geodesic": "True rotation error/degree",
                  "offset_error": "Translation error/cm"},
        cls_names=plot_names,
    )
    fig_path = out_dir / f"all_metrics_{hp.VALID_SIZE}_aps.png"
    fig.savefig(str(fig_path))
    report_path = save_aps(
        out_dir / f"{hp.VALID_SIZE}_aps_values_table.xlsx",
        table_thr, table_aps, plot_names,
    )
    print(f"phase B: plot -> {fig_path}, tables -> {report_path}")
    mean_ious = table_aps["3d_iou"]["mean"]
    mean_joint = table_aps["degree_error+offset_error"]["mean"]
    print(
        f"3D-IoU AP@0.25={100*mean_ious[0]:.2f} @0.5={100*mean_ious[1]:.2f} | "
        f"5d5cm={100*mean_joint[0]:.2f} 10d5cm={100*mean_joint[1]:.2f} "
        f"10d10cm={100*mean_joint[2]:.2f}"
    )
    if "degree_error_geodesic" in raw:
        all_geo = np.concatenate(
            [v for v in raw["degree_error_geodesic"].values()]
        )
        all_deg = np.concatenate([v for v in raw["degree_error"].values()])
        if all_geo.size:
            print(
                f"rotation mean: geodesic={all_geo.mean():.1f} deg "
                f"(median {np.median(all_geo):.1f}) | "
                f"parity-chord={all_deg.mean():.1f} deg"
            )


if __name__ == "__main__":
    main()

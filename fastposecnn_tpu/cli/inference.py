"""Real-time inference CLI: batch-1 loop with per-stage runtime report.

Parity: FPC/inference.py: INFERENCE preset (batch 1, 1000 hypotheses,
RUNTIME_TIMING on), saves qualitative PNGs for the first N batches, ends
with the per-stage ms/FPS report (inference.py:165-166). Per-stage numbers
come from separately-jitted stages (`--stage_timing`); the default times the
single fused program (which is what production would deploy).
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np

from fastposecnn_tpu import config as C
from fastposecnn_tpu import constants


def main(argv=None):
    from fastposecnn_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--valid_dir", default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic_pose_cues", action="store_true")
    parser.add_argument("--synthetic_cue_boost", action="store_true")
    parser.add_argument("--synthetic_seed", type=int, default=999983,
                        help="scene-bank seed for --synthetic (disjoint "
                             "from the train CLI's 0,2,3,... stream)")
    parser.add_argument("--output", default=None, help="dir for PNGs")
    parser.add_argument("--draw", type=int, default=20,
                        help="save figures for first N batches")
    parser.add_argument("--stage_timing", action="store_true")
    parser.add_argument("--trace", default=None,
                        help="capture a jax.profiler trace into this dir")
    C.add_cli_overrides(parser, C.HParams())
    args = parser.parse_args(argv)

    hp = C.inference()
    hp = C.apply_cli_overrides(hp, args)
    if hp.CHECKPOINT:
        # arch fields travel with the weights (pose_regressor.py:516-525);
        # merge before dataset/model construction (SELECTED_CLASSES filters).
        from fastposecnn_tpu.train import checkpoint as _ckpt

        hp = _ckpt.merge_arch_from_any(hp.CHECKPOINT, hp)

    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu.data.loader import PrefetchLoader
    from fastposecnn_tpu.data.nocs import NOCSDataset
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.ops.matching import gather_matched, match_instances
    from fastposecnn_tpu.pipeline import run_pipeline
    from fastposecnn_tpu.train import checkpoint as ckpt
    from fastposecnn_tpu.train import optim
    from fastposecnn_tpu.train.loop import _pad_batch, _to_device_batch
    from fastposecnn_tpu.train.task import create_train_state
    from fastposecnn_tpu.utils import visualize as vz
    from fastposecnn_tpu.utils.timer import StageTimer, report_runtime

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
    loader = PrefetchLoader(ds, 1, shuffle=False, num_workers=hp.NUM_WORKERS)

    net = PoseRegressorNet(num_classes=hp.num_classes, encoder_name=hp.ENCODER)
    optimizer = optim.make_optimizer(hp)
    state = create_train_state(net, optimizer, jax.random.key(0), hp)
    if hp.CHECKPOINT:
        state, hp = ckpt.load_any_checkpoint(hp.CHECKPOINT, state, hp)
    pcfg = C.pipeline_config_from(hp)
    inv_K = jnp.asarray(
        np.linalg.inv(constants.scaled_intrinsics(
            hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH)), jnp.float32
    )
    intrinsics = constants.scaled_intrinsics(
        hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH)

    # Six reference stages (FPC/lib/pose_regressor.py:43-48 timer instances,
    # report at inference.py:165-166) + the fused program actually served.
    timers = {
        "forward": StageTimer("forward"),
        "model": StageTimer("model"),
        "class_compress": StageTimer("Class Compression"),
        "aggregation": StageTimer("Aggregation"),
        "hough_voting": StageTimer("Hough Voting"),
        "rt_calculation": StageTimer("RT Calculation"),
    }

    from fastposecnn_tpu.train.task import upcast_image

    @jax.jit
    def fused(params, batch_stats, image, key):
        logits = net.apply(
            {"params": params, "batch_stats": batch_stats},
            upcast_image(image), train=False
        )
        return run_pipeline(logits, key, pcfg, inv_K)

    from fastposecnn_tpu import pipeline as PL

    # Stage-timing mode jits each stage separately (the production path is
    # the single fused program above; separate programs lose XLA fusion
    # across stage boundaries, so the fused 'forward' is the serving number).
    stage_fns = {
        "model": jax.jit(
            lambda p, bs, im: net.apply(
                {"params": p, "batch_stats": bs}, upcast_image(im),
                train=False
            )
        ),
        "class_compress": jax.jit(PL.stage_class_compress),
        "aggregation": jax.jit(
            lambda cat: PL.stage_aggregate(cat, pcfg)
        ),
        "hough_voting": jax.jit(
            lambda key, agg: PL.stage_hough_voting(key, agg, pcfg)
        ),
        "rt_calculation": jax.jit(
            lambda agg: PL.stage_rt_calculation(agg, pcfg, inv_K)
        ),
    }

    out_dir = pathlib.Path(args.output) if args.output else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)

    import contextlib

    from fastposecnn_tpu.utils.timer import trace as profiler_trace

    trace_cm = profiler_trace(args.trace) if args.trace else contextlib.nullcontext()
    with trace_cm:
        _inference_loop(
            loader, timers, fused, stage_fns, state,
            out_dir, args, hp, intrinsics,
        )

    report_runtime(timers)


def _hough_cloud_panel(out, agg):
    """Hypothesis-cloud overlay for the first valid instance
    (FPC/tools/visualize.py:296-349)."""
    import numpy as np

    from fastposecnn_tpu.utils import visualize as vz

    valid = np.asarray(agg["valid"][0])
    slot = int(np.argmax(valid)) if valid.any() else 0
    return vz.visualize_hough_voting(
        np.asarray(out["categorical"]["mask"][0]),
        np.asarray(agg["hypothesis"][0][slot]),
        np.asarray(agg.get("pruned_hypothesis", agg["hypothesis"])[0][slot]),
        np.asarray(agg["xy"][0][slot]),
    )


def _inference_loop(loader, timers, fused, stage_fns, state,
                    out_dir, args, hp, intrinsics):
    import jax
    import numpy as np

    from fastposecnn_tpu.ops.matching import gather_matched, match_instances
    from fastposecnn_tpu.train.loop import _pad_batch, _to_device_batch
    from fastposecnn_tpu.utils import visualize as vz

    for bi, batch in enumerate(loader):
        if batch is None:
            continue
        batch, _ = _pad_batch(batch, 1)
        db = _to_device_batch(batch, None)
        key = jax.random.key(bi)

        with timers["forward"].measure():
            out = jax.block_until_ready(
                fused(state.params, state.batch_stats, db["image"], key)
            )
        if args.stage_timing:
            # Per-stage breakdown matching the reference's six timers
            # (FPC/lib/pose_regressor.py:43-48): each stage is its own
            # jitted program here, fed the previous stage's output.
            with timers["model"].measure():
                logits = jax.block_until_ready(
                    stage_fns["model"](
                        state.params, state.batch_stats, db["image"]
                    )
                )
            with timers["class_compress"].measure():
                cat = jax.block_until_ready(
                    stage_fns["class_compress"](logits)
                )
            with timers["aggregation"].measure():
                agg = jax.block_until_ready(stage_fns["aggregation"](cat))
            with timers["hough_voting"].measure():
                agg = jax.block_until_ready(
                    stage_fns["hough_voting"](key, agg)
                )
            with timers["rt_calculation"].measure():
                jax.block_until_ready(stage_fns["rt_calculation"](agg))

        if out_dir and bi < args.draw:
            agg = jax.device_get(out["aggregated"])
            match = match_instances(out["aggregated"], db["agg"])
            matched = jax.device_get(gather_matched(
                out["aggregated"], db["agg"], match,
                keys=("scales", "RT"),
            ))
            img = vz.denormalize_image(np.asarray(db["image"][0]))
            pose_img = vz.compare_pose_performance(
                img,
                matched["gt_RT"][0], matched["gt_scales"][0],
                matched["pred_RT"][0], matched["pred_scales"][0],
                matched["valid"][0], intrinsics,
            )
            fig = vz.make_summary_figure(
                rgb=img,
                pred_mask=vz.colorize_mask(
                    np.asarray(out["categorical"]["mask"][0]), hp.num_classes
                ),
                gt_mask=vz.colorize_mask(np.asarray(db["mask"][0]), hp.num_classes),
                pose=pose_img,
                hough=vz.visualize_hypothesis(
                    img, agg["xy"][0], agg["valid"][0]
                ),
                hough_cloud=_hough_cloud_panel(out, agg),
            )
            fig.savefig(str(out_dir / f"{bi:04d}.png"))
            import matplotlib.pyplot as plt

            plt.close(fig)


if __name__ == "__main__":
    main()

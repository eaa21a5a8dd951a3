"""Training CLI.

Parity: FPC/train.py — `python -m fastposecnn_tpu.cli.train -e NAME
[--HPARAM=value ...]` with every HParams field reflected as a flag
(FPC/train.py:102-112). Dataset roots come from env vars
NOCS_CAMERA_TRAIN_DATASET / NOCS_CAMERA_VALID_DATASET /
NOCS_REAL_TRAIN_DATASET / NOCS_REAL_VALID_DATASET (FPC/.env:1-27), with
--train_dir/--valid_dir overrides and --synthetic N to fabricate a
NOCS-format dataset on the fly (zero-egress environments).
"""

from __future__ import annotations

import argparse
import logging
import os
import pathlib
import shutil
import tempfile

import numpy as np

from fastposecnn_tpu import config as C
from fastposecnn_tpu import constants


def dataset_dirs(hp, args):
    name = hp.DATASET_NAME
    train_dir = args.train_dir or os.getenv(f"NOCS_{name}_TRAIN_DATASET")
    valid_dir = args.valid_dir or os.getenv(f"NOCS_{name}_VALID_DATASET")
    return train_dir, valid_dir


def main(argv=None):
    from fastposecnn_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-e", "--experiment", default="TESTING")
    parser.add_argument(
        "--preset", default="HEAD_TRAINING", choices=sorted(C.PRESETS)
    )
    parser.add_argument("--train_dir", default=None)
    parser.add_argument("--valid_dir", default=None)
    parser.add_argument("--synthetic", type=int, default=0,
                        help="generate N synthetic samples instead of reading disk")
    parser.add_argument("--synthetic_pose_cues", action="store_true",
                        help="render synthetic scenes with pose-informative "
                             "cues (projected size + orientation shading) so "
                             "quaternion/z/scales are learnable, not just "
                             "mask/xy")
    parser.add_argument("--synthetic_cue_boost", action="store_true",
                        help="with --synthetic_pose_cues: tri-axis "
                             "per-channel stripe carriers + octant corner "
                             "marker (stronger orientation cues; see "
                             "data/synthetic.py SceneConfig.cue_boost)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--no_tb", action="store_true")
    parser.add_argument("--resume", default=None)
    parser.add_argument("--no_augment", action="store_true",
                        help="disable the per-split augmentation pipelines")
    parser.add_argument("--stage_on_device", action="store_true",
                        help="device-resident trainer: stage the whole "
                             "dataset in HBM and run each epoch as one "
                             "jitted scan (train/staged.py) — for datasets "
                             "that fit in device memory; kills per-step "
                             "host round trips on remote-attached chips")
    parser.add_argument("--restage_every", type=int, default=0,
                        help="with --stage_on_device: re-materialize the "
                             "(augmented) training set every K epochs")
    parser.add_argument("--snapshot_npz", default=None,
                        help="with --stage_on_device: path for a durable "
                             "npz weight snapshot of the best-so-far "
                             "state, refreshed on the best-flush cadence "
                             "(at most every 10 min) and finalized at the "
                             "end — survives VM restarts that wipe "
                             "gitignored logs/")
    parser.add_argument("--bank_pool_dir", default=None,
                        help="with --synthetic: persistent directory for "
                             "the rotating scene-bank pool; a relaunched "
                             "run (e.g. after a device outage) reuses the "
                             "already-rendered banks instead of starting "
                             "from one. Banks must have been rendered with "
                             "the same scene config.")
    C.add_cli_overrides(parser, C.HParams())
    args = parser.parse_args(argv)

    hp = C.PRESETS[args.preset](EXPERIMENT_NAME=args.experiment)
    hp = C.apply_cli_overrides(hp, args)
    if args.stage_on_device and args.restage_every:
        hp = C.staged_plateau_defaults(
            hp,
            patience_explicit=args.PLATEAU_PATIENCE is not None,
            factor_explicit=args.PLATEAU_FACTOR is not None,
        )

    # Deterministic seeding (FPC/train.py:125-137).
    if hp.DETERMINISTIC:
        np.random.seed(125)

    from fastposecnn_tpu.data.loader import PrefetchLoader
    from fastposecnn_tpu.data.nocs import NOCSDataset
    from fastposecnn_tpu.train.loop import fit

    train_dir, valid_dir = dataset_dirs(hp, args)
    if args.synthetic:
        from fastposecnn_tpu.data.nocs_writer import write_synthetic_nocs
        from fastposecnn_tpu.data.synthetic import SceneConfig

        if args.bank_pool_dir:
            tmp = pathlib.Path(args.bank_pool_dir)
            tmp.mkdir(parents=True, exist_ok=True)
        else:
            tmp = pathlib.Path(tempfile.mkdtemp(prefix="fpcnn_synth_"))
        scfg = SceneConfig(
            height=hp.IMAGE_HEIGHT, width=hp.IMAGE_WIDTH,
            num_classes=hp.num_classes, max_instances=hp.MAX_INSTANCES,
            render_pose_cues=args.synthetic_pose_cues,
            cue_boost=args.synthetic_cue_boost,
        )

        def _render_if_empty(d, n, seed):
            # Reuse only banks that finished rendering (the .complete
            # marker, nocs_writer): a bank torn by a mid-render kill
            # would otherwise be adopted and silently clamp the staged
            # trainer's device buffer below TRAIN_SIZE for the whole run.
            if d.exists() and any(d.iterdir()):
                if (d / ".complete").exists():
                    return d
                logging.getLogger("fastposecnn_tpu").warning(
                    "discarding incomplete scene bank %s "
                    "(no .complete marker — torn render?)", d)
                shutil.rmtree(d)
            write_synthetic_nocs(d, n, seed, scfg)
            return d

        train_dir = _render_if_empty(tmp / "train", args.synthetic, 0)
        valid_dir = _render_if_empty(
            tmp / "valid", max(2, args.synthetic // 4), 1
        )

        # Fresh scene geometry per restage (--stage_on_device
        # --restage_every K): a DISJOINT seed stream per bank (valid seed is
        # 1; train banks use 0 then 2,3,...) makes the effective training
        # set unbounded so the network cannot memorize a fixed scene bank.
        # Rendering a 1024-scene bank takes ~3 min on this 1-core host —
        # far more than the ~15 s of 1.4 s staged epochs between restages —
        # so a single render can NOT feed a double-buffer without stalling;
        # BankPool keeps a rotating pool of pre-rendered banks instead
        # (see data/bank_pool.py for the full design + crash consistency).
        from fastposecnn_tpu.data.bank_pool import BankPool

        bank_pool = BankPool(
            tmp, scene_count=args.synthetic,
            height=hp.IMAGE_HEIGHT, width=hp.IMAGE_WIDTH,
            num_classes=hp.num_classes, max_instances=hp.MAX_INSTANCES,
            pose_cues=args.synthetic_pose_cues,
            cue_boost=args.synthetic_cue_boost,
            initial=[tmp / "train"],
        )

        def synth_regen(epoch: int) -> None:
            train_ds.repoint(bank_pool.rotate())

        if args.stage_on_device and args.restage_every:
            bank_pool.launch()  # fill the pool during compile + epoch 0
    else:
        bank_pool = None
    if not train_dir or not valid_dir:
        raise SystemExit(
            "No dataset: set NOCS_*_DATASET env vars, pass --train_dir/"
            "--valid_dir, or use --synthetic N"
        )

    common = dict(
        dataset_name=hp.DATASET_NAME,
        selected_classes=hp.SELECTED_CLASSES,
        max_instances=hp.MAX_INSTANCES,
    )
    # Augmentation per split like the reference datamodule
    # (FPC/tools/dataset.py:578-587): photometric train pipeline, gaussian
    # noise only for valid; --no_augment disables both.
    train_ds = NOCSDataset(
        train_dir, max_size=hp.TRAIN_SIZE,
        augmentation=None if args.no_augment else "train", **common,
    )
    valid_ds = NOCSDataset(
        valid_dir, max_size=hp.VALID_SIZE,
        augmentation=None if args.no_augment else "valid", **common,
    )
    train_loader = PrefetchLoader(
        train_ds, hp.BATCH_SIZE, shuffle=not hp.DETERMINISTIC,
        num_workers=hp.NUM_WORKERS,
    )
    valid_loader = PrefetchLoader(
        valid_ds, hp.BATCH_SIZE, shuffle=False, num_workers=hp.NUM_WORKERS
    )

    inv_K = np.linalg.inv(constants.scaled_intrinsics(
        hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH))
    try:
        if args.stage_on_device:
            from fastposecnn_tpu.train.staged import fit_staged

            if hp.NUM_DEVICES > 1:
                print(
                    f"WARNING: --stage_on_device trains on a SINGLE device; "
                    f"--NUM_DEVICES {hp.NUM_DEVICES} is ignored (the "
                    f"streaming trainer supports the dp/tp mesh)."
                )

            state, run_dir = fit_staged(
                hp, train_ds, valid_ds, inv_K,
                enable_tb=not args.no_tb, num_epochs=args.epochs,
                resume_from=args.resume, restage_every=args.restage_every,
                regen_fn=synth_regen if args.synthetic else None,
                snapshot_npz=args.snapshot_npz,
            )
        else:
            state, run_dir = fit(
                hp, train_loader, valid_loader, inv_K,
                enable_tb=not args.no_tb, num_epochs=args.epochs,
                resume_from=args.resume,
            )
    finally:
        # Also on a crashed/interrupted fit: don't orphan the in-flight
        # bank render — it would keep burning host CPU and pool-dir disk.
        if bank_pool is not None:
            bank_pool.shutdown()
    print(f"run dir: {run_dir}")


if __name__ == "__main__":
    main()

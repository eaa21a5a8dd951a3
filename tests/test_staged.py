"""Device-resident staged trainer (train/staged.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastposecnn_tpu.train.staged import _val_index_plan, stage_dataset


class TestValIndexPlan:
    def test_exact_multiple(self):
        idx, valid = _val_index_plan(8, 4)
        assert idx.shape == (2, 4) and valid.sum() == 8
        np.testing.assert_array_equal(idx.reshape(-1), np.arange(8))

    def test_padded_remainder(self):
        idx, valid = _val_index_plan(5, 4)
        assert idx.shape == (2, 4)
        assert valid.reshape(-1).tolist() == [1, 1, 1, 1, 1, 0, 0, 0]
        # padded slots repeat a real index (0) but carry zero weight
        assert idx.reshape(-1)[5:].tolist() == [0, 0, 0]

    def test_fewer_than_batch(self):
        idx, valid = _val_index_plan(1, 4)
        assert idx.shape == (1, 4) and valid.sum() == 1


def test_gather_batch_zeroes_padded_agg_validity():
    """Padded val slots repeat a real index; their GT instance validity
    must be zeroed or matched pose losses / the metric bank would count
    the repeated sample once per duplicate (review finding, round 3)."""
    import jax.numpy as jnp

    from fastposecnn_tpu.train.staged import _gather_batch

    staged = {
        "image": jnp.zeros((2, 4, 4, 3), jnp.uint8),
        "mask": jnp.zeros((2, 4, 4), jnp.uint8),
        "agg": {
            "valid": jnp.asarray([[True, True], [True, False]]),
            "xy": jnp.ones((2, 2, 2)),
        },
    }
    idxs = jnp.asarray([0, 0, 0, 1], jnp.int32)
    sv = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    out = _gather_batch(staged, idxs, sv)
    np.testing.assert_array_equal(
        np.asarray(out["agg"]["valid"]),
        [[True, True], [False, False], [False, False], [True, False]],
    )


@pytest.mark.slow
def test_staged_cli_end_to_end(tmp_path, monkeypatch):
    """The staged trainer runs the full CLI path: stage -> scan-epoch ->
    plateau -> checkpoints, with finite losses, and the checkpoint is
    loadable."""
    monkeypatch.setenv("LOGS", str(tmp_path / "logs"))
    from fastposecnn_tpu.cli.train import main

    main([
        "-e", "STAGED", "--preset", "MASK_TRAINING", "--synthetic", "6",
        "--IMAGE_HEIGHT", "64", "--IMAGE_WIDTH", "64", "--BATCH_SIZE", "2",
        "--TRAIN_SIZE", "6", "--VALID_SIZE", "3", "--MAX_INSTANCES", "4",
        "--MAX_VOTE_POINTS", "128", "--HV_NUM_OF_HYPOTHESES", "32",
        "--epochs", "2", "--no_tb", "--stage_on_device",
    ])
    runs = list((tmp_path / "logs").rglob("run.log"))
    assert len(runs) == 1
    run_dir = runs[0].parent
    log = runs[0].read_text()
    assert "staged (device-resident) trainer" in log
    assert "epoch 1: val_loss=" in log
    assert not any("nan" in ln for ln in log.splitlines() if "val_loss" in ln)
    for name in ("best", "last"):
        assert (run_dir / "checkpoints" / name).exists()


def test_stage_dataset_roundtrip(tmp_path):
    """stage_dataset stacks every sample with wire dtypes preserved."""
    from fastposecnn_tpu.data.nocs import NOCSDataset
    from fastposecnn_tpu.data.nocs_writer import write_synthetic_nocs
    from fastposecnn_tpu.data.synthetic import SceneConfig

    scfg = SceneConfig(height=64, width=64, max_instances=4,
                       render_pose_cues=True)
    root = write_synthetic_nocs(tmp_path / "ds", 3, 0, scfg)
    ds = NOCSDataset(root, dataset_name="CAMERA", max_instances=4)
    staged = stage_dataset(ds)
    assert staged["image"].shape == (3, 64, 64, 3)
    assert staged["image"].dtype == np.uint8
    assert staged["mask"].dtype == np.uint8
    assert staged["agg"]["instance_masks"].dtype == np.uint8
    assert "path" not in staged


@pytest.mark.slow
def test_staged_cli_restage_regenerates_fresh_scenes(tmp_path, monkeypatch):
    """--restage_every with --synthetic must swap in FRESH scene geometry
    (async double-buffered banks), not merely re-augment the same bank:
    round 3 showed a fixed bank memorizes (train CE falls, val climbs)."""
    monkeypatch.setenv("LOGS", str(tmp_path / "logs"))
    from fastposecnn_tpu.cli.train import main

    main([
        "-e", "REGEN", "--preset", "MASK_TRAINING", "--synthetic", "4",
        "--IMAGE_HEIGHT", "64", "--IMAGE_WIDTH", "64", "--BATCH_SIZE", "2",
        "--TRAIN_SIZE", "4", "--VALID_SIZE", "2", "--MAX_INSTANCES", "4",
        "--MAX_VOTE_POINTS", "128", "--HV_NUM_OF_HYPOTHESES", "32",
        "--epochs", "3", "--no_tb", "--stage_on_device",
        "--restage_every", "2", "--CKPT_SAVE_FREQUENCY", "100",
    ])
    log = next((tmp_path / "logs").rglob("run.log")).read_text()
    assert "restaged 4 train samples (4 generated) at epoch 2" in log
    # the restage read ran on the background prefetch thread
    assert "background prefetch" in log
    # Outage resilience: the pending best is persisted BEFORE the restage
    # pause, so a tunnel loss mid-restage costs at most one cycle (ROT9).
    assert "flushed best checkpoint before restage at epoch 2" in log


@pytest.mark.slow
def test_staged_cli_snapshot_npz_written_mid_run(tmp_path, monkeypatch):
    """--snapshot_npz must produce a durable npz of the best state DURING
    the run (on the best-flush cadence), not only at the end: two
    near-complete chunks died between per-chunk snapshot commits (S5c2 at
    epoch 193/250, FULL_c2 at 199/200 — round-4 VERDICT weak #3), so a
    kill at any point must leave a restorable snapshot on disk."""
    monkeypatch.setenv("LOGS", str(tmp_path / "logs"))
    from fastposecnn_tpu.cli.train import main

    snap = tmp_path / "snap.npz"
    main([
        "-e", "SNAP", "--preset", "MASK_TRAINING", "--synthetic", "4",
        "--IMAGE_HEIGHT", "64", "--IMAGE_WIDTH", "64", "--BATCH_SIZE", "2",
        "--TRAIN_SIZE", "4", "--VALID_SIZE", "2", "--MAX_INSTANCES", "4",
        "--MAX_VOTE_POINTS", "128", "--HV_NUM_OF_HYPOTHESES", "32",
        "--epochs", "3", "--no_tb", "--stage_on_device",
        "--restage_every", "2", "--CKPT_SAVE_FREQUENCY", "100",
        "--snapshot_npz", str(snap),
    ])
    log = next((tmp_path / "logs").rglob("run.log")).read_text()
    # mid-run write from the async flush worker (restage-boundary best
    # flush at epoch 2), distinct from the epilogue's final write
    assert "durable npz snapshot refreshed" in log
    assert "final durable npz snapshot" in log
    assert snap.exists()

    # the snapshot restores into a fresh state (full load path)
    import dataclasses

    import jax

    from fastposecnn_tpu import config as C
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.train import checkpoint as ckpt
    from fastposecnn_tpu.train import optim
    from fastposecnn_tpu.train.task import create_train_state

    hp = ckpt.merge_arch_from_any(snap, C.evaluating())
    hp = dataclasses.replace(hp, IMAGE_HEIGHT=64, IMAGE_WIDTH=64)
    net = PoseRegressorNet(num_classes=hp.num_classes,
                           encoder_name=hp.ENCODER)
    state = create_train_state(
        net, optim.make_optimizer(hp), jax.random.key(0), hp)
    state, hp = ckpt.load_npz_snapshot(snap, state, hp)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state.params))


def test_stage_dataset_parallel_matches_serial(tmp_path):
    """Multi-worker staging must be byte-identical to serial staging:
    augmentation draws are keyed on (seed, epoch, index), never on worker
    partitioning."""
    from fastposecnn_tpu.data.nocs import NOCSDataset
    from fastposecnn_tpu.data.nocs_writer import write_synthetic_nocs
    from fastposecnn_tpu.data.synthetic import SceneConfig

    scfg = SceneConfig(height=64, width=64, max_instances=4,
                       render_pose_cues=True)
    root = write_synthetic_nocs(tmp_path / "ds", 5, 0, scfg)
    ds = NOCSDataset(root, dataset_name="CAMERA", max_instances=4,
                     augmentation="train")
    ds.epoch = 3
    serial = stage_dataset(ds, num_workers=1)
    parallel = stage_dataset(ds, num_workers=2)
    assert serial.keys() == parallel.keys()
    np.testing.assert_array_equal(serial["image"], parallel["image"])
    np.testing.assert_array_equal(serial["mask"], parallel["mask"])
    for k in serial["agg"]:
        np.testing.assert_array_equal(serial["agg"][k], parallel["agg"][k])


@pytest.mark.slow
def test_bank_pool_dir_persists_across_runs(tmp_path, monkeypatch):
    """--bank_pool_dir: a relaunched run adopts already-rendered banks
    (outage-restart workflow) instead of re-rendering from scratch; seed
    numbering continues after the adopted banks and skips the reserved
    held-out seed 99."""
    monkeypatch.setenv("LOGS", str(tmp_path / "logs"))
    from fastposecnn_tpu.cli.train import main

    pool_dir = tmp_path / "pool"
    args = [
        "--preset", "MASK_TRAINING", "--synthetic", "4",
        "--IMAGE_HEIGHT", "64", "--IMAGE_WIDTH", "64", "--BATCH_SIZE", "2",
        "--TRAIN_SIZE", "4", "--VALID_SIZE", "2", "--MAX_INSTANCES", "4",
        "--MAX_VOTE_POINTS", "128", "--HV_NUM_OF_HYPOTHESES", "32",
        "--epochs", "3", "--no_tb", "--stage_on_device",
        "--restage_every", "2", "--CKPT_SAVE_FREQUENCY", "100",
        "--bank_pool_dir", str(pool_dir),
    ]
    main(["-e", "POOL1"] + args)
    banks_after_first = {d.name for d in pool_dir.glob("bank_[0-9]*")
                         if not d.name.endswith(".part")}
    assert (pool_dir / "train").exists() and (pool_dir / "valid").exists()
    # a fake orphaned partial render must be cleared on relaunch
    (pool_dir / "bank_7.part").mkdir()
    main(["-e", "POOL2"] + args)
    assert not (pool_dir / "bank_7.part").exists()
    banks_after_second = {d.name for d in pool_dir.glob("bank_[0-9]*")
                          if not d.name.endswith(".part")}
    # the second run adopted (did not delete) the first run's banks
    assert banks_after_first <= banks_after_second
    logs = sorted((tmp_path / "logs").rglob("run.log"))
    assert len(logs) == 2


def test_stage_dataset_persistent_pool_tracks_epoch_and_repoint(tmp_path):
    """The staged trainer's long-lived fork pool (forked ONCE, before the
    async flush thread exists) must follow later epoch advances and bank
    repoints in the parent — each task ships (index, epoch, dataset_dir)."""
    from concurrent.futures import ProcessPoolExecutor

    from fastposecnn_tpu.data.loader import _init_worker
    from fastposecnn_tpu.data.nocs import NOCSDataset
    from fastposecnn_tpu.data.nocs_writer import write_synthetic_nocs
    from fastposecnn_tpu.data.synthetic import SceneConfig

    scfg = SceneConfig(height=64, width=64, max_instances=4,
                       render_pose_cues=True)
    bank1 = write_synthetic_nocs(tmp_path / "b1", 4, 0, scfg)
    bank2 = write_synthetic_nocs(tmp_path / "b2", 4, 5, scfg)
    ds = NOCSDataset(bank1, dataset_name="CAMERA", max_instances=4,
                     augmentation="train")
    pool = ProcessPoolExecutor(2, initializer=_init_worker, initargs=(ds,))
    try:
        ds.epoch = 1
        pooled = stage_dataset(ds, pool=pool)
        serial = stage_dataset(ds)
        np.testing.assert_array_equal(pooled["image"], serial["image"])
        # advance epoch AND repoint at a different bank after the fork
        ds.repoint(bank2)
        ds.epoch = 2
        pooled2 = stage_dataset(ds, pool=pool)
        serial2 = stage_dataset(ds)
        np.testing.assert_array_equal(pooled2["image"], serial2["image"])
        assert not np.array_equal(pooled["image"], pooled2["image"])
    finally:
        pool.shutdown()


class TestTransferIntegrity:
    """verified_device_put (round-5 FULL_c6 incident: a ~1 GB staged
    upload through a freshly restarted tunnel arrived corrupted and the
    trainer ran 50 epochs on garbage before anyone noticed)."""

    def _tree(self):
        rng = np.random.default_rng(0)
        return {
            "image": rng.integers(0, 255, (4, 8, 8, 3), dtype=np.uint8),
            "mask": rng.integers(0, 6, (4, 8, 8), dtype=np.int32),
            "agg": {"xy": rng.standard_normal((4, 2)).astype(np.float32)},
            "flag": np.array([True, False, True, False]),
        }

    def test_checksums_match_after_clean_put(self):
        import logging

        from fastposecnn_tpu.train.staged import (
            device_checksums,
            host_checksums,
            verified_device_put,
        )

        tree = self._tree()
        want = host_checksums(tree)
        dev = jax.device_put(tree)
        got = np.asarray(jax.device_get(device_checksums(dev)))
        np.testing.assert_array_equal(got.astype(np.uint64), want)
        # the full wrapper accepts a clean put first try
        out = verified_device_put(tree, "test", logging.getLogger("t"))
        np.testing.assert_array_equal(
            np.asarray(out["image"]), tree["image"]
        )

    def test_checksum_detects_any_corruption(self):
        from fastposecnn_tpu.train.staged import (
            device_checksums,
            host_checksums,
        )

        tree = self._tree()
        want = host_checksums(tree)
        # flip one bit in one float leaf
        bad = jax.tree.map(np.copy, tree)
        raw = bad["agg"]["xy"].view(np.uint8).reshape(-1)
        raw[5] ^= 0x10
        got = np.asarray(
            jax.device_get(device_checksums(jax.device_put(bad)))
        ).astype(np.uint64)
        assert not np.array_equal(got, want)
        assert int((got != want).sum()) == 1  # localized to that array

    def test_verified_put_raises_after_persistent_mismatch(self, monkeypatch):
        import logging

        from fastposecnn_tpu.train import staged

        tree = self._tree()
        corrupt = jax.tree.map(np.copy, tree)
        corrupt["image"][0, 0, 0, 0] ^= 0xFF
        monkeypatch.setattr(
            staged.jax, "device_put", lambda t: jax.tree.map(jnp.asarray, corrupt)
        )
        with pytest.raises(RuntimeError, match="corrupted"):
            staged.verified_device_put(
                tree, "test", logging.getLogger("t"), attempts=2
            )

"""Device-resident epoch trainer: stage the dataset in HBM, scan an epoch.

Why this exists: through a remote-attached TPU (this sandbox's axon
tunnel) every `train_step(state, batch, ...)` dispatch pays a host->device
round trip plus the batch upload (~3 s wall vs ~25 ms device compute —
BASELINE.md round-2 training note). For datasets that fit in HBM (the
synthetic NOCS sets used for the on-chip training demonstrations: 512
scenes at 240x320 is ~350 MB in uint8 wire format) the whole epoch can be
ONE jitted program: a `lax.scan` over shuffled index batches whose body is
the ordinary train step, gathering each batch out of the staged arrays on
device. Tunnel cost then amortizes to one dispatch + one log fetch per
EPOCH instead of per step.

This is not a sandbox hack; it is the standard TPU-native pattern for
small/medium datasets (device-side data echoing): keep the data where the
FLOPs are, ship only a permutation per epoch.

Semantics vs train/loop.py::fit (the streaming trainer):
  - identical train/eval step functions (train/task.py) — the scan body IS
    the jitted step, so losses/metrics/grad-watchdog behave identically;
  - per-step train logs are still recorded (fetched stacked once per
    epoch, then written to TB with their true step indices);
  - plateau LR, best/periodic/last checkpoints, epoch averages: same;
  - augmentation is materialized at staging time; pass
    `restage_every=K` to re-draw the augmentation pipelines every K
    epochs (host re-stage + re-upload, still amortized over K epochs);
  - the final short train batch is DROPPED (standard drop-last shuffle
    semantics) while validation pads its last batch with sample_valid=0
    slots so every real sample is counted exactly once;
  - fault capture: non-finite-grad steps are detected from the fetched
    logs and the offending batch is reconstructed from the host copy of
    the staged arrays + the epoch permutation, then saved for
    scripts/replay_fault.py like the streaming path.

Parity: FPC/train.py:237-333 Trainer.fit semantics (epochs, val cadence,
checkpoint_on val loss) — the reference has no equivalent of this data
path (its DataLoader streams from disk every step).
"""

from __future__ import annotations

import pathlib
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastposecnn_tpu import metrics as M
from fastposecnn_tpu.config import HParams, pipeline_config_from
from fastposecnn_tpu.models import PoseRegressorNet
from fastposecnn_tpu.train import checkpoint as ckpt
from fastposecnn_tpu.train import optim
from fastposecnn_tpu.train.task import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from fastposecnn_tpu.train.loop import make_run_dir
from fastposecnn_tpu.utils.tb import RunLogger


def host_checksums(tree) -> np.ndarray:
    """Per-leaf byte-sum checksum (mod 2^32) of a host pytree."""
    return np.array(
        [
            np.asarray(leaf).view(np.uint8).sum(dtype=np.uint64)
            & np.uint64(0xFFFFFFFF)
            for leaf in jax.tree.leaves(tree)
        ],
        np.uint64,
    )


@jax.jit
def device_checksums(tree):
    """Same checksum computed on device: reads the staged bytes at HBM
    bandwidth and returns one u32 per array — far cheaper than fetching
    the staged gigabyte back over a remote attachment."""
    sums = []
    for leaf in jax.tree.leaves(tree):
        x = leaf
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.uint8)
        if x.dtype != jnp.uint8:
            x = jax.lax.bitcast_convert_type(x, jnp.uint8)
        sums.append(jnp.sum(x, dtype=jnp.uint32))
    return jnp.stack(sums)


def verified_device_put(host_tree, what: str, log, attempts: int = 3):
    """device_put with end-to-end transfer verification + retry.

    Round-5 incident (FULL_c6, 00:19 UTC): after a host-VM restart, the
    freshly staged ~1 GB upload left the on-device data corrupted —
    epoch-0 val_loss 5.69 / val geodesic 71 deg from a checkpoint whose
    SAME weights + SAME valid bank measured 1.56 / ~22 deg on the host
    (scripts/diag_resume.py), and the clip-saturated gradients off the
    garbage samples dragged params a median 17% within 10 epochs. A
    byte-sum mismatch catches any such corruption before a single train
    step runs on it.
    """
    want = host_checksums(host_tree)
    for attempt in range(1, attempts + 1):
        dev = jax.device_put(host_tree)
        got = np.asarray(jax.device_get(device_checksums(dev))).astype(
            np.uint64
        )
        if np.array_equal(got, want):
            if attempt > 1:
                log.warning(
                    "staged %s upload verified on retry %d", what, attempt
                )
            return dev
        bad = int((got != want).sum())
        log.warning(
            "staged %s upload FAILED checksum (attempt %d/%d): %d/%d "
            "arrays corrupted in transfer — retrying",
            what, attempt, attempts, bad, len(want),
        )
        del dev
    raise RuntimeError(
        f"staged {what} upload corrupted {attempts} times in a row — "
        "device/tunnel unhealthy, refusing to train on garbage"
    )


def stage_dataset(ds, num_workers: int = 1, pool=None) -> Optional[dict]:
    """Materialize every sample of a NOCSDataset into stacked host arrays
    (compact wire dtypes preserved: uint8 images/masks).

    num_workers > 1 materializes samples in forked worker processes (the
    same mechanism as PrefetchLoader's process backend — numpy/C augment
    work holds or bypasses the GIL, threads don't scale it). Restage time
    is the staged trainer's per-cycle overhead, so on multi-core hosts
    this divides the one host-bound cost the scan-epoch path has left.
    Augmentation draws are keyed on (seed, epoch, index), so worker
    partitioning cannot change the result; set ds.epoch BEFORE calling.

    Pass `pool` (a ProcessPoolExecutor whose workers were initialized with
    this dataset) to reuse a PERSISTENT pool instead of forking per call:
    required inside fit_staged, where a late fork would race the async
    checkpoint-flush thread (a child forked mid-device_get inherits locked
    JAX/allocator mutexes). Each task ships (index, epoch, dataset_dir) so
    long-lived workers track epoch advances and bank repoints."""
    from fastposecnn_tpu.data.nocs import collate

    if pool is not None:
        from fastposecnn_tpu.data.loader import _worker_stage_get

        epoch = getattr(ds, "epoch", None)
        root = getattr(ds, "dataset_dir", None)
        samples = list(
            pool.map(
                _worker_stage_get,
                [(i, epoch, root) for i in range(len(ds))],
                chunksize=max(1, len(ds) // (pool._max_workers * 8)),
            )
        )
    elif num_workers > 1:
        from concurrent.futures import ProcessPoolExecutor

        from fastposecnn_tpu.data.loader import _init_worker, _worker_get

        with ProcessPoolExecutor(
            num_workers, initializer=_init_worker, initargs=(ds,)
        ) as tpool:
            samples = list(
                tpool.map(
                    _worker_get,
                    range(len(ds)),
                    chunksize=max(1, len(ds) // (num_workers * 8)),
                )
            )
    else:
        samples = [ds[i] for i in range(len(ds))]
    batch = collate(samples)
    if batch is None:
        return None
    batch.pop("path", None)
    return batch


def _gather_batch(staged, idxs, sample_valid):
    agg = {k: v[idxs] for k, v in staged["agg"].items()}
    # Padded validation slots repeat a REAL sample index (so shapes stay
    # static); sample_valid masks the pixel-wise losses, but the matched
    # pose losses and the metric bank are gated by agg['valid'] — zero it
    # for padded slots or the repeated sample's instances would be counted
    # once per duplicate.
    agg["valid"] = agg["valid"] & (sample_valid > 0.5)[:, None]
    return {
        "image": staged["image"][idxs],
        "mask": staged["mask"][idxs],
        "agg": agg,
        "sample_valid": sample_valid,
    }


def _val_index_plan(n: int, batch_size: int):
    """Pad validation indices to a whole number of batches; padded slots
    repeat index 0 with sample_valid=0 so they contribute nothing."""
    nb = max(1, -(-n // batch_size))
    idxs = np.zeros((nb * batch_size,), np.int32)
    idxs[:n] = np.arange(n, dtype=np.int32)
    valid = np.zeros((nb * batch_size,), np.float32)
    valid[:n] = 1.0
    return idxs.reshape(nb, batch_size), valid.reshape(nb, batch_size)


def fit_staged(
    hp: HParams,
    train_ds,
    valid_ds,
    inv_intrinsics,
    run_dir: Optional[pathlib.Path] = None,
    enable_tb: bool = True,
    num_epochs: Optional[int] = None,
    resume_from: Optional[str] = None,
    restage_every: int = 0,
    regen_fn=None,
    log_cb=None,
    snapshot_npz: Optional[str] = None,
    snapshot_every_s: float = 600.0,
):
    """Device-resident counterpart of train/loop.py::fit. Returns
    (final_state, run_dir).

    snapshot_npz: path for a durable git-committable npz weight snapshot
    (train/checkpoint.py::save_npz_snapshot) of the best-so-far state,
    refreshed on the best-flush cadence but at most every
    `snapshot_every_s` seconds (npz compression is host CPU the restage
    renderer also needs), and always once more at the end with the final
    best. Rationale: orbax checkpoints live under gitignored logs/ and VM
    restarts have destroyed trained weights twice (rounds 3+4) plus two
    near-complete chunks that died between per-chunk snapshot commits
    (S5c2 at 193/250, FULL_c2 at 199/200). With this, a kill loses at
    most `snapshot_every_s` of training — the evidence ticker commits the
    file on the same cadence.
    """
    run_dir = run_dir or make_run_dir(hp)
    hp.save(run_dir / "HPARAM.json")
    logger = RunLogger(run_dir, enabled=enable_tb)

    import logging

    flog = logging.getLogger("fastposecnn_tpu")
    flog.setLevel(logging.INFO)
    fh = logging.FileHandler(run_dir / "run.log")
    fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    flog.addHandler(fh)
    # jax/absl install root handlers; propagation would emit every epoch
    # line a second time on stderr (the console copy is the print() below),
    # doubling captured chunk logs (round-4 ADVICE.md).
    flog.propagate = False
    flog.info("hparams: %s", hp.to_json().replace("\n", " "))
    flog.info("staged (device-resident) trainer")

    net = PoseRegressorNet(
        num_classes=hp.num_classes,
        encoder_name=hp.ENCODER,
        dtype=jnp.bfloat16
        if (hp.COMPUTE_DTYPE == "bfloat16" and jax.default_backend() == "tpu")
        else jnp.float32,
        z_bias_init=hp.HEAD_Z_BIAS_INIT,
        scales_bias_init=hp.HEAD_SCALES_BIAS_INIT,
    )
    pcfg = pipeline_config_from(hp)
    optimizer = optim.make_optimizer(hp)
    state = create_train_state(net, optimizer, jax.random.key(0), hp)
    if resume_from:
        state, hp = ckpt.load_any_checkpoint(
            resume_from, state, hp, optimizer=optimizer
        )

    train_step = make_train_step(net, optimizer, hp, pcfg, inv_intrinsics)
    eval_step = make_eval_step(net, hp, pcfg, inv_intrinsics)
    batch_size = hp.BATCH_SIZE
    full_valid = jnp.ones((batch_size,), jnp.float32)

    def train_epoch(state, staged, perm, rng):
        """perm: [nb, B] int32. Returns (state, stacked per-step logs)."""

        def body(st, idxs):
            st2, logs = train_step(
                st, _gather_batch(staged, idxs, full_valid), rng
            )
            # Carry-dtype guard: under jax_enable_x64 stray f64 promotion
            # anywhere in the step would change the carry type and abort
            # the scan; pin the output to the input dtypes (no-op in the
            # normal f32/bf16 configuration).
            st2 = jax.tree.map(lambda a, b: a.astype(b.dtype), st2, st)
            return st2, logs

        return jax.lax.scan(body, state, perm)

    def valid_epoch(state, staged, idx_plan, valid_plan, bank, rng):
        """Returns (bank, stacked logs). The dense pipeline outputs are
        dropped inside the scan body, so XLA never materializes them
        per-batch."""

        def body(bank, inp):
            idxs, sv = inp
            logs, bank, _ = eval_step(
                state, _gather_batch(staged, idxs, sv), rng, bank
            )
            return bank, logs

        return jax.lax.scan(body, bank, (idx_plan, valid_plan))

    # No buffer donation: a freshly-initialized TrainState can alias
    # identical zero-filled buffers across leaves (step/skipped_updates/
    # zero moments), which XLA rejects as double-donation.
    train_epoch_j = jax.jit(train_epoch)
    valid_epoch_j = jax.jit(valid_epoch)

    # ---- stage the data ----
    # Restage forks must NOT happen after the async flush thread exists (a
    # child forked mid-device_get inherits locked JAX/allocator mutexes):
    # the worker pool forks ONCE here, up front, and every restage ships
    # (epoch, bank dir) into the long-lived workers instead.
    stage_pool = None
    if hp.NUM_WORKERS > 1:
        from concurrent.futures import ProcessPoolExecutor

        from fastposecnn_tpu.data.loader import _init_worker

        stage_pool = ProcessPoolExecutor(
            hp.NUM_WORKERS, initializer=_init_worker, initargs=(train_ds,)
        )

    def stage_host(split_epoch):
        if regen_fn is not None and split_epoch:
            # Regenerate the backing scenes themselves (fresh geometry, not
            # just fresh augmentation draws): with a generative source the
            # effective dataset is infinite, which is what defeats the
            # 512-scene memorization observed in the round-3 ROT runs
            # (train CE 0.27->0.06 while val climbed 2.5->3.3).
            regen_fn(split_epoch)
        train_ds.epoch = split_epoch  # advances augmentation draws
        host_train = stage_dataset(train_ds, pool=stage_pool)
        if host_train is None:
            raise SystemExit("staged trainer: empty training dataset")
        return host_train

    def put_verified(host_tree, what, attempts=3):
        return verified_device_put(host_tree, what, flog, attempts=attempts)

    def stage(split_epoch):
        host_train = stage_host(split_epoch)
        return host_train, put_verified(host_train, "train")

    # Restage prefetch: the host-side staging read (bank rotate + decode +
    # augment + collate, ~35-450 s on this 1-core host) runs on a
    # background thread DURING the K epochs of device training before the
    # restage consumes it, so the restage pause shrinks to the device
    # upload. The thread only mutates train_ds (which nothing touches
    # between restages) and submits to the long-lived fork pool; it never
    # forks, so it cannot race the async checkpoint-flush thread. Samples
    # are keyed on (seed, epoch, index), so prefetching early is
    # bit-identical to staging at the restage point.
    prefetch_thread: Optional[threading.Thread] = None
    prefetch_box: dict = {}

    def prefetch_async(split_epoch):
        nonlocal prefetch_thread

        def work():
            t0 = time.perf_counter()
            try:
                host = stage_host(split_epoch)
                prefetch_box["host"] = host
                prefetch_box["seconds"] = time.perf_counter() - t0
            except BaseException as exc:  # noqa: BLE001 — surfaced at join
                prefetch_box["error"] = exc

        prefetch_box.clear()
        prefetch_thread = threading.Thread(target=work, daemon=True)
        prefetch_thread.start()

    t0 = time.perf_counter()
    # Valid is staged once, before any flush thread can exist — a
    # transient fork pool is still safe here.
    host_valid = stage_dataset(valid_ds, num_workers=hp.NUM_WORKERS)
    host_train, dev_train = stage(0)
    dev_valid = put_verified(host_valid, "valid") if host_valid else None
    n_train = host_train["image"].shape[0]
    n_valid = host_valid["image"].shape[0] if host_valid else 0
    nbytes = sum(
        x.nbytes for x in jax.tree.leaves((host_train, host_valid or {}))
    )
    flog.info(
        "staged %d train + %d valid samples (%.1f MB wire) in %.1f s",
        n_train, n_valid, nbytes / 1e6, time.perf_counter() - t0,
    )
    if n_train < batch_size:
        raise SystemExit(
            f"staged trainer: TRAIN_SIZE ({n_train}) < BATCH_SIZE "
            f"({batch_size}) — nothing to scan after drop-last"
        )

    val_idx, val_valid = (
        _val_index_plan(n_valid, batch_size) if n_valid else (None, None)
    )
    nb_train = n_train // batch_size

    plateau = optim.plateau_init()
    best_val = float("inf")
    best_state = None
    best_step = 0
    best_ref, best_ref_step = None, 0
    last_flush_t = time.perf_counter()
    rng = jax.random.key(42)
    ckpt_dir = run_dir / "checkpoints"
    shuffle_rng = np.random.default_rng(42)

    # Checkpoint flushes run on a background thread: the save's device_get
    # of the full TrainState costs ~30-60 s through a remote-attached chip
    # while the epochs it would block are ~1.4 s each. States are immutable
    # pytrees of on-device buffers, so snapshotting is free and training
    # can keep dispatching while the fetch drains. One worker, FIFO: a new
    # flush joins the previous one first (bounds live HBM copies to ~1
    # extra state), and the epilogue joins before the final saves.
    flush_thread: Optional[threading.Thread] = None
    last_snapshot_t = [0.0]  # epoch-0 flush writes the first snapshot

    def flush_async(jobs):
        nonlocal flush_thread
        prev = flush_thread

        def work():
            if prev is not None:
                prev.join()
            for tag, step_, st in jobs:
                try:
                    # One host fetch feeds both the orbax save and the npz
                    # snapshot (each ~30-60 s of device_get over a
                    # remote-attached chip if done separately).
                    st_h = jax.device_get(st)
                    ckpt.save_checkpoint(ckpt_dir / tag, step_, st_h, hp)
                    if (
                        snapshot_npz
                        and tag == "best"
                        and time.perf_counter() - last_snapshot_t[0]
                        > snapshot_every_s
                    ):
                        ckpt.save_npz_snapshot(snapshot_npz, st_h, hp)
                        last_snapshot_t[0] = time.perf_counter()
                        flog.info(
                            "durable npz snapshot refreshed (step %d): %s",
                            step_, snapshot_npz,
                        )
                except Exception:  # noqa: BLE001
                    flog.exception("async checkpoint flush (%s) failed", tag)

        flush_thread = threading.Thread(target=work, daemon=True)
        flush_thread.start()

    total_epochs = num_epochs or hp.NUM_EPOCHS
    if restage_every and restage_every < total_epochs:
        prefetch_async(restage_every)

    for epoch in range(total_epochs):
        if restage_every and epoch and epoch % restage_every == 0:
            # Persist the pending best BEFORE the restage pause: a tunnel
            # outage mid-restage (the round-3 ROT9 loss — 10 epochs of the
            # first monotone rotation improvement gone before any flush)
            # can then cost at most one restage cycle of progress. The
            # ~30 s device_get is amortized against the multi-minute
            # fresh-bank render the restage waits on anyway.
            if best_state is not None:
                flush_async([("best", best_step, best_state)])
                best_state = None
                last_flush_t = time.perf_counter()
                flog.info("flushed best checkpoint before restage at epoch %d",
                          epoch)
            restage_t0 = time.perf_counter()
            if prefetch_thread is not None:
                prefetch_thread.join()
                prefetch_thread = None
                host_train = prefetch_box.pop("host", None)
                bg_s = prefetch_box.pop("seconds", 0.0)
                if host_train is None:
                    flog.warning(
                        "background restage prefetch failed (%r); restaging "
                        "synchronously", prefetch_box.pop("error", None),
                    )
                    host_train = stage_host(epoch)
            else:
                bg_s = 0.0
                host_train = stage_host(epoch)
            # A regenerated split may collate to a different sample count
            # (z<=0 scene rejection). The staged arrays' leading dim is a
            # jit input shape — letting it drift would recompile the epoch
            # program (minutes over a remote-attached chip) — so pin it to
            # the original count by cyclic resampling.
            n_new = host_train["image"].shape[0]
            if n_new != n_train:
                idx = np.resize(np.arange(n_new), n_train)
                host_train = jax.tree.map(lambda a: a[idx], host_train)
            dev_train = put_verified(host_train, "train")
            flog.info(
                "restaged %d train samples (%d generated) at epoch %d in "
                "%.1f s (background prefetch %.1f s)",
                n_train, n_new, epoch, time.perf_counter() - restage_t0, bg_s,
            )
            nxt = epoch + restage_every
            if nxt < total_epochs:
                prefetch_async(nxt)

        epoch_t0 = time.perf_counter()
        host_step0 = int(jax.device_get(state.step))
        perm = shuffle_rng.permutation(n_train)[: nb_train * batch_size]
        perm = perm.astype(np.int32).reshape(nb_train, batch_size)
        rng, sub = jax.random.split(rng)
        state, step_logs = train_epoch_j(state, dev_train, perm, sub)

        bank = M.init_pose_metric_bank()
        if n_valid:
            rng_eval = jax.random.key(epoch)
            bank, val_logs_st = valid_epoch_j(
                state, dev_valid, val_idx, val_valid, bank, rng_eval
            )

        # One fetch for the whole epoch's logs (train + valid + bank).
        fetched = jax.device_get(
            (step_logs, val_logs_st if n_valid else {}, bank)
        )
        step_logs_h, val_logs_h, bank_h = fetched
        dt = time.perf_counter() - epoch_t0

        # Per-step TB entries with true step indices, like the streaming
        # path (buffered there, batch-written here).
        for i in range(nb_train):
            logger.log_metrics(
                "train",
                {k: float(v[i]) for k, v in step_logs_h.items()},
                host_step0 + i + 1,
            )
            if step_logs_h.get("grad/finite", np.ones(nb_train))[i] < 1.0:
                path = run_dir / f"fault_batch_step{host_step0 + i + 1}.npz"
                fault = {
                    "image": host_train["image"][perm[i]],
                    "mask": host_train["mask"][perm[i]],
                    **{
                        f"agg_{k}": v[perm[i]]
                        for k, v in host_train["agg"].items()
                    },
                }
                np.savez_compressed(path, **fault)
                flog.warning(
                    "non-finite gradients at step %d; batch saved to %s",
                    host_step0 + i + 1, path,
                )
        host_step = host_step0 + nb_train
        logger.log_metrics(
            "train",
            {
                "throughput/images_per_s": nb_train * batch_size / max(dt, 1e-9),
                "optim/lr_scale": float(plateau.scale),
            },
            host_step,
            accumulate=False,
        )
        logger.log_epoch_average("train", epoch)

        pose_vals = {}
        if n_valid:
            nbv = val_idx.shape[0]
            for i in range(nbv):
                logger.log_metrics(
                    "valid",
                    {k: float(v[i]) for k, v in val_logs_h.items()},
                    host_step,
                )
            pose_vals = {
                f"pose/{k}": float(v)
                for k, v in M.compute_pose_metric_bank(bank_h).items()
            }
            logger.log_metrics("valid", pose_vals, host_step, accumulate=False)
            logger.log_epoch_average("valid", epoch)
            # Per-batch losses weighted by that batch's real-sample count.
            w = val_valid.sum(axis=1)
            val_loss = float(
                np.average(val_logs_h["pose/total_loss"], weights=w)
            )
        else:
            val_loss = float(np.mean(step_logs_h["pose/total_loss"]))

        plateau = optim.plateau_update(
            plateau, jnp.asarray(val_loss),
            patience=hp.PLATEAU_PATIENCE, factor=hp.PLATEAU_FACTOR,
            min_scale=hp.PLATEAU_MIN_SCALE,
        )
        state = state._replace(
            opt_state=optim.set_lr_scale(state.opt_state, plateau.scale)
        )

        # Checkpoints: a disk save device_gets the full TrainState, which
        # through a remote-attached chip costs ~30 s — far more than the
        # 0.4 s epoch itself. So the best state is kept as on-device
        # references (states are immutable pytrees; no copy) and flushed to
        # disk only on the periodic cadence and at the end.
        if val_loss < best_val:
            best_val = val_loss
            best_state, best_step = state, int(jax.device_get(state.step))
            # Kept across flushes (best_state is cleared once written) so
            # the epilogue snapshot is always the run's true best; device
            # pytree references, so this retains ≤1 extra state in HBM.
            best_ref, best_ref_step = state, best_step
        # Flush on the periodic epoch cadence OR a 10-minute wall-clock
        # cadence, whichever fires first: with CKPT_SAVE_FREQUENCY sized
        # for cheap staged epochs (hundreds), a killed run would otherwise
        # leave NOTHING on disk (the round-3 ROT3B_S2 kill lost 25 epochs).
        # epoch == 0: always put SOMETHING on disk within the first epoch
        # so an early outage never leaves an empty checkpoints/ dir.
        flush_due = (
            epoch == 0
            or (epoch + 1) % hp.CKPT_SAVE_FREQUENCY == 0
            or time.perf_counter() - last_flush_t > 600.0
        )
        if flush_due:
            last_flush_t = time.perf_counter()
            jobs = [("periodic", host_step, state)]
            # At epoch 0 the periodic ckpt IS the best (first epoch always
            # improves on inf); skip the duplicate best save there so the
            # device_get cost is paid once and the pending best still
            # rides the next restage-boundary / cadence flush.
            if best_state is not None and epoch > 0:
                jobs.append(("best", best_step, best_state))
                best_state = None  # flushed
            flush_async(jobs)
        train_means = {
            ("d_" + k.split("/")[0] if k.endswith("loss_dense")
             else k.split("/")[-1]): float(np.mean(v))
            for k, v in step_logs_h.items()
            if k in ("quaternion/loss_quat", "xy/loss_xy", "z/loss_z",
                     "scales/loss_scales", "mask/loss_ce",
                     "pose/num_matched", "quaternion/loss_dense",
                     "xy/loss_dense", "z/loss_dense", "scales/loss_dense")
        }
        msg = (
            f"epoch {epoch}: val_loss={val_loss:.4f} "
            f"lr_scale={float(plateau.scale):.4f} "
            f"skipped={int(jax.device_get(state.skipped_updates))} "
            f"epoch_s={dt:.1f} "
            + " ".join(f"t_{k}={v:.3f}" for k, v in train_means.items())
            + " "
            + " ".join(
                f"{k.split('/')[-1]}={v:.2f}" for k, v in pose_vals.items()
            )
        )
        print(msg, flush=True)
        flog.info(msg)
        if log_cb is not None:
            log_cb(epoch, val_loss, pose_vals)

    if stage_pool is not None:
        # On abnormal exits concurrent.futures' atexit hook reaps the
        # workers; this is the normal-path cleanup.
        stage_pool.shutdown()
    if flush_thread is not None:
        flush_thread.join()
    if best_state is not None:
        ckpt.save_checkpoint(ckpt_dir / "best", best_step, best_state, hp)
    ckpt.save_checkpoint(ckpt_dir / "last", int(state.step), state, hp)
    if snapshot_npz and best_ref is not None:
        # Final durable snapshot of the run's true best — lets chunk
        # drivers skip a separate ~4-min ckpt_snapshot.py jax-import just
        # to re-read checkpoints/best from disk.
        ckpt.save_npz_snapshot(snapshot_npz, jax.device_get(best_ref), hp)
        flog.info("final durable npz snapshot (step %d): %s",
                  best_ref_step, snapshot_npz)
    import dataclasses

    logger.log_hparams(dataclasses.asdict(hp), {"best_val_loss": best_val})
    logger.close()
    return state, run_dir

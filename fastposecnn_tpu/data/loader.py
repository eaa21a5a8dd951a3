"""Host-side batching + prefetch loader.

Replaces torch DataLoader(NUM_WORKERS=...) (FPC/tools/dataset.py:626-653)
with a pooled prefetcher: sample decode happens in worker threads (PIL
releases the GIL for PNG decode) or, with `backend="process"`, in forked
worker processes — the numpy augmentation ops hold the GIL, so on
multi-core hosts the process backend is what scales the augmented path
(scripts/bench_loader.py measures both). Batches are collated and queued
ahead of the step. An optional native C++ decode backend
(native/fpcnn_native.so, data/native_loader.py) accelerates PNG decode
when built.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from fastposecnn_tpu.data.nocs import collate

# Process-backend worker state: the dataset is shipped once per worker via
# the pool initializer (fork start method shares it copy-on-write) instead
# of being pickled into every map call.
_WORKER_DS = None


def _init_worker(ds):
    global _WORKER_DS
    _WORKER_DS = ds


def _worker_get(i):
    return _WORKER_DS[int(i)]


def _worker_stage_get(args):
    """Persistent staging-pool worker: (index, epoch, dataset_dir).

    The staged trainer forks its worker pool ONCE at startup (forking
    later would race its async checkpoint-flush thread: a child forked
    mid-device_get inherits locked JAX/allocator mutexes and deadlocks),
    so the parent's dataset may have advanced epochs or been repointed at
    a fresh scene bank since the fork — sync the child copy before
    reading."""
    i, epoch, root = args
    ds = _WORKER_DS
    if epoch is not None and getattr(ds, "epoch", None) != epoch:
        ds.epoch = epoch
    if root is not None and str(getattr(ds, "dataset_dir", None)) != str(root):
        ds.repoint(root)
    return ds[int(i)]


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        prefetch: int = 2,
        drop_last: bool = False,
        backend: str = "thread",  # 'thread' | 'process'
    ):
        if backend not in ("thread", "process"):
            raise ValueError(f"unknown loader backend {backend!r}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.backend = backend
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s : s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self) -> Iterator[Optional[dict]]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()  # consumer abandoned iteration
        if hasattr(self.dataset, "epoch"):
            # augmentation draws vary per epoch (data/nocs.py _read_image)
            self.dataset.epoch = self.epoch

        def _put(item) -> bool:
            """Bounded put that aborts when the consumer is gone — a plain
            out_q.put would block forever if the training loop broke out of
            iteration (exception, early stop, GC'd generator), pinning this
            thread and, with backend='process', the whole forked pool."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # The sentinel must reach the consumer on EVERY exit path —
            # a worker exception (BrokenProcessPool, pickling failure,
            # OOM-killed fork) would otherwise leave the training loop
            # blocked on out_q.get() forever. The error itself is re-raised
            # in the consumer.
            try:
                if self.backend == "process":
                    # Workers fork AFTER self.dataset.epoch was set above,
                    # so augmentation draws stay epoch-correct in children.
                    pool = ProcessPoolExecutor(
                        self.num_workers,
                        initializer=_init_worker,
                        initargs=(self.dataset,),
                    )
                    get = _worker_get
                else:
                    pool = ThreadPoolExecutor(self.num_workers)
                    get = self.dataset.__getitem__
                with pool:  # shutdown(wait=True) reaps workers on any exit
                    for chunk in self._index_batches():
                        if stop.is_set():
                            break
                        samples = list(pool.map(get, chunk))
                        if not _put(collate(samples)):
                            break
            except BaseException as e:  # noqa: BLE001
                _put(("__loader_error__", e))
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        completed = False
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    completed = True
                    break
                if isinstance(item, tuple) and len(item) == 2 \
                        and item[0] == "__loader_error__":
                    raise item[1]
                yield item  # may be None (all samples rejected) — skip
        finally:
            stop.set()
            # Unblock a producer stuck in put, then wait for it to reap
            # its worker pool.
            while t.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.1)
        if completed:
            self.epoch += 1

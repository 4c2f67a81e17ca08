"""Dataloader: background-threaded, prefetching, device-feeding.

Capability parity with `ultralytics/data/build.py:62-186` (InfiniteDataLoader,
seed_worker, build_dataloader, build_yolo_dataset). TPU re-design: instead of
torch worker *processes* + pin_memory, a thread pool assembles padded numpy
batches and a prefetch queue keeps `prefetch` batches ready; `device_put` overlap
happens in the train loop. Per-host sharding for multi-process SPMD replaces
DistributedSampler: each process owns a contiguous stripe of every epoch's
permutation (same seed -> identical permutations on all hosts).
"""

from __future__ import annotations

import math
import queue
import threading

import numpy as np

from drone_yolo_tpu.data.dataset import ClassificationDataset, YOLODataset
from drone_yolo_tpu.utils import LOGGER


def build_yolo_dataset(cfg, img_path, batch: int, data: dict, mode: str = "train", stride: int = 32, max_labels=None):
    """Construct a YOLODataset from a merged config (reference build.py:96).

    rect=True is honored for val/eval only: per-batch aspect-quantized shapes
    exactly as the reference (`data/base.py:261`), with the distinct-shape count
    bounded (default 8) so XLA compiles stay bounded. Train mode keeps square
    static shapes (multi-scale happens via bucketed resize inside the step).
    """
    rect = bool(getattr(cfg, "rect", False)) and mode != "train"
    if getattr(cfg, "rect", False) and mode == "train":
        LOGGER.warning("rect=True ignored for training (TPU static-shape policy); using square letterbox")
    return YOLODataset(
        img_path=img_path,
        imgsz=cfg.imgsz,
        cache=cfg.cache in (True, "ram"),
        augment=mode == "train",
        hyp=cfg,
        prefix=f"{mode}: ",
        batch_size=batch,
        stride=stride,
        single_cls=cfg.single_cls,
        classes=cfg.classes,
        fraction=cfg.fraction if mode == "train" else 1.0,
        data=data,
        task=getattr(cfg, "task", "detect"),
        max_labels=max_labels,
        stretch=getattr(cfg, "task", "detect") == "rtdetr",
        rect=rect,
        pad=0.0 if mode == "train" else 0.5,
        rect_max_shapes=int(getattr(cfg, "rect_max_shapes", 8) or 8),
    )


class DataLoader:
    """Epoch-based loader with shuffling, threaded workers, and prefetch."""

    def __init__(self, dataset, batch_size: int = 16, shuffle: bool = True, workers: int = 2, seed: int = 0, drop_last: bool = True, prefetch: int = 2, process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0
        # multi-process: batch_size is GLOBAL; each process assembles its
        # 1/process_count stripe and shard_batch glues the global jax.Array
        # (parallel/mesh.py). Same step count on every host by construction.
        assert batch_size % process_count == 0, f"global batch {batch_size} must divide by {process_count} processes"
        self.local_bs = batch_size // process_count
        n_local = len(dataset) // process_count if process_count > 1 else len(dataset)
        self.nb = n_local // self.local_bs if drop_last else math.ceil(n_local / self.local_bs)

    def __len__(self):
        return self.nb

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        se = getattr(self.dataset, "set_epoch", None)
        if callable(se):
            se(epoch, self.seed)  # advances the per-sample deterministic augmentation stream

    def _set_window(self, idx, p: int):
        """Install the deterministic mosaic-companion pool for epoch position p:
        the trailing `max_buffer_length` indices of this process's permutation
        stripe. Same (seed, epoch) -> same windows, independent of worker count;
        those indices were just processed, so they are hot in the decode buffer."""
        setw = getattr(self.dataset, "set_sample_window", None)
        w = getattr(self.dataset, "max_buffer_length", 0)
        if not callable(setw) or not w:
            return
        lo = max(0, p - w)
        # empty at p=0: Mosaic then draws seeded-uniform companions (still
        # deterministic) instead of 4 copies of the first sample
        setw(idx[lo:p])

    def _indices(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        if self.process_count > 1:
            # contiguous per-host stripe of the shared permutation
            per = n // self.process_count
            idx = idx[self.process_index * per : (self.process_index + 1) * per]
        return idx

    def __iter__(self):
        """Yield collated batches in order, assembled by `workers` threads.

        Replaces the reference's torch worker *processes* (data/build.py:139,
        num_workers) with a thread pool: cv2 decode/resize/warpAffine release
        the GIL, so mosaic+affine parallelize across host cores. Each worker
        owns whole batches (sample locality for the mosaic buffer); a reorder
        buffer restores epoch order; a semaphore bounds in-flight batches to
        `workers + prefetch` so memory stays capped.
        """
        idx = self._indices()
        batches = [idx[i * self.local_bs : (i + 1) * self.local_bs] for i in range(self.nb)]
        if self.workers <= 1:
            yield from self._iter_single(batches, idx)
            return

        work: queue.Queue = queue.Queue()
        for bi, binds in enumerate(batches):
            work.put((bi, binds))
        done: dict = {}
        lock = threading.Condition()
        inflight = threading.Semaphore(self.workers + self.prefetch)
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                inflight.acquire()
                try:
                    bi, binds = work.get_nowait()
                except queue.Empty:
                    inflight.release()
                    return
                try:
                    samples = []
                    for j, si in enumerate(binds):
                        self._set_window(idx, bi * self.local_bs + j)
                        samples.append(self.dataset[int(si)])
                    out = self.dataset.collate(samples)
                except BaseException as e:  # noqa: BLE001 - propagate to the consumer
                    out = e
                with lock:
                    done[bi] = out
                    lock.notify_all()
                if isinstance(out, BaseException):
                    return

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.workers)]
        for t in threads:
            t.start()
        try:
            for bi in range(self.nb):
                with lock:
                    while bi not in done:
                        err = next((v for v in done.values() if isinstance(v, BaseException)), None)
                        if err is not None:
                            raise err
                        lock.wait()
                    batch = done.pop(bi)
                if isinstance(batch, BaseException):
                    raise batch
                inflight.release()
                yield batch
        finally:
            stop.set()
            # unblock any workers parked on the semaphore
            for _ in threads:
                inflight.release()

    def _iter_single(self, batches, idx):
        """Single producer thread with a bounded prefetch queue (workers<=1)."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for bi, binds in enumerate(batches):
                    if stop.is_set():
                        return
                    samples = []
                    for j, si in enumerate(binds):
                        self._set_window(idx, bi * self.local_bs + j)
                        samples.append(self.dataset[int(si)])
                    q.put(self.dataset.collate(samples))
                q.put(None)
            except BaseException as e:  # noqa: BLE001 - propagate to the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()


def build_dataloader(dataset, batch: int, workers: int, shuffle: bool = True, seed: int = 0, drop_last: bool = True, process_index: int = 0, process_count: int = 1):
    """Reference build.py:139 analog."""
    return DataLoader(
        dataset,
        batch_size=batch,
        shuffle=shuffle,
        workers=workers,
        seed=seed,
        drop_last=drop_last,
        process_index=process_index,
        process_count=process_count,
    )

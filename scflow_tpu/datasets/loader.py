"""Host-side data loading: multiprocess workers, per-host sharded sampling,
fixed-shape batch collation, and device prefetch.

This replaces the reference's torch DataLoader + DistributedSampler stack
(train.py:48-84): each JAX process iterates its own shard of the index space
(process_index/process_count), workers run the numpy pipeline, and batches
collate to dense NHWC arrays ready for `jax.device_put` onto the data mesh.
"""

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List

import numpy as np


class _WorkerError:
    """Carries a worker-thread exception to the consuming generator."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def _stoppable_put(q, item, stop) -> bool:
    """put() that re-checks `stop` every 0.1 s: a thread parked in a plain
    blocking put would never observe cancellation (see _iter_thread)."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.1)
            return True
        except queue.Full:
            continue
    return False


def _process_worker(dataset, idx_q, res_q, seed=None):
    """Worker-process loop (module-level so spawn can pickle it).

    The dataset path is numpy/cv2-only (no jax import), so spawned workers
    start lean and the GIL cap on thread workers disappears — the analog of
    torch DataLoader's num_workers processes (reference train.py:48-84).
    `seed` reproduces mmcv's worker_init_fn semantics (seed + worker_id +
    rank * num_workers) for the pipeline's global-np.random augmentations
    (PoseJitter, color transforms).  Determinism holds because idx_q is
    this worker's PRIVATE round-robin queue: the worker consumes its RNG
    stream in a fixed sample order regardless of scheduling.
    """
    if seed is not None:
        import random

        np.random.seed(seed % (2**32))
        random.seed(seed)  # Crop's size_ratio uses the python random module
    while True:
        task = idx_q.get()
        if task is None:
            res_q.put(("done",))
            return
        seq, idx = task
        try:
            item = dataset[idx]
        except Exception as exc:  # propagate a summary; tracebacks don't pickle
            res_q.put(("err", f"{type(exc).__name__}: {exc}"))
            return
        res_q.put(("ok", seq, item))


def collate_batch(samples: List[Dict], train: bool = True) -> Dict[str, np.ndarray]:
    """Flatten per-image object patches into one dense batch (the reference
    does this inside format_data_*, base_refiner.py:85-91,146-151).

    Returns arrays keyed for the train/infer steps plus 'img_metas' (list,
    host-only) and 'per_img_patch_num' for regrouping at eval."""
    out: Dict[str, Any] = {}
    per_img = [len(s["annots"]["labels"]) for s in samples]
    out["per_img_patch_num"] = per_img
    out["img_metas"] = [s["img_metas"] for s in samples]

    imgs = np.concatenate([np.asarray(s["img"], np.float32) for s in samples], axis=0)
    out["real_images"] = imgs

    def cat(key, dtype=np.float32):
        return np.concatenate(
            [np.asarray(s["annots"][key], dtype) for s in samples], axis=0
        )

    a0 = samples[0]["annots"]
    out["ref_rotations"] = cat("ref_rotations")
    out["ref_translations"] = cat("ref_translations")
    out["labels"] = cat("labels", np.int32)
    out["k"] = cat("k")
    if "gt_rotations" in a0:
        out["gt_rotations"] = cat("gt_rotations")
        out["gt_translations"] = cat("gt_translations")
    if "gt_masks" in a0:
        masks = []
        for s in samples:
            masks.append(s["annots"]["gt_masks"].to_array(np.float32))
        out["gt_masks"] = np.concatenate(masks, axis=0)
    for key in ("init_add_error", "init_rot_error", "init_trans_error"):
        if key in a0:
            out[key] = cat(key)
    return out


class DataLoader:
    """Iterates dataset indices sharded per host, with a worker thread pool
    running the (numpy) pipeline and an output prefetch queue."""

    def __init__(
        self,
        dataset,
        samples_per_step: int,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        infinite: bool = True,
        collate_fn: Callable = collate_batch,
        prefetch: int = 2,
        drop_last: bool = True,
        worker_mode: str = "thread",
    ):
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode must be thread|process, got {worker_mode}")
        self.dataset = dataset
        self.samples_per_step = samples_per_step
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.infinite = infinite
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.worker_mode = worker_mode

    def _index_stream(self) -> Iterator[int]:
        epoch = 0
        n = len(self.dataset)
        while True:
            order = np.arange(n)
            if self.shuffle:
                rng = np.random.default_rng(self.seed + epoch)
                order = rng.permutation(n)
            shard = order[self.process_index :: self.process_count]
            yield from shard.tolist()
            epoch += 1
            if not self.infinite:
                return

    def __iter__(self):
        if self.worker_mode == "process":
            return self._iter_process()
        return self._iter_thread()

    def _iter_process(self):
        """Spawn-based worker processes: the pipeline runs outside the GIL
        entirely (cv2/numpy release it for big arrays, but Python transform
        overhead still serializes a thread pool).  spawn, not fork — the
        parent may hold an initialized (remote-)TPU backend whose state
        must not be duplicated.  Samples come back pickled over an mp.Queue;
        collation stays in-process.

        Reproducibility matches torch/mmcv's worker protocol: sample i goes
        to worker i % num_workers over a PRIVATE per-worker queue (so each
        worker's RNG stream consumes its samples in a deterministic order)
        and results reassemble in sequence order before batching — batch
        contents are a pure function of (seed, num_workers), not of OS
        scheduling."""
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        idx_stream = self._index_stream()
        idx_qs = [ctx.Queue(maxsize=4) for _ in range(self.num_workers)]
        res_q = ctx.Queue(
            maxsize=max(self.samples_per_step * (self.prefetch + 1),
                        self.num_workers * 2)
        )
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(q, item):
            return _stoppable_put(q, item, stop)

        procs = [
            ctx.Process(
                target=_process_worker,
                args=(self.dataset, idx_qs[wid], res_q,
                      self.seed + wid + self.process_index * self.num_workers),
                daemon=True)
            for wid in range(self.num_workers)
        ]
        for p in procs:
            p.start()

        def producer():
            seq = -1
            for seq, idx in enumerate(idx_stream):
                if not _put(idx_qs[seq % self.num_workers], (seq, idx)):
                    return
            for wid in range(self.num_workers):
                if not _put(idx_qs[wid], None):
                    return

        def batcher():
            done_workers = 0
            buf = []
            expected = 0
            reorder = {}
            while done_workers < self.num_workers and not stop.is_set():
                try:
                    msg = res_q.get(timeout=0.1)
                except queue.Empty:
                    # watchdog: a worker killed without posting (OOM kill,
                    # cv2 segfault) would otherwise hang the consumer in
                    # out_q.get() forever — the failure torch guards with
                    # its DataLoader watchdog
                    dead = [p for p in procs
                            if not p.is_alive() and p.exitcode not in (0, None)]
                    if dead:
                        _put(out_q, _WorkerError(RuntimeError(
                            f"worker process died with exitcode "
                            f"{dead[0].exitcode}")))
                        return
                    continue
                tag = msg[0]
                if tag == "err":
                    _put(out_q, _WorkerError(RuntimeError(msg[1])))
                    return
                if tag == "done":
                    done_workers += 1
                    continue
                _, seq, item = msg
                reorder[seq] = item
                while expected in reorder:  # emit strictly in sequence order
                    buf.append(reorder.pop(expected))
                    expected += 1
                    if len(buf) == self.samples_per_step:
                        if not _put(out_q, self.collate_fn(buf)):
                            return
                        buf = []
            if buf and not self.drop_last and not stop.is_set():
                _put(out_q, self.collate_fn(buf))
            _put(out_q, None)

        threads = [threading.Thread(target=producer, daemon=True),
                   threading.Thread(target=batcher, daemon=True)]
        for t in threads:
            t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, _WorkerError):
                    raise RuntimeError(
                        "DataLoader worker failed") from batch.exc
                yield batch
        finally:
            stop.set()
            for p in procs:
                p.join(timeout=1.0)
            for p in procs:
                if p.is_alive():
                    p.terminate()
            for q_ in idx_qs + [res_q]:
                q_.cancel_join_thread()

    def _iter_thread(self):
        idx_stream = self._index_stream()
        sample_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 4)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # all blocking queue ops go through these: a thread parked in a
        # plain put()/get() never observes `stop`, so abandoning the
        # iterator (generator close -> finally below) would leak every
        # blocked daemon thread plus its in-flight sample
        _cancelled = object()

        def _put(q, item):
            return _stoppable_put(q, item, stop)

        def _get(q):
            while not stop.is_set():
                try:
                    return q.get(timeout=0.1)
                except queue.Empty:
                    continue
            return _cancelled

        def producer():
            for idx in idx_stream:
                if not _put(sample_q, idx):
                    return
            for _ in range(self.num_workers):
                if not _put(sample_q, None):
                    return

        # BOUNDED: this queue decouples workers from the batcher; unbounded
        # it lets workers preprocess the infinite index stream far ahead of
        # a slower consumer — measured ~65-85 MB/step RSS growth on CPU and
        # a 116 GB blowup over 850 train steps on the TPU run.  The bound
        # applies backpressure: workers block here, sample_q fills,
        # producer blocks.
        results: "queue.Queue" = queue.Queue(
            maxsize=max(self.samples_per_step * (self.prefetch + 1),
                        self.num_workers * 2)
        )

        def worker():
            while not stop.is_set():
                idx = _get(sample_q)
                if idx is _cancelled:
                    return
                if idx is None:
                    _put(results, None)
                    return
                try:
                    item = self.dataset[idx]
                except Exception as exc:  # propagate instead of a silent
                    _put(results, _WorkerError(exc))  # daemon-thread death
                    return
                _put(results, item)

        def batcher():
            done_workers = 0
            buf = []
            while done_workers < self.num_workers and not stop.is_set():
                item = _get(results)
                if item is _cancelled:
                    return
                if isinstance(item, _WorkerError):
                    _put(out_q, item)
                    return
                if item is None:
                    done_workers += 1
                    continue
                buf.append(item)
                if len(buf) == self.samples_per_step:
                    if not _put(out_q, self.collate_fn(buf)):
                        return
                    buf = []
            if buf and not self.drop_last and not stop.is_set():
                _put(out_q, self.collate_fn(buf))
            _put(out_q, None)

        threads = [threading.Thread(target=producer, daemon=True)]
        threads += [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        threads.append(threading.Thread(target=batcher, daemon=True))
        for t in threads:
            t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, _WorkerError):
                    raise RuntimeError(
                        "DataLoader worker failed"
                    ) from batch.exc
                yield batch
        finally:
            stop.set()

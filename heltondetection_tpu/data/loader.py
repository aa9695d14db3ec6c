"""Prefetching batch loader: threads decode/augment on host, device gets
fixed-shape HBM-resident batches — the TPU-native stand-in for the
reference's DataLoader worker processes (SURVEY.md §3.1 hot loop: "mosaic
decodes 4 images per sample — the CPU bottleneck the TPU build moves
on-device"; JPEG decode + compositing stay host-side per §2b N7, the
normalize is fused inside the jitted train step).

Deterministic: worker ordering never affects content because every sample is
seeded by (seed, epoch, index); threads only change *when* things are
computed.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import jax.numpy as jnp
import numpy as np


def device_prep(images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 (B,S,S,3) → float32 [0,1]. NOTE: the train steps now fuse this
    normalization inside jit themselves (train/trainer.py) — calling this
    eagerly costs an extra dispatch and a (B,S,S,3) f32 HBM round-trip.
    Kept for ad-hoc use; the uint8 batch is what should cross PCIe/ICI."""
    return images_u8.astype(jnp.float32) / 255.0


def _prefetched(it: Iterator, depth: int) -> Iterator:
    """Run ``it`` on a background thread, keeping ``depth`` items ready.

    Abandoning the consumer (break / GC / exception) closes this generator,
    which signals the producer to stop and JOINS it — otherwise an orphaned
    producer would keep driving the shared native pool while the next
    epoch's producer starts (hd_pool_run is not reentrant)."""
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    _END = object()
    stop = threading.Event()

    def producer():
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(_END)
        except BaseException as e:  # surface worker errors to the consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while True:  # unblock a producer stuck on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=30.0)
        if t.is_alive():  # a wedged native pool must be visible, not leaked
            import logging
            logging.getLogger("heltondetection").error(
                "loader producer thread failed to stop within 30s — the "
                "native pool may be wedged; its run-lock keeps state safe "
                "but the thread is leaked")


def _stack(samples: List[Dict], keys) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k in keys:
        v0 = samples[0][k]
        if isinstance(v0, np.ndarray):
            out[k] = np.stack([s[k] for s in samples])
        else:
            out[k] = [s[k] for s in samples]
    return out


class _LoaderBase:
    """close()/context-manager support shared by both loaders: releases the
    lazily-created C++ NativePool (worker threads) and the pipeline's fetch
    executor — constructing loaders repeatedly (e.g. run_eval each epoch)
    must not accumulate thread pools until GC."""

    def close(self) -> None:
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.close()
            del self._pool
        if hasattr(self.pipe, "close"):
            self.pipe.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover — interpreter-exit ordering
        try:
            self.close()
        except Exception:
            pass


class TrainLoader(_LoaderBase):
    """Iterates shuffled fixed-size batches of augmented train samples.

    Each epoch: deterministic shuffle by (seed, epoch); drop_last semantics
    (static batch shape is non-negotiable under jit).
    """

    KEYS = ("image", "gt_boxes", "gt_cls", "gt_mask")

    def __init__(self, pipeline, batch_size: int, *, seed: int = 0,
                 num_workers: int = 8, prefetch: int = 4, keys=None,
                 shard=(0, 1)):
        self.pipe = pipeline
        self.batch_size = batch_size  # GLOBAL batch size
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.keys = keys or self.KEYS
        # (process_id, process_count) — the DistributedSampler analog:
        # every process draws the SAME (seed, epoch) permutation and takes
        # its contiguous slice of each global batch, so the union of the
        # per-process slices is exactly the single-process global batch
        pid, nproc = shard
        if batch_size % nproc:
            raise ValueError(f"batch_size {batch_size} must divide by "
                             f"process_count {nproc}")
        self._shard_lo = pid * (batch_size // nproc)
        self._shard_hi = self._shard_lo + batch_size // nproc

    def _batch_idxs(self, order, bi: int):
        return order[bi * self.batch_size:
                     (bi + 1) * self.batch_size][self._shard_lo:self._shard_hi]

    def steps_per_epoch(self) -> int:
        return len(self.pipe) // self.batch_size

    def _native_pool(self):
        if not hasattr(self, "_pool"):
            from heltondetection_tpu.data.native_loader import NativePool
            self._pool = NativePool(self.num_workers)
        return self._pool

    def epoch(self, epoch: int) -> Iterator[Dict[str, Any]]:
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, epoch]))
        order = rng.permutation(len(self.pipe))
        n_batches = self.steps_per_epoch()
        keys = self.keys

        if hasattr(self.pipe, "sample_batch"):
            # native path: the C++ pool assembles each batch in one call
            # (GIL released); a single producer thread keeps `prefetch`
            # batches in flight ahead of the device step.
            pool = self._native_pool()

            def batches():
                for bi in range(n_batches):
                    yield self.pipe.sample_batch(self._batch_idxs(order, bi),
                                                 epoch, pool)

            yield from _prefetched(batches(), self.prefetch)
            return

        def make_batch(bi: int) -> Dict[str, Any]:
            idxs = self._batch_idxs(order, bi)
            samples = [self.pipe.sample(int(i), epoch) for i in idxs]
            batch = _stack(samples, keys)
            return batch

        if self.num_workers <= 1:
            for bi in range(n_batches):
                yield make_batch(bi)
            return

        # fan out at SAMPLE granularity (cv2 decode/resize release the GIL)
        # with `prefetch` whole batches of sample-futures in flight — a
        # per-batch task would serialize the batch's samples on one thread
        with ThreadPoolExecutor(self.num_workers) as pool:
            def submit_batch(bi):
                return [pool.submit(self.pipe.sample, int(i), epoch)
                        for i in self._batch_idxs(order, bi)]

            pending = [submit_batch(bi)
                       for bi in range(min(self.prefetch, n_batches))]
            next_submit = len(pending)
            for _ in range(n_batches):
                futs = pending.pop(0)
                if next_submit < n_batches:
                    pending.append(submit_batch(next_submit))
                    next_submit += 1
                yield _stack([f.result() for f in futs], keys)


class EvalLoader(_LoaderBase):
    """Fixed-shape eval batches; the final short batch is padded with
    ``img_id=None`` rows the evaluator skips (SURVEY.md §7 static shapes)."""

    def __init__(self, pipeline, batch_size: int, *, num_workers: int = 8,
                 prefetch: int = 4):
        self.pipe = pipeline
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = prefetch

    def _native_pool(self):
        if not hasattr(self, "_pool"):
            from heltondetection_tpu.data.native_loader import NativePool
            self._pool = NativePool(self.num_workers)
        return self._pool

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        n = len(self.pipe)
        bs = self.batch_size
        n_batches = (n + bs - 1) // bs
        keys = ("image", "img_id", "scale", "pad_x", "pad_y", "orig_hw")

        if hasattr(self.pipe, "sample_batch"):
            pool = self._native_pool()

            def batches():
                for bi in range(n_batches):
                    idxs = list(range(bi * bs, min((bi + 1) * bs, n)))
                    samples = self.pipe.sample_batch(idxs, pool)
                    while len(samples) < bs:  # pad the tail batch
                        pad = dict(samples[-1])
                        pad["img_id"] = None
                        samples.append(pad)
                    yield _stack(samples, keys)

            yield from _prefetched(batches(), self.prefetch)
            return

        def make_batch(bi: int) -> Dict[str, Any]:
            idxs = list(range(bi * bs, min((bi + 1) * bs, n)))
            samples = [self.pipe.sample(i) for i in idxs]
            while len(samples) < bs:  # pad the tail batch
                pad = dict(samples[-1])
                pad["img_id"] = None
                samples.append(pad)
            return _stack(samples, keys)

        if self.num_workers <= 1:
            for bi in range(n_batches):
                yield make_batch(bi)
            return

        # sample-granularity fan-out (see TrainLoader.epoch)
        with ThreadPoolExecutor(self.num_workers) as pool:
            def submit_batch(bi):
                idxs = list(range(bi * bs, min((bi + 1) * bs, n)))
                return [pool.submit(self.pipe.sample, i) for i in idxs]

            pending = [submit_batch(bi)
                       for bi in range(min(self.prefetch, n_batches))]
            next_submit = len(pending)
            for _ in range(n_batches):
                futs = pending.pop(0)
                if next_submit < n_batches:
                    pending.append(submit_batch(next_submit))
                    next_submit += 1
                samples = [f.result() for f in futs]
                while len(samples) < bs:  # pad the tail batch
                    pad = dict(samples[-1])
                    pad["img_id"] = None
                    samples.append(pad)
                yield _stack(samples, keys)

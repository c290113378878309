"""Serving-side GOP prefetch: host decode + MV read overlap device compute.

The reference serves strictly sequentially (`/root/reference/evaluation.py`
main loops: PIL decode -> forward, one frame at a time — decode stalls the
accelerator between frames). TPU-native serving instead treats the GOP as
the scheduling unit and pipelines four stages:

  worker threads   PNG decode + merged-MV `.bin` read + host flow-plane
                   split (the serving layout — see gop/pipeline.py)
  device stage     async `jax.device_put` a bounded `depth` GOPs ahead —
                   the H2D DMA overlaps the previous GOP's compute (the
                   north star's "double-buffered HBM prefetch"; depth=2 is
                   classic double buffering)
  main thread      the jitted GOP program
  writer thread    D2H + colorize + PNG encode (`AsyncWriter`)

Threads suffice for host overlap: PIL/zlib decode, `np.fromfile`, and
`device_put` all release the GIL (same argument as `data/loader.py`).
"""

import os
import queue
import threading

import numpy as np


def _assemble(dataset, start, g):
    """Host-side GOP assembly: one keyframe + g-1 frames + split flow
    planes, as contiguous numpy (the exact layout `ARPipeline` consumes)."""
    samples = [dataset[start + k] for k in range(g)]
    keyframe = samples[0]["image"][None]
    frames = np.stack([s["image"] for s in samples[1:]])
    flows = np.stack([s["flow"] for s in samples[1:]])
    fx = np.ascontiguousarray(flows[..., 0])
    fy = np.ascontiguousarray(flows[..., 1])
    return keyframe, frames, fx, fy


class GOPFeeder:
    """Iterate a sequence dataset GOP-at-a-time with background host
    assembly and async device staging.

    Yields (gop_index, keyframe, frames, (fx, fy)) with arrays already on
    device (stage=True) or as host numpy (stage=False). Order is strict;
    worker exceptions re-raise in the consumer.

    gop_batch=B stacks B consecutive GOPs into the multi-GOP throughput
    layout (keyframes [B,H,W,3], frames [B,G-1,H,W,3] — ARPipeline batches
    HR keyframes + LR phase 1 across the stack; PERF.md "batching arms
    race"). The tail (n_gops % B) is emitted as single GOPs so only the
    two program shapes ever compile."""

    def __init__(self, dataset, ref_gap, num_workers=2, depth=2, stage=True,
                 gop_batch=1):
        self.dataset = dataset
        self.g = int(ref_gap)
        self.num_workers = max(1, num_workers)
        self.depth = max(1, depth)
        self.stage = stage
        self.gop_batch = max(1, int(gop_batch))

    def __len__(self):
        return len(self.dataset) // self.g

    def _host_iter(self):
        # sequential sources (VideoGOPSource: direct compressed-stream
        # decode) produce whole GOP items in order; one producer thread
        # gives the same host/device overlap as the random-access workers
        if hasattr(self.dataset, "iter_gops"):
            yield from self._seq_host_iter()
            return
        n_gops = len(self)
        results = {}
        lock = threading.Condition()
        stop = threading.Event()

        def worker(wid):
            for gi in range(wid, n_gops, self.num_workers):
                if stop.is_set():
                    return
                with lock:
                    # bound assembly look-ahead (in single-GOP units) so host
                    # decode memory stays O(depth+workers) GOPs; note staged
                    # DEVICE memory in __iter__ is depth x gop_batch GOPs —
                    # callers using large gop_batch should keep depth at 1
                    while (
                        gi - self._emitted[0] > self.depth + self.num_workers
                        and not stop.is_set()
                    ):
                        lock.wait()
                if stop.is_set():
                    return
                try:
                    item = _assemble(self.dataset, gi * self.g, self.g)
                except Exception as e:  # surface in consumer
                    item = e
                with lock:
                    results[gi] = item
                    lock.notify_all()

        self._emitted = [0]
        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            for gi in range(n_gops):
                with lock:
                    while gi not in results:
                        lock.wait()
                    item = results.pop(gi)
                    self._emitted[0] = gi
                    lock.notify_all()
                if isinstance(item, Exception):
                    raise item
                yield gi, item
        finally:
            stop.set()
            with lock:
                lock.notify_all()

    def _seq_host_iter(self):
        """Drive a sequential source's iter_gops() on one producer thread,
        `depth + num_workers` GOP items of look-ahead (matching the
        random-access path's host memory bound). Abandoning the iteration
        early (e.g. zip over streams of unequal length) stops the producer
        and closes the source generator, releasing its decode threads."""
        q = queue.Queue(maxsize=self.depth + self.num_workers)
        done = object()
        stop = threading.Event()

        def put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                it = self.dataset.iter_gops()
                try:
                    for item in it:
                        if not put(item):
                            return
                finally:
                    # closing the generator runs its finally (stops
                    # VideoGOPSource's decode threads)
                    if hasattr(it, "close"):
                        it.close()
                put(done)
            except Exception as e:  # surface in consumer
                if not stop.is_set():
                    q.put(e)

        threading.Thread(target=producer, daemon=True).start()
        gi = 0
        try:
            while True:
                item = q.get()
                if item is done:
                    return
                if isinstance(item, Exception):
                    raise item
                yield gi, item
                gi += 1
        finally:
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass

    def _batched_iter(self):
        """Group consecutive GOPs into [B, ...] stacks (full stacks only;
        the ragged tail — including all of an unknown-length sequential
        source's leftovers — is emitted GOP-at-a-time at the end, so only
        the two program shapes ever compile)."""
        if self.gop_batch == 1:
            yield from self._host_iter()
            return
        pending = []
        for gi, item in self._host_iter():
            pending.append((gi, item))
            if len(pending) == self.gop_batch:
                kf = np.stack([p[1][0][0] for p in pending])
                fr = np.stack([p[1][1] for p in pending])
                fx = np.stack([p[1][2] for p in pending])
                fy = np.stack([p[1][3] for p in pending])
                yield pending[0][0], (kf, fr, fx, fy)
                pending = []
        for gi, item in pending:
            yield gi, item

    def __iter__(self):
        if not self.stage:
            for gi, (kf, fr, fx, fy) in self._batched_iter():
                yield gi, kf, fr, (fx, fy)
            return

        import collections

        import jax

        def put(item):
            gi, (kf, fr, fx, fy) = item
            return (
                gi,
                jax.device_put(kf),
                jax.device_put(fr),
                (jax.device_put(fx), jax.device_put(fy)),
            )

        buf = collections.deque()
        it = self._batched_iter()
        try:
            for _ in range(self.depth):
                buf.append(put(next(it)))
        except StopIteration:
            pass
        while buf:
            out = buf.popleft()
            try:
                buf.append(put(next(it)))
            except StopIteration:
                pass
            yield out


class AsyncWriter:
    """Background D2H + PNG writer: `put(preds, names)` enqueues a device
    array of class maps; a writer thread pulls it to host (np.asarray — the
    only blocking hop, off the dispatch thread) and encodes PNGs. Bounded
    queue (depth) so at most `depth` GOPs of outputs are in flight."""

    def __init__(self, out_dir, colorize=False, depth=2):
        self.out_dir = out_dir
        self.colorize = colorize
        self._q = queue.Queue(maxsize=max(1, depth))
        self._err = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        from PIL import Image

        if self.colorize:
            from arseg_tpu.tools.labels import index_to_rgb
        while True:
            item = self._q.get()
            if item is None:
                return
            if self._err is not None:
                continue  # drain mode: keep consuming so put()/close() never block
            try:
                preds, names = item
                preds = np.asarray(preds).astype(np.uint8)
                for k, name in enumerate(names):
                    out = preds[k]
                    if self.colorize:
                        out = index_to_rgb(out)
                    Image.fromarray(out).save(
                        os.path.join(self.out_dir, name + ".png")
                    )
            except Exception as e:
                # record and DRAIN rather than exit: with the bounded queue a
                # producer blocked in put() would otherwise deadlock — the
                # error surfaces on the next put() or at close()
                self._err = e

    def put(self, preds, names):
        if self._err is not None:
            raise self._err
        self._q.put((preds, list(names)))

    def close(self):
        self._q.put(None)
        self._thread.join()
        if self._err is not None:
            raise self._err

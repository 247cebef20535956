"""Production serving layer: dynamic micro-batching embedding service.

The reference has no deployment story — its inference entry points are the
offline eval scripts (lfw/lfw_eval.py:226-287) which assume the whole
dataset is in memory. This subsystem is the serving-side complement for the
same models: callers submit single faces (or small groups) from any number
of threads; a collector thread coalesces them into one device dispatch.

TPU-shaped by design:

  * **Static shapes.** Batches are padded up to a fixed bucket ladder
    (powers of two by default), so the service compiles a handful of XLA
    programs once and never again — no recompiles under shifting load.
  * **Micro-batching.** The MXU wants large batches (one 256-face dispatch
    is ~30x cheaper per face than 256 single dispatches, BASELINE.md); the
    collector drains the queue up to `max_batch`, waiting at most
    `max_delay_s` once the first request of a batch has arrived — the
    standard latency/throughput knob.
  * **Async dispatch.** JAX dispatch is non-blocking: futures resolve with
    device arrays immediately after enqueue and only materialize when the
    caller reads them, so the collector is back to draining while the TPU
    still computes.
  * **Mesh-transparent.** Works unchanged over a sharded model
    (`FFRNet.shard(mesh)`): bucket padding keeps every dispatch divisible
    across the 'data' axis.

Usage:
    svc = EmbeddingService(FFRNet.from_pretrained(...), max_batch=256)
    with svc:
        fut = svc.submit(face_112x112x3)       # from any thread
        raw, rect = fut.result()
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import numpy as np


def _default_buckets(max_batch: int) -> Tuple[int, ...]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return tuple(out)


@dataclass
class ServiceStats:
    """Monotonic counters (lock-guarded by the service; read any time)."""
    requests: int = 0
    faces: int = 0
    batches: int = 0
    padded_faces: int = 0   # bucket-padding overhead actually dispatched
    errors: int = 0
    # last 4096 dispatch sizes (bounded: a long-lived service must not grow)
    batch_sizes: collections.deque = field(
        default_factory=lambda: collections.deque(maxlen=4096))

    @property
    def mean_batch(self) -> float:
        return self.faces / self.batches if self.batches else 0.0


class EmbeddingService:
    """Thread-safe micro-batching front-end over `FFRNet.embed`.

    submit() accepts one face (112, 112, 3) or a group (k, 112, 112, 3) in
    the model's input convention ([-1, 1] BGR, like FFRNet.embed) and
    returns a concurrent.futures.Future resolving to
    (raw_embedding, rectified_embedding) for exactly the submitted faces.
    """

    def __init__(self, model, *, max_batch: int = 256,
                 max_delay_s: float = 0.002,
                 buckets: Optional[Sequence[int]] = None,
                 input_hw: Tuple[int, int] = (112, 112)):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._model = model
        self._max_batch = int(max_batch)
        self._max_delay_s = float(max_delay_s)
        bl = sorted(set(int(b) for b in (buckets or _default_buckets(max_batch))))
        if not bl or bl[-1] < max_batch:
            raise ValueError("largest bucket must cover max_batch")
        if any(b < 1 for b in bl):
            raise ValueError("buckets must be positive")
        self._buckets = tuple(bl)
        self._input_hw = tuple(input_hw)
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        # guards the closed-check+enqueue pair in submit() against close()
        # (prevents a request landing behind the shutdown token) and all
        # stats mutations (counters touched from client + worker threads)
        self._lock = threading.Lock()
        self.stats = ServiceStats()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="ffrnet-embed-service")
        self._worker.start()

    # ------------------------------------------------------------------ API
    @property
    def max_batch(self) -> int:
        """Largest group accepted by a single submit()."""
        return self._max_batch

    def submit(self, faces) -> Future:
        """Enqueue one face or one (k, H, W, 3) group; returns a Future.

        uint8 inputs are raw 0..255 pixels and get the standard
        (x/255 - 0.5)/0.5 normalization here (matching api.embed and the
        HTTP front's X-Input-Dtype: uint8); float inputs must already be
        in [-1, 1]. The input is COPIED either way: np.asarray would
        alias an already-float32 contiguous caller buffer, and a caller
        mutating/reusing it before the collector dispatches would corrupt
        the whole co-batched group.
        """
        peek = np.asarray(faces)
        if peek.dtype == np.uint8:
            from ffrnet_tpu.data.datasets import _to_unit

            arr = _to_unit(peek)  # fresh float buffer — already a copy
        else:
            arr = np.array(faces, dtype=np.float32, copy=True)
        if arr.ndim == 3:
            arr = arr[None]
        h, w = self._input_hw
        if arr.ndim != 4 or arr.shape[1:] != (h, w, 3):
            raise ValueError(
                f"expected ({h}, {w}, 3) face(s), got {arr.shape}")
        if arr.shape[0] > self._max_batch:
            raise ValueError(
                f"group of {arr.shape[0]} exceeds max_batch={self._max_batch};"
                " split it or raise max_batch")
        if arr.shape[0] == 0:
            # resolve immediately: an empty group reaching the collector
            # could dispatch a fully-padded bucket through the relay to
            # compute nothing (and would skew stats.mean_batch)
            fut: Future = Future()
            fut.set_result((np.zeros((0, 512), np.float32),
                            np.zeros((0, 512), np.float32)))
            return fut
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("service is closed")
            self._queue.put((arr, fut))
            self.stats.requests += 1
        return fut

    def warmup(self) -> None:
        """Compile every bucket program up front (avoids first-request
        latency spikes). Blocks until all buckets have executed once."""
        h, w = self._input_hw
        for b in self._buckets:
            raw, _ = self._model.embed(np.zeros((b, h, w, 3), np.float32))
            # materialize (device_get), not block_until_ready: the latter is
            # a no-op through relay-attached TPUs (CLAUDE.md) and would let
            # warmup return with executions still in flight
            np.asarray(raw)

    def close(self, timeout: Optional[float] = 10.0) -> None:
        """Stop accepting work, drain the queue, join the worker."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)  # wake the collector; FIFO guarantees
            # every already-accepted request is drained first
        self._worker.join(timeout=timeout)

    def __enter__(self) -> "EmbeddingService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------ collector
    def _take_batch(self):
        """Block for the first request, then drain until max_batch faces or
        max_delay_s has elapsed. Returns list of (array, future, start) or
        None on shutdown wake with an empty queue."""
        first = self._queue.get()
        if first is None:
            return None
        batch = [first]
        total = first[0].shape[0]
        deadline = time.monotonic() + self._max_delay_s
        while total < self._max_batch:
            remaining = deadline - time.monotonic()
            try:
                item = self._queue.get(
                    timeout=max(remaining, 0.0) if remaining > 0 else None,
                    block=remaining > 0)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-arm shutdown for the outer loop
                break
            if total + item[0].shape[0] > self._max_batch:
                # would overflow the largest program: push back for the
                # next batch (queue order shifts; per-request results are
                # independent so correctness is unaffected)
                self._queue.put(item)
                break
            batch.append(item)
            total += item[0].shape[0]
        return batch

    def _run(self) -> None:
        while True:
            batch = self._take_batch()
            if batch is None:
                if self._closed and self._queue.empty():
                    return
                if self._closed:
                    # a submit raced close(): keep the shutdown token queued
                    # behind the remaining work so it is drained first
                    self._queue.put(None)
                continue
            # claim every future before dispatching: a future in RUNNING
            # state cannot be cancel()ed, so set_result/set_exception below
            # cannot race a caller's cancel into InvalidStateError
            live = [(a, fut) for a, fut in batch
                    if fut.set_running_or_notify_cancel()]
            if not live:
                continue
            try:
                arrs = [a for a, _ in live]
                total = sum(a.shape[0] for a in arrs)
                bucket = next(b for b in self._buckets if b >= total)
                h, w = self._input_hw
                x = np.zeros((bucket, h, w, 3), np.float32)
                np.concatenate(arrs, axis=0, out=x[:total])
                raw, rect = self._model.embed(x)
            except Exception as e:  # noqa: BLE001 — propagate to callers;
                # the collector thread must survive any batch failure
                with self._lock:
                    self.stats.errors += len(live)
                for _, fut in live:
                    fut.set_exception(e)
                continue
            with self._lock:
                self.stats.batches += 1
                self.stats.faces += total
                self.stats.padded_faces += bucket - total
                self.stats.batch_sizes.append(total)
            off = 0
            for a, fut in live:
                k = a.shape[0]
                fut.set_result((raw[off:off + k], rect[off:off + k]))
                off += k

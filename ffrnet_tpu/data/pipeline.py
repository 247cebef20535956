"""Host-side batch pipeline: threaded decode workers + device prefetch.

Replaces the reference's torch DataLoader (num_workers processes +
pin_memory, data/dataloader.py:33) with a TPU-idiomatic loader:

  * per-host sharding for multi-process DP: each host reads only its
    1/process_count slice of the (epoch-shuffled) index stream
  * a small thread pool decodes/augments samples into NHWC numpy batches
  * an N-deep prefetch queue overlaps host IO with device compute; batches
    are jax.device_put with the caller's sharding so the H2D copy lands
    directly in the right layout

Seeding: one numpy Generator per (epoch, sample) derived from the global
seed, so augmentation is reproducible and independent of worker timing
(the torch loader's per-worker RNG is timing-dependent; this is stricter).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

try:
    import jax
except ImportError:  # pragma: no cover
    jax = None


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 123,
        num_threads: int = 4,
        prefetch: int = 2,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        sharding=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.sharding = sharding
        if process_index is None and jax is not None:
            try:
                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index or 0
        self.process_count = process_count or 1

    def __len__(self):
        n = len(self.dataset) // self.process_count
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
        # contiguous per-host shard of the shuffled stream
        return idx[self.process_index::self.process_count]

    def _assemble(self, samples) -> Dict[str, np.ndarray]:
        keys = samples[0].keys()
        return {k: np.stack([s[k] for s in samples]) for k in keys}

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, Any]]:
        """Yield batches for one epoch (optionally device_put + sharded)."""
        indices = self._epoch_indices(epoch)
        n_batches = len(indices) // self.batch_size if self.drop_last else -(
            -len(indices) // self.batch_size)

        def make_batch(b):
            sl = indices[b * self.batch_size:(b + 1) * self.batch_size]
            samples = []
            for i in sl:
                rng = np.random.default_rng((self.seed, epoch, int(i)))
                samples.append(self.dataset.get(int(i), rng))
            return self._assemble(samples)

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    out_q.put(make_batch(b))
            finally:
                out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if self.sharding is not None and jax is not None:
                    batch = jax.device_put(batch, self.sharding)
                yield batch
        finally:
            stop.set()

    def __iter__(self):
        return self.epoch(0)

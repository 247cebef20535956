"""Host-side batch pipeline: threaded decode workers + device prefetch.

Replaces the reference's torch DataLoader (num_workers processes +
pin_memory, data/dataloader.py:33) with a TPU-idiomatic loader:

  * `batch_size` is the GLOBAL batch size; in multi-process runs each host
    decodes its batch_size/process_count slice of the (epoch-shuffled)
    index stream and the loader assembles a global sharded array via
    jax.make_array_from_process_local_data — every host sees the same
    number of steps (shards are truncated to equal length so collective
    steps never desynchronize)
  * a thread pool decodes/augments samples concurrently within each batch
  * a prefetch queue overlaps host IO AND the host->device upload with
    device compute: device placement (jax.device_put with the caller's
    sharding) runs in the producer thread, so the next batch streams up
    while the current step executes

Seeding: one numpy Generator per (epoch, sample) derived from the global
seed, so augmentation is reproducible and independent of worker timing
(the torch loader's per-worker RNG is timing-dependent; this is stricter).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import numpy as np

try:
    import jax
except ImportError:  # pragma: no cover
    jax = None


class SliceDataset:
    """A contiguous [start, stop) view of a dataset (same .get protocol).

    Used by the multi-host eval path: the verification folds are contiguous
    index ranges, so each process owns a contiguous block
    (eval.runner.process_pair_slice) rather than the strided shard the
    training loader uses.
    """

    def __init__(self, dataset, sl: slice):
        start, stop, step = sl.indices(len(dataset))
        if step != 1:
            raise ValueError("SliceDataset needs a contiguous slice")
        self.dataset = dataset
        self.start, self.stop = start, stop

    def __len__(self):
        return self.stop - self.start

    def get(self, idx, rng):
        if not 0 <= idx < len(self):
            raise IndexError(idx)
        return self.dataset.get(self.start + idx, rng)


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
        upload_in_producer: bool = True,
        pack=None,
    ):
        """pack: {"out_key": ("key_a", "key_b", ...)} — stack those sample
        keys on a new axis 1 into ONE contiguous array per batch. Through
        remote-attached devices each device_put buffer pays a fixed cost
        that can dwarf its bytes (measured 3.5-6x for 3 buffers vs 1 at
        identical size, BASELINE.md); packing the two image streams halves
        the buffer count. Axis 1 (not 0) so data-parallel sharding over
        axis 0 keeps each sample's pair on one device."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.sharding = sharding
        self.upload_in_producer = upload_in_producer
        self.pack = dict(pack) if pack else None
        if (process_index is None) != (process_count is None):
            raise ValueError("pass process_index and process_count together "
                             "(or neither, to use jax.process_*)")
        if process_index is None and jax is not None:
            try:
                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index or 0
        self.process_count = process_count or 1
        if not 0 <= self.process_index < self.process_count:
            raise ValueError(f"process_index {self.process_index} out of "
                             f"range for process_count {self.process_count}")
        if batch_size % self.process_count:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly over "
                f"{self.process_count} processes")
        self.local_batch = batch_size // self.process_count
        # identical on every host: shards truncated to equal length
        self.shard_len = len(dataset) // self.process_count

    def __len__(self):
        if self.drop_last:
            return self.shard_len // self.local_batch
        return -(-self.shard_len // self.local_batch)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
        # strided per-host shard of the shuffled stream, truncated so every
        # host agrees on the step count
        return idx[self.process_index::self.process_count][:self.shard_len]

    def _assemble(self, samples) -> Dict[str, np.ndarray]:
        keys = samples[0].keys()
        batch = {k: np.stack([s[k] for s in samples]) for k in keys}
        if self.pack:
            for out_key, src_keys in self.pack.items():
                batch[out_key] = np.stack(
                    [batch.pop(k) for k in src_keys], axis=1)
        return batch

    def _to_device(self, batch: Dict[str, np.ndarray]):
        if self.sharding is None or jax is None:
            return batch
        if self.process_count > 1:
            return {
                k: jax.make_array_from_process_local_data(
                    self.sharding[k] if isinstance(self.sharding, dict)
                    else self.sharding, v)
                for k, v in batch.items()
            }
        return jax.device_put(batch, self.sharding)

    def epoch(self, epoch: int = 0,
              start_batch: int = 0) -> Iterator[Dict[str, Any]]:
        """Yield batches for one epoch (optionally device_put + sharded).

        start_batch: skip the first batches WITHOUT decoding or uploading
        them (resume fast-forward; the per-(epoch, sample) RNG keeps
        augmentation identical to a full-epoch iteration, so batch k is
        bitwise the same whether or not 0..k-1 were produced).
        """
        indices = self._epoch_indices(epoch)
        n_batches = len(self)
        if not 0 <= start_batch <= n_batches:
            raise ValueError(
                f"start_batch {start_batch} out of range [0, {n_batches}]")

        pool = ThreadPoolExecutor(max_workers=self.num_threads)

        def load_one(i):
            rng = np.random.default_rng((self.seed, epoch, int(i)))
            return self.dataset.get(int(i), rng)

        def make_batch(b):
            sl = indices[b * self.local_batch:(b + 1) * self.local_batch]
            return self._assemble(list(pool.map(load_one, sl)))

        out_q: "queue.Queue" = queue.Queue(maxsize=max(self.prefetch, 1))
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # never block forever: a consumer that abandons the generator
            # sets `stop`, and we must not leak the thread
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        up_in_prod = self.upload_in_producer

        def producer():
            try:
                for b in range(start_batch, n_batches):
                    # device placement happens HERE, in the producer thread
                    # (default): through a relayed/remote device the put
                    # blocks on the transfer, so doing it inline with the
                    # consumer would serialize upload behind compute. In the
                    # producer the next batch's upload overlaps the current
                    # step, and the queue holds up to `prefetch` batches
                    # already on device.
                    batch = make_batch(b)
                    if up_in_prod:
                        batch = self._to_device(batch)
                    if not put_or_stop(batch):
                        return
                put_or_stop(None)
            except BaseException as e:  # propagate decode errors
                put_or_stop(e)
            finally:
                pool.shutdown(wait=False)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch if up_in_prod else self._to_device(batch)
        finally:
            stop.set()
            # drain so a blocked producer put() wakes and exits
            try:
                while True:
                    out_q.get_nowait()
            except queue.Empty:
                pass

    def __iter__(self):
        return self.epoch(0)

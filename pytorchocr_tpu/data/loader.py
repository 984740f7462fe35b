"""TPU-first torch-free data loader.

Replaces torch DataLoader + DistributedSampler (reference
pytocr/data/__init__.py:11-57) with a thread-pool loader designed for the
TPU training loop:

* workers run the cv2/numpy imaug chain concurrently (cv2 releases the GIL
  for the heavy ops), with a bounded prefetch window so host preprocessing
  overlaps the device step;
* per-host sharding is built in (`shard_index` / `num_shards` map to
  jax.process_index/count for multi-host pods) — each host only materializes
  its shard, and the global batch is formed by jax.make_array_from_process_
  local_data in the trainer;
* epoch reshuffling is seeded by (seed, epoch) — the torch
  `sampler.set_epoch` contract is folded into `set_epoch` here.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def default_collate(samples):
    """Stack positional fields across samples (the KeepKeys list contract)."""
    num_fields = len(samples[0])
    batch = []
    for i in range(num_fields):
        fields = [s[i] for s in samples]
        first = fields[0]
        if isinstance(first, np.ndarray):
            try:
                batch.append(np.stack(fields, axis=0))
            except ValueError:
                batch.append(fields)  # ragged (e.g. polys at eval bs>1)
        elif isinstance(first, (int, float, np.integer, np.floating)):
            batch.append(np.asarray(fields))
        else:
            batch.append(fields)
    return batch


class OCRDataLoader:
    """Iterable over collated numpy batches with background workers."""

    def __init__(
        self,
        dataset,
        batch_size,
        shuffle=False,
        drop_last=False,
        num_workers=4,
        seed=None,
        shard_index=0,
        num_shards=1,
        collate_fn=None,
        prefetch_factor=4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(int(num_workers), 1)
        self.seed = 0 if seed is None else int(seed)
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.collate_fn = collate_fn or default_collate
        self.prefetch_factor = prefetch_factor
        self._epoch = 0

    def set_epoch(self, epoch):
        self._epoch = int(epoch)

    def _epoch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        if self.num_shards > 1:
            # pad so every shard sees the same number of samples (mirrors
            # torch DistributedSampler's wrap-around)
            per_shard = -(-n // self.num_shards)
            padded = np.concatenate([order, order[: per_shard * self.num_shards - n]])
            order = padded[self.shard_index :: self.num_shards]
        return order

    def __len__(self):
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        indices = self._epoch_indices()
        n = len(indices)
        batches = []
        for start in range(0, n, self.batch_size):
            chunk = indices[start : start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)

        out_q = queue.Queue(maxsize=self.prefetch_factor)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                futures = []
                for chunk in batches:
                    if stop.is_set():
                        break
                    futures.append(pool.submit(self._load_batch, chunk))
                    # drain completed futures in order, keep window bounded
                    while len(futures) >= self.prefetch_factor:
                        f = futures.pop(0)
                        if self._emit(out_q, stop, f):
                            return
                for f in futures:
                    if self._emit(out_q, stop, f):
                        return
            out_q.put(None)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # unblock the producer if it is waiting on a full queue
            try:
                while True:
                    out_q.get_nowait()
            except queue.Empty:
                pass

    @staticmethod
    def _emit(out_q, stop, future):
        """Put a finished batch on the queue; returns True if consumer left."""
        try:
            result = future.result()
        except Exception as e:  # surface worker errors to the consumer
            result = e
        while not stop.is_set():
            try:
                out_q.put(result, timeout=0.5)
                return False
            except queue.Full:
                continue
        return True

    def _load_batch(self, chunk):
        samples = [self.dataset[int(i)] for i in chunk]
        return self.collate_fn(samples)

"""Host input pipeline: threaded JPEG decode -> numpy batches -> device
prefetch with batch-dim sharding.

Replaces the reference's torch DataLoader (chexpert.py:64-79, 16 fork
workers) with a TPU-appropriate design:
  * a thread pool decodes/crops JPEGs (PIL releases the GIL during decode);
  * a background producer assembles fixed-shape batches (the final partial
    batch is zero-padded and carries a validity mask — static shapes keep XLA
    from recompiling);
  * batches are device_put ahead of compute (`prefetch` deep) with the batch
    dim sharded over the mesh's data axis, overlapping H2D with the step.

Batch dict: image (B,H,W,3) f32, label (B,5) f32, index (B,) i64 original
dataframe indices, mask (B,) f32 (0 for padding).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from chexpert_tpu.data.chexpert import ChexpertIndex
from chexpert_tpu.data.transforms import decode_transform, expand_channels


class Batches:
    """Iterable over one epoch of batches (host numpy)."""

    def __init__(
        self,
        index: ChexpertIndex,
        batch_size: int,
        shuffle: bool = False,
        augment: bool = False,
        image_size: int = 320,
        resize: Optional[int] = None,
        workers: int = 8,
        drop_last: bool = False,
        seed: int = 0,
        epoch: int = 0,
        host_slice: Optional[slice] = None,
    ):
        self.index = index
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.image_size = image_size
        self.resize = resize
        self.workers = max(1, workers)
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = epoch
        # multi-host: this process's contiguous rows of each GLOBAL batch
        # (parallel.multihost.host_batch_slice); batches emitted here are then
        # local shards that device_prefetch assembles into global arrays.
        # Concatenating all processes' batches in process order reproduces the
        # single-process batch exactly (augment rngs are per-example-seeded).
        self.host_slice = host_slice or slice(0, batch_size)

    def __len__(self) -> int:
        n = len(self.index)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _decode(self, pos: int, rng: Optional[np.random.RandomState]) -> np.ndarray:
        return decode_transform(
            self.index.path(pos),
            image_size=self.image_size,
            resize=self.resize,
            augment=self.augment,
            rng=rng,
        )

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.index)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        hw = self.resize or self.image_size
        bs = self.batch_size
        lo, hi, _ = self.host_slice.indices(bs)
        local_bs = hi - lo  # this process's rows per global batch
        with ThreadPoolExecutor(self.workers) as pool:
            for start in range(0, n, bs):
                global_chunk = order[start : start + bs]
                if len(global_chunk) < bs and self.drop_last:
                    break
                # padding lives at the tail of the global batch, so the valid
                # rows of any contiguous host slice are a prefix of it
                batch_n = max(0, min(hi, len(global_chunk)) - lo)
                chunk = global_chunk[lo : lo + batch_n]
                rngs = [
                    np.random.RandomState(
                        (self.seed * 1_000_003 + self.epoch * 10_007 + int(p)) % (2**31)
                    )
                    if self.augment
                    else None
                    for p in chunk
                ]
                imgs = list(pool.map(self._decode, chunk, rngs))
                image = np.zeros((local_bs, hw, hw, 1), np.float32)
                label = np.zeros((local_bs, len(self.index.attr_idxs)), np.float32)
                idx = np.zeros((local_bs,), np.int64)
                mask = np.zeros((local_bs,), np.float32)
                if batch_n:
                    image[:batch_n] = np.stack(imgs)
                    label[:batch_n] = np.stack([self.index.labels(p) for p in chunk])
                    idx[:batch_n] = [self.index.index(p) for p in chunk]
                    mask[:batch_n] = 1.0
                # U-Ignore: -1 labels excluded from the loss per element
                label_mask = (label != -1.0).astype(np.float32)
                label = np.clip(label, 0.0, 1.0)
                yield {
                    "image": expand_channels(image),
                    "label": label,
                    "label_mask": label_mask,
                    "index": idx,
                    "mask": mask,
                }


def device_prefetch(batches, sharding=None, depth: int = 2):
    """Move batches to device ahead of compute.

    sharding: a jax.sharding.Sharding for the batch dim (or None for default
    placement). depth batches are kept in flight. In multi-process mode each
    host feeds its local batch shard and the global array is assembled from
    process-local data (addressable shards only — no cross-host transfer).

    The producer thread exits promptly when the consumer abandons the
    generator early (exception in a step, break out of the loop): its
    blocking put is bounded and re-checks a close event, so no device-resident
    batches stay pinned in HBM.
    """
    n_proc = jax.process_count()

    def put(b):
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, b)
        if n_proc > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(sharding, x), b
            )
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), b)

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()
    closed = threading.Event()
    err: list = []

    def offer(item) -> bool:
        """Bounded put that gives up once the consumer is gone."""
        while not closed.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for b in batches:
                if not offer(put(b)):
                    return
        except BaseException as e:  # surface decode errors to the consumer
            err.append(e)
        finally:
            offer(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        closed.set()  # unblock + terminate the producer on early exit

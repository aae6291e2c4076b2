"""Host data pipeline: sharded sampling, threaded loading, fixed-shape
batching, device prefetch.

TPU-native replacement for the reference's DataLoader + DistributedSampler
+ collate_mil stack (InvPT/main.py:104-107, utils/custom_collate.py:31-88):

  * `ShardedSampler` reproduces DistributedSampler(drop_last=True) semantics
    — per-epoch seeded shuffle, contiguous per-host shards, equal lengths
    (InvPT/main.py:104,147) — but for jax process indices.
  * `MultiTaskLoader` runs dataset __getitem__ + augmentation in a thread
    pool (cv2/numpy release the GIL), collates into fixed-shape float32
    NHWC batches (`meta` kept as a list — the collate_mil "skip idx keys"
    behaviour), and prefetches ahead of the device.
  * `device_put_batch` places a host batch on the mesh with batch-axis
    sharding, overlapping H2D with compute via double-buffered prefetch.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

import jax


class ShardedSampler:
    """Per-epoch shuffled, per-process contiguous shard, drop_last."""

    def __init__(self, n: int, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_shards: int = 1, shard_index: int = 0,
                 drop_last: bool = True):
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0
        self.drop_last = drop_last
        per_shard = n // num_shards
        self.per_shard = (per_shard // batch_size) * batch_size if drop_last \
            else per_shard

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[List[int]]:
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 1000003 + self.epoch)
            rng.shuffle(idx)
        if self.drop_last:
            shard = idx[self.shard_index::self.num_shards][:self.per_shard]
            for i in range(0, len(shard), self.batch_size):
                batch = shard[i:i + self.batch_size]
                if len(batch) == self.batch_size:
                    yield batch.tolist()
            return
        # eval (drop_last=False): every index appears in EXACTLY one shard
        # (no truncation), and all shards yield the SAME number of batches —
        # multi-host SPMD eval steps are collective programs, so every
        # process must step in lockstep; short shards / the trailing partial
        # batch are padded with -1 (the loader turns -1 into an all-ignore
        # sample that no metric meter counts)
        shard = idx[self.shard_index::self.num_shards]
        max_len = -(-self.n // self.num_shards)
        nb = -(-max_len // self.batch_size)
        padded = np.full(nb * self.batch_size, -1, np.int64)
        padded[:len(shard)] = shard
        for i in range(0, len(padded), self.batch_size):
            yield padded[i:i + self.batch_size].tolist()

    def __len__(self):
        if self.drop_last:
            return self.per_shard // self.batch_size
        return -(-(-(-self.n // self.num_shards)) // self.batch_size)


def collate(samples: List[Dict]) -> Dict:
    """Stack per-key; 'meta' (and any *idx key) stays a python list —
    mirrors collate_mil's special-casing (custom_collate.py:31-88)."""
    out = {}
    for k in samples[0]:
        if k == "meta" or k.endswith("idx"):
            out[k] = [s[k] for s in samples]
        elif isinstance(samples[0][k], np.ndarray):
            out[k] = np.stack([s[k] for s in samples]).astype(np.float32)
        else:
            out[k] = [s[k] for s in samples]
    return out


class MultiTaskLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 num_shards: int = 1, shard_index: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.sampler = ShardedSampler(len(dataset), batch_size, shuffle, seed,
                                      num_shards, shard_index, drop_last)
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.seed = seed

    def set_epoch(self, epoch: int):
        self.sampler.set_epoch(epoch)

    def __len__(self):
        return len(self.sampler)

    def _load_one(self, idx: int, epoch: int) -> Dict:
        if idx < 0:
            return self._ignore_sample()
        rng = np.random.default_rng(
            (self.seed * 7919 + epoch) * 1000003 + idx)
        try:
            return self.dataset.__getitem__(idx, rng=rng)
        except TypeError:
            return self.dataset[idx]

    def _ignore_sample(self) -> Dict:
        """A batch-padding sample no meter/loss/saver counts: labels filled
        with the ignore index, det boxes invalid, meta flagged 'pad'."""
        if getattr(self, "_pad_sample", None) is None:
            s = dict(self._load_one(0, 0))
            for k, v in s.items():
                if k == "meta":
                    s[k] = dict(v, pad=True) if isinstance(v, dict) else v
                elif not isinstance(v, np.ndarray) or k == "image":
                    continue
                elif k == "det_valid" or k.startswith("det_"):
                    s[k] = np.zeros_like(v)
                else:
                    s[k] = np.full_like(v, 255.0)
            self._pad_sample = s
        return self._pad_sample

    def __iter__(self):
        epoch = self.sampler.epoch
        batches = list(self.sampler)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(
                        lambda i: self._load_one(i, epoch), b))
                    q.put(collate(samples))
            q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def pad_batch_to_multiple(batch: Dict, m: int, ignore: float = 255.0) -> Dict:
    """Pad the batch axis up to a multiple of ``m`` so it shards over the
    data mesh. Padded label entries are filled with the ignore index (and
    det_valid with 0) so metric meters and losses never count them; padded
    images repeat the last sample."""
    sizes = [v.shape[0] for v in batch.values() if isinstance(v, np.ndarray)]
    if not sizes:
        return batch
    B = sizes[0]
    pad = (-B) % m
    if pad == 0:
        return batch
    out = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray):
            out[k] = v
            continue
        tail_shape = (pad,) + v.shape[1:]
        if k == "image":
            tail = np.repeat(v[-1:], pad, axis=0)
        elif k == "det_valid":
            tail = np.zeros(tail_shape, v.dtype)
        elif k.startswith("det_"):
            tail = np.zeros(tail_shape, v.dtype)
        else:
            tail = np.full(tail_shape, ignore, v.dtype)
        out[k] = np.concatenate([v, tail], axis=0)
    return out


def device_put_batch(batch: Dict, sharding=None) -> Dict:
    """Move numpy batch to device(s); arrays sharded on the batch axis.
    Batches that don't divide the mesh are ignore-padded first.

    Multi-host: each process holds only its local shard of the global
    batch, so the global array is assembled with
    ``jax.make_array_from_process_local_data`` (global batch =
    local batch x process_count); plain device_put with a global
    NamedSharding would fail across processes."""
    nproc = jax.process_count()
    if sharding is not None and hasattr(sharding, "num_devices"):
        batch = pad_batch_to_multiple(
            batch, max(1, sharding.num_devices // nproc))
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if sharding is not None and nproc > 1:
                out[k] = jax.make_array_from_process_local_data(sharding, v)
            elif sharding is not None:
                out[k] = jax.device_put(v, sharding)
            else:
                out[k] = jax.device_put(v)
        else:
            out[k] = v
    return out


def prefetch_to_device(iterator, sharding=None, size: int = 2):
    """Double-buffered H2D prefetch generator."""
    buf = []
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(device_put_batch(next(it), sharding))
    except StopIteration:
        pass
    while buf:
        nxt = buf.pop(0)
        try:
            buf.append(device_put_batch(next(it), sharding))
        except StopIteration:
            pass
        yield nxt

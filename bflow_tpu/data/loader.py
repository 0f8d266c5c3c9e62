"""Batched, threaded, prefetching data loader.

The reference uses torch DataLoader worker *processes* because the voxel
rasterization is Python-heavy. Here the hot per-item work — HDF5 chunk IO,
zstd/gzip decompression, NumPy scatter-adds — releases the GIL, so a
thread pool gets the same parallelism without pickling/IPC overhead, and
the produced batches are ready-to-`device_put` NumPy arrays.

Determinism: per-epoch, per-item RNGs are derived from (seed, epoch,
index) with `np.random.SeedSequence`, so augmentation is reproducible
regardless of worker scheduling — stronger than the reference's global
torch RNG, and independent of the number of workers.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import numpy as np

from bflow_tpu.data.keys import DataLoading as K

# Keys whose per-item leading axis must stay leading in the batch:
# IMG (2, H, W, 3) -> (2, N, H, W, 3); MultiFlow FLOW (M, H, W, 2)
# -> (M, N, H, W, 2). Everything else batches at axis 0.
_AXIS1_KEYS = {K.IMG.value}


def _collate(items: list) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    first = items[0]
    for key, val in first.items():
        vals = [it[key] for it in items]
        if isinstance(val, dict):
            out[key] = _collate(vals)
        elif isinstance(val, np.ndarray):
            stacked = np.stack(vals)
            if key in _AXIS1_KEYS or (key == K.FLOW.value and val.ndim == 4):
                stacked = np.moveaxis(stacked, 0, 1)
            out[key] = stacked
        else:
            out[key] = np.asarray(vals)
    return out


def make_loader(dataset, kind: str = "threaded", **kw):
    """Config-selectable input pipeline (`hardware.loader`):

    'threaded' -> the in-repo thread-pool Loader below;
    'grain'    -> multiprocess Grain pipeline (grain_loader.py), which
                  also shards by JAX process for multi-host runs.
    """
    if kind in (None, "threaded"):
        return Loader(dataset, **kw)
    if kind == "grain":
        from bflow_tpu.data.grain_loader import make_grain_loader

        kw.pop("prefetch_batches", None)
        kw["drop_remainder"] = kw.pop("drop_last", True)
        return make_grain_loader(dataset, **kw)
    raise ValueError(f"unknown loader kind: {kind!r}")


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        prefetch_batches: int = 2,
        shard: "tuple[int, int] | None" = None,
    ):
        assert batch_size >= 1
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch_batches)
        self.epoch = 0
        # (rank, world): multi-host data feeding — every host builds the
        # SAME (seed, epoch)-keyed global order and takes the strided
        # slice order[rank::world] (truncated to equal length), so the
        # union over hosts is a disjoint cover of the global epoch.
        self.shard = shard
        if shard is not None:
            rank, world = shard
            assert 0 <= rank < world, shard

    def _epoch_len(self) -> int:
        n = len(self.dataset)
        if self.shard is not None:
            n = n // self.shard[1]
        return n

    def __len__(self) -> int:
        n = self._epoch_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def peek(self) -> Dict[str, Any]:
        """One deterministic batch (dataset head) WITHOUT starting the
        producer pipeline — `next(iter(loader))` abandons an iterator
        whose prefetch thread then blocks forever on the queue. Used to
        derive shapes/initialize parameters."""
        rng = np.random.default_rng(self.seed)
        items = [
            self._fetch_with(i, rng)
            for i in range(min(self.batch_size, len(self.dataset)))
        ]
        return _collate(items)

    def _fetch_with(self, index: int, rng):
        get_item = getattr(self.dataset, "get_item", None)
        if get_item is not None:
            return get_item(int(index), rng)
        return self.dataset[int(index)]

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _fetch(self, index: int) -> Dict[str, Any]:
        rng = np.random.default_rng(
            np.random.SeedSequence((self.seed, self.epoch, index))
        )
        get_item = getattr(self.dataset, "get_item", None)
        if get_item is not None:
            return get_item(index, rng)
        return self.dataset[index]

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                np.random.SeedSequence((self.seed, self.epoch))
            ).permutation(n)
        if self.shard is not None:
            rank, world = self.shard
            order = order[rank :: world][: self._epoch_len()]
        nb = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    try:
                        items = list(pool.map(self._fetch, idxs))
                        out_q.put(_collate(items))
                    except Exception as e:  # surface in consumer
                        out_q.put(e)
                        return
            out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

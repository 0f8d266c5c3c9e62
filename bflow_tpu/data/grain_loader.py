"""Grain-based input pipeline (multiprocess workers, checkpointable).

Alternative to the in-repo threaded Loader (bflow_tpu/data/loader.py):
Grain gives worker *processes* (bypassing the GIL for the Python-heavy
parts of augmentation), deterministic global shuffling, per-record RNG
derived from (seed, epoch, index), multi-host sharding via
`ShardByJaxProcess`, and iterator checkpointing.

Our map-style datasets plug in directly as RandomAccessDataSources; a
RandomMapTransform routes Grain's per-record RNG into `get_item` so
augmentation stays reproducible, and the same collation as the threaded
loader produces NHWC batches (IMG/multi-timestamp-FLOW keep their
leading stack axes).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from bflow_tpu.data.keys import DataLoading as K
from bflow_tpu.data.loader import _collate


def make_grain_loader(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    num_workers: int = 4,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    drop_remainder: bool = True,
    shard_by_process: bool = True,
):
    """Returns an iterable of collated NHWC batch dicts."""
    import grain.python as gp

    class _Source:
        def __len__(self):
            return len(dataset)

        def __getitem__(self, index: int):
            return index  # records are indices; the map stage loads

    class _Load(gp.RandomMapTransform):
        def random_map(self, index, rng: np.random.Generator):
            get_item = getattr(dataset, "get_item", None)
            if get_item is not None:
                return get_item(int(index), rng)
            return dataset[int(index)]

    class _FixAxes(gp.MapTransform):
        """Grain's Batch stacks every leaf at axis 0; restore the batch
        conventions (IMG keeps its 2-frame stack leading, MultiFlow FLOW
        keeps its timestamp stack leading)."""

        def map(self, batch: Dict[str, Any]) -> Dict[str, Any]:
            out = dict(batch)
            img = out.get(K.IMG.value)
            if img is not None and img.ndim >= 5:
                out[K.IMG.value] = np.moveaxis(img, 0, 1)
            flow = out.get(K.FLOW.value)
            if flow is not None and flow.ndim == 5:
                out[K.FLOW.value] = np.moveaxis(flow, 0, 1)
            return out

    shard = (
        gp.ShardByJaxProcess(drop_remainder=True)
        if shard_by_process
        else gp.NoSharding()
    )

    def build(epoch: int):
        sampler = gp.IndexSampler(
            num_records=len(dataset),
            shuffle=shuffle,
            # fresh shuffle order per epoch, like the threaded Loader's
            # per-(epoch, index) RNG reseeding
            seed=seed + epoch,
            num_epochs=num_epochs if num_epochs is not None else 1,
            shard_options=shard,
        )
        return gp.DataLoader(
            data_source=_Source(),
            sampler=sampler,
            operations=[
                _Load(),
                gp.Batch(
                    batch_size=batch_size, drop_remainder=drop_remainder
                ),
                _FixAxes(),
            ],
            worker_count=num_workers,
        )

    class _EpochLoader:
        """Re-iterable wrapper: drop-in for the threaded Loader (len()
        + one pass per __iter__, reshuffled each epoch)."""

        def __init__(self):
            self.epoch = 0

        def set_epoch(self, epoch: int) -> None:
            """Pin the shuffle epoch (trainer calls this every epoch so
            resumed runs reshuffle from the resumed epoch, not 0)."""
            self.epoch = epoch

        def __len__(self) -> int:
            n = len(dataset)
            if shard_by_process:
                # ShardByJaxProcess(drop_remainder=True): each process
                # sees floor(n / P) records
                import jax

                n = n // jax.process_count()
            if drop_remainder:
                return n // batch_size
            return (n + batch_size - 1) // batch_size

        def peek(self):
            """One deterministic head batch without spawning the Grain
            worker pool or consuming an epoch (shape/init probing)."""
            rng = np.random.default_rng(seed)
            items = []
            for i in range(min(batch_size, len(dataset))):
                get_item = getattr(dataset, "get_item", None)
                items.append(
                    get_item(i, rng) if get_item is not None else dataset[i]
                )
            # same recursive collation as the threaded loader — nested
            # dict leaves (e.g. MultiFlow BIN_META) stay dicts of
            # arrays, and IMG/FLOW axis conventions are applied inside
            return _collate(items)

        def __iter__(self):
            it = iter(build(self.epoch))
            self.epoch += 1
            return it

    return _EpochLoader()

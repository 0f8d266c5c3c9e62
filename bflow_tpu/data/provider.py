"""Dataset provider interface + simple dataset composition utilities."""

from __future__ import annotations

import abc
import bisect
from typing import List, Sequence


class DatasetProviderBase(abc.ABC):
    """Mirror of the reference provider ABC (/root/reference/data/utils/
    provider.py): train/val/test datasets + temporal-bin metadata."""

    @abc.abstractmethod
    def get_train_dataset(self):
        ...

    @abc.abstractmethod
    def get_val_dataset(self):
        ...

    @abc.abstractmethod
    def get_test_dataset(self):
        ...

    @abc.abstractmethod
    def get_nbins_context(self) -> int:
        ...

    @abc.abstractmethod
    def get_nbins_correlation(self) -> int:
        ...


class ConcatDataset:
    """Random-access concatenation of map-style datasets."""

    def __init__(self, datasets: Sequence):
        assert len(datasets) > 0
        self.datasets = list(datasets)
        self.cum: List[int] = []
        total = 0
        for d in self.datasets:
            total += len(d)
            self.cum.append(total)

    def __len__(self) -> int:
        return self.cum[-1]

    def __getitem__(self, index: int):
        if index < 0:
            index += len(self)
        assert 0 <= index < len(self), index
        ds_idx = bisect.bisect_right(self.cum, index)
        prev = self.cum[ds_idx - 1] if ds_idx > 0 else 0
        return self.datasets[ds_idx][index - prev]

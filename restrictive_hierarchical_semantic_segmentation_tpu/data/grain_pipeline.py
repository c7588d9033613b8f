"""Grain-backed input pipeline — the idiomatic TPU host data stack
(SURVEY §7: "host-side (grain-style) pipeline ... fixed-shape batches
prefetched to device").

Wraps :class:`SegDataset` as a grain ``RandomMapTransform`` so grain provides
deterministic per-record RNG, epoch handling, sharding across data-loading
hosts, and (on multi-core machines) process-based workers — while the sample
math stays identical to the threaded ``BatchLoader`` (same numpy/native code).

Optional: ``BatchLoader`` remains the default; select with
``RunConfig.loader="grain"``. Gated import — everything degrades to the
threaded loader when grain is unavailable.
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from .dataset import SegDataset

__all__ = ["grain_available", "GrainLoader"]


def grain_available() -> bool:
    try:
        import grain.python  # noqa: F401

        return True
    except Exception:
        return False


class GrainLoader:
    """Drop-in replacement for ``BatchLoader`` built on grain.DataLoader."""

    def __init__(
        self,
        dataset: SegDataset,
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        seed: int = 0,
        num_workers: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        import grain.python as gp

        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.shard = gp.ShardOptions(
            shard_index=shard_index, shard_count=shard_count,
            drop_remainder=drop_last,
        )
        self.epoch = 0

        ds = dataset

        class _Source:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                return int(i)

        class _Sample(gp.RandomMapTransform):
            def random_map(self, idx, rng: np.random.Generator):
                return ds.__getitem__(int(idx), rng)

        self._gp = gp
        self._source = _Source()
        self._sample = _Sample()

    def __len__(self) -> int:
        n = len(self.dataset) // self.shard.shard_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        gp = self._gp
        sampler = gp.IndexSampler(
            num_records=len(self.dataset),
            shuffle=self.shuffle,
            seed=self.seed + self.epoch,  # fresh order + augs per epoch
            num_epochs=1,
            shard_options=self.shard,
        )
        loader = gp.DataLoader(
            data_source=self._source,
            sampler=sampler,
            operations=[
                self._sample,
                gp.Batch(self.batch_size, drop_remainder=self.drop_last),
            ],
            worker_count=self.num_workers,
        )
        for batch in loader:
            yield batch[0], batch[1]

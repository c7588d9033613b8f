"""Host data loading: splits, batched multi-threaded decode, device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` + fork-worker stack
(Data/dataloaders.py:42-195) with a TPU-idiomatic pipeline:

* deterministic 80/10/10 splits identical to the reference's
  ``train_test_split(random_state=42)`` (dataloaders.py:12-39; the undefined
  ``val_size`` NameError — SURVEY §4 defect #3 — is fixed to the intended 10%);
* a thread-pool batch assembler (cv2/numpy release the GIL) producing fixed
  static-shape NHWC float32 batches (train: shuffle + drop_last,
  dataloaders.py:170-176);
* ``prefetch_to_device``: a double-buffered generator that overlaps host
  decode/augment with device compute by keeping N batches in flight via
  ``jax.device_put``.
"""
from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .dataset import SegDataset

__all__ = ["split_ids", "BatchLoader", "prefetch_to_device"]

# ---------------------------------------------------------------------------
# Process-pool workers (worker_mode="process").
#
# The torch reference forks DataLoader workers (dataloaders.py:43-46). Fork
# is unsafe here (and on any host where the parent holds a live TPU client):
# this environment's site hook claims the TPU in EVERY new python process
# whenever PALLAS_AXON_POOL_IPS is set, so naively-spawned children fight the
# parent for the chip and crash. The fix is a *spawn* context with the
# accelerator environment scrubbed while the children boot: the workers are
# pure cv2/numpy pixel crunchers and must never touch JAX. Sample RNG is
# seeded per (seed, epoch, index) exactly like the thread path, so thread and
# process modes produce bit-identical batches.
# ---------------------------------------------------------------------------

_WORKER_DS = None

# env vars that make a freshly-booted python claim or look for an accelerator
_ACCEL_ENV = ("PALLAS_AXON_POOL_IPS", "TPU_WORKER_HOSTNAMES",
              "PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_TPU_GEN")


def _worker_init(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _worker_load(args):
    ds_index, sample_seed = args
    rng = np.random.default_rng(sample_seed)
    return _WORKER_DS.__getitem__(int(ds_index), rng)


def _split_cache_budget(dataset, num_workers: int):
    """Each spawn worker gets its OWN pickled copy of the dataset, so a
    per-dataset byte budget would multiply by num_workers; split it so the
    TOTAL across workers honors the documented cache_bytes bound."""
    cache = getattr(dataset, "_cache", None)
    if cache is None or num_workers <= 1 or getattr(
            cache, "cap_bytes", 0) <= 0:
        return dataset
    import copy

    from .dataset import ByteCappedCache

    dataset = copy.copy(dataset)
    per_worker = cache.cap_bytes // num_workers
    if per_worker == 0:
        # budget smaller than the worker count: process-mode caching is
        # effectively OFF. Say so — a silent zero reads as "cache on".
        print(f"[loader] cache_bytes={cache.cap_bytes} split over "
              f"{num_workers} workers -> 0 bytes each: per-worker caching "
              "disabled (raise cache_bytes or lower num_workers)",
              flush=True)
    dataset._cache = ByteCappedCache(per_worker)
    dataset._bits_cache = dataset._img_cache = dataset._cache
    return dataset


def _make_process_pool(dataset, num_workers: int):
    import multiprocessing as mp
    import os

    dataset = _split_cache_budget(dataset, num_workers)
    saved = {}
    for k in _ACCEL_ENV:
        if k in os.environ:
            saved[k] = os.environ.pop(k)
    prev_jp = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"  # belt-and-braces: a child that does
    # import jax must never dial the parent's chip
    try:
        ctx = mp.get_context("spawn")
        return ctx.Pool(num_workers, initializer=_worker_init,
                        initargs=(dataset,))
    finally:
        os.environ.update(saved)
        if prev_jp is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = prev_jp


def split_ids(
    n: int, has_val: bool, has_test: bool, test_remove: bool, seed: int = 42
):
    """Reference split_ids semantics (dataloaders.py:12-39), fixed.

    Returns (train_idx, test_idx or None, val_idx)."""
    from sklearn.model_selection import train_test_split

    idx = np.arange(n)
    val_size = int(round(0.10 * n))
    test_size = int(round(0.10 * n))
    if has_val:
        train_idx, val_idx = idx, None
    else:
        train_idx, val_idx = train_test_split(
            idx, test_size=val_size, random_state=seed
        )
    test_idx = None
    if not test_remove and not has_test:
        train_idx, test_idx = train_test_split(
            train_idx, test_size=test_size, random_state=seed
        )
    return train_idx, test_idx, val_idx


class BatchLoader:
    """Iterable over (image, target) numpy batches with static shapes."""

    def __init__(
        self,
        dataset: SegDataset,
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        seed: int = 0,
        num_workers: int = 8,
        indices: Optional[Sequence[int]] = None,
        worker_mode: str = "thread",
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, int(num_workers))
        self.indices = (
            np.asarray(indices, np.int64)
            if indices is not None
            else np.arange(len(dataset))
        )
        self.epoch = 0
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode: {worker_mode!r}")
        self.worker_mode = worker_mode
        if worker_mode == "process":
            self._pool = _make_process_pool(dataset, self.num_workers)
        else:
            self._pool = cf.ThreadPoolExecutor(max_workers=self.num_workers)

    def close(self):
        """Shut the worker pool down (process pools hold OS resources)."""
        if self.worker_mode == "process":
            self._pool.terminate()
            self._pool.join()
        else:
            self._pool.shutdown(wait=False)

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def _load_one(self, ds_index: int, sample_seed: int):
        rng = np.random.default_rng(sample_seed)
        return self.dataset.__getitem__(int(ds_index), rng)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self.indices.copy()
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        nb = len(self)
        for b in range(nb):
            chunk = order[b * self.batch_size : (b + 1) * self.batch_size]
            seeds = [
                self.seed * 1_000_003 + self.epoch * 131_071 + int(i)
                for i in chunk
            ]
            if self.worker_mode == "process":
                samples = self._pool.map(
                    _worker_load, [(int(i), s) for i, s in zip(chunk, seeds)]
                )
            else:
                samples = list(self._pool.map(self._load_one, chunk, seeds))
            ims = [s[0] for s in samples]
            if len({im.shape[-1] for im in ims}) > 1:
                # mixed gray(1ch-compact)/RGB sources in one batch: broadcast
                # the compact ones so the stack is rectangular
                ims = [
                    np.broadcast_to(im, im.shape[:-1] + (3,))
                    if im.shape[-1] == 1 else im
                    for im in ims
                ]
            xs = np.stack(ims)
            ys = np.stack([s[1] for s in samples])
            yield xs, ys


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Keep ``size`` batches in flight on device (double buffering).

    ``sharding``: optional ``jax.sharding.Sharding`` so batches land already
    laid out for the pjit'ed step (no device-side reshard).
    """
    import collections

    import jax

    queue = collections.deque()
    multiproc = jax.process_count() > 1

    def _put_one(x):
        if sharding is None:
            return jax.device_put(x)
        if multiproc and not getattr(sharding, "is_fully_addressable", True):
            # multi-process (jax.distributed): device_put cannot target
            # remote devices. Every process runs the same deterministic
            # loader, so the full global batch is locally available —
            # assemble the global array by slicing this process's shards
            # out of it (no cross-process communication).
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx])
        return jax.device_put(x, sharding)

    def put(batch):
        return jax.tree_util.tree_map(_put_one, batch)

    it = iter(iterator)
    try:
        while len(queue) < size:
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass

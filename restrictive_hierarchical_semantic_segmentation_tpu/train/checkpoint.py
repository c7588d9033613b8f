"""Checkpointing: orbax-backed best/last with the reference's semantics.

Reference (train.py:666-709): save ``{epoch, model_state_dict,
optimizer_state_dict, loss, test_measure_mean, test_measure_std}`` as
``new_best.pt`` -> delete ``best.pt`` -> rename (two-phase, crash-safe-ish);
same for ``last.pt``. Selection metric: val mean Dice excluding background.

Here: orbax ``StandardCheckpointer`` saves the full ``TrainState`` pytree
(params + batch_stats + optimizer state + step) to ``<name>.tmp`` and renames
over ``<name>``; the scalar metadata rides in a ``meta.json`` sidecar inside
the checkpoint directory.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from .state import TrainState

__all__ = ["save_checkpoint", "load_checkpoint", "CheckpointManager"]

_META = "rhss_meta.json"


def save_checkpoint(path: str, state: TrainState, **meta) -> None:
    """Two-phase save: write ``path.tmp`` then rename over ``path``."""
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, state)
    ckptr.wait_until_finished()
    with open(os.path.join(tmp, _META), "w") as f:
        json.dump({k: float(v) for k, v in meta.items()}, f)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def load_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, Dict]:
    """Restore onto the template ``state``'s structure/shardings; returns
    (state, meta)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=state)
    meta_path = os.path.join(path, _META)
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta


class CheckpointManager:
    """best.ckpt / last.ckpt pair with the reference's update policy."""

    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self.prev_best: Optional[float] = None
        # resume: a prior run's best.ckpt keeps gating best-saves so the
        # resumed trajectory's decisions match an uninterrupted run's
        meta_path = os.path.join(self.best_path, _META)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                prior = json.load(f)
            if "test_measure_mean" in prior:
                self.prev_best = float(prior["test_measure_mean"])

    @property
    def best_path(self) -> str:
        return os.path.join(self.save_dir, "best.ckpt")

    @property
    def last_path(self) -> str:
        return os.path.join(self.save_dir, "last.ckpt")

    def update(self, state: TrainState, epoch: int, loss: float,
               test_measure_mean: float, test_measure_std: float,
               **extra_meta) -> bool:
        """Save last; save best iff the selection metric improved
        (train.py:664: strictly greater). Returns True if best updated.
        ``extra_meta``: additional scalars (e.g. scheduler state for exact
        resume) stored in the meta sidecar."""
        meta = dict(
            epoch=epoch,
            loss=loss,
            test_measure_mean=test_measure_mean,
            test_measure_std=test_measure_std,
            **extra_meta,
        )
        is_best = self.prev_best is None or test_measure_mean > self.prev_best
        if is_best:
            save_checkpoint(self.best_path, state, **meta)
            self.prev_best = test_measure_mean
        save_checkpoint(self.last_path, state, **meta)
        return is_best

"""Checkpointing: orbax-backed best/last with the reference's semantics.

Reference (train.py:666-709): save ``{epoch, model_state_dict,
optimizer_state_dict, loss, test_measure_mean, test_measure_std}`` as
``new_best.pt`` -> delete ``best.pt`` -> rename (two-phase, crash-safe-ish);
same for ``last.pt``. Selection metric: val mean Dice excluding background.

Here: orbax ``PyTreeCheckpointer`` writes to ``<name>.tmp`` then atomically
renames over ``<name>`` (directories, since orbax checkpoints are dirs).
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState

__all__ = ["save_checkpoint", "load_checkpoint", "CheckpointManager"]


def _to_saveable(state: TrainState, meta: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {k: np.asarray(v) for k, v in meta.items()},
    }


def save_checkpoint(path: str, state: TrainState, **meta) -> None:
    """Two-phase save: write ``path.tmp`` then rename over ``path``."""
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    for p in (tmp,):
        if os.path.exists(p):
            shutil.rmtree(p)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(tmp, _to_saveable(state, meta))
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def load_checkpoint(path: str, state: Optional[TrainState] = None):
    """Load; with a template ``state``, restores onto its structure/shardings
    and returns (state, meta). Without, returns the raw pytree."""
    ckptr = ocp.PyTreeCheckpointer()
    if state is None:
        return ckptr.restore(os.path.abspath(path))
    template = _to_saveable(state, {})
    restored = ckptr.restore(
        os.path.abspath(path), args=ocp.args.PyTreeRestore(item=template)
    )
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, restored.get("meta", {})


class CheckpointManager:
    """best.ckpt / last.ckpt pair with the reference's update policy."""

    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self.prev_best: Optional[float] = None

    @property
    def best_path(self) -> str:
        return os.path.join(self.save_dir, "best.ckpt")

    @property
    def last_path(self) -> str:
        return os.path.join(self.save_dir, "last.ckpt")

    def update(self, state: TrainState, epoch: int, loss: float,
               test_measure_mean: float, test_measure_std: float) -> bool:
        """Save last; save best iff the selection metric improved
        (train.py:664: strictly greater). Returns True if best updated."""
        meta = dict(
            epoch=epoch,
            loss=loss,
            test_measure_mean=test_measure_mean,
            test_measure_std=test_measure_std,
        )
        is_best = self.prev_best is None or test_measure_mean > self.prev_best
        if is_best:
            save_checkpoint(self.best_path, state, **meta)
            self.prev_best = test_measure_mean
        save_checkpoint(self.last_path, state, **meta)
        return is_best

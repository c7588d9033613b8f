"""Device mesh + sharding rules — the framework's communication layer.

The reference's only multi-device machinery is ``nn.DataParallel``
(train.py:509-510) plus SyncBatchNorm (bn_helper.py:10) — single-process
replicate/scatter/gather with queue-based stat exchange (functions.py:157-230).
The TPU-native replacement is declarative SPMD: one ``jax.sharding.Mesh`` with

* ``data``  — batch-dimension data parallelism (gradients reduced by XLA
  ``psum`` over ICI; SyncBatchNorm falls out of global-batch BN statistics);
* ``space`` — optional spatial sharding of the H dimension (the
  sequence/context-parallel analog for 620x620 CNN activations; XLA inserts
  halo exchanges for convs automatically).

No transport code exists anywhere in the framework: collectives are compiled
by XLA from sharding annotations. Multi-host extends the same mesh over DCN
via ``jax.distributed.initialize`` (see ``init_distributed``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "DATA_AXIS",
    "SPACE_AXIS",
    "FOLD_AXIS",
    "make_mesh",
    "make_fold_mesh",
    "batch_sharding",
    "replicated",
    "init_distributed",
]

DATA_AXIS = "data"
SPACE_AXIS = "space"
FOLD_AXIS = "fold"


def make_mesh(
    n_data: Optional[int] = None,
    n_space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, space) mesh over the available devices.

    Defaults to all devices on the data axis. ``n_space > 1`` carves a spatial
    sharding axis out of the same devices (n_data * n_space must equal the
    device count used).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_space
    use = n_data * n_space
    if use > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_space} needs {use} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:use]).reshape(n_data, n_space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def make_fold_mesh(
    n_folds: int,
    batch_size: int,
    n_space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(fold, data, space) mesh for fold-parallel cross-validation training.

    The reference trains its 5 folds strictly sequentially (train.py:546);
    here every fold is an independent slice of ONE vmapped SPMD program, so
    the fold axis is embarrassingly parallel over devices (zero cross-fold
    collectives — gradient/BN reductions stay inside each fold's submesh).

    Axis sizing: the fold axis gets the largest divisor of ``n_folds`` that
    fits the device count (5 folds on a v5e-8 -> fold=5 over 5 chips; 4 folds
    -> fold=4 x data=2 over all 8); remaining devices go to the data axis
    (largest divisor of ``batch_size``), then ``n_space``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    if n_space < 1 or n_space > n_dev:
        raise ValueError(f"n_space={n_space} with {n_dev} devices")
    n_fold = max(f for f in range(1, n_folds + 1)
                 if n_folds % f == 0 and f * n_space <= n_dev)
    avail = n_dev // (n_fold * n_space)
    n_data = max(d for d in range(1, avail + 1) if batch_size % d == 0)
    use = n_fold * n_data * n_space
    if use < n_dev:
        print(f"make_fold_mesh: using {use} of {n_dev} devices "
              f"(fold={n_fold} x data={n_data} x space={n_space}; "
              f"{n_dev - use} idle — fold/batch divisibility)")
    arr = np.asarray(devices[:use]).reshape(n_fold, n_data, n_space)
    return Mesh(arr, (FOLD_AXIS, DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batches: batch over ``data``, H over ``space``."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator: Optional[str] = None, **kw) -> None:
    """Multi-host entry: call once per process before building the mesh.
    Single-host (the common case) is a no-op."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator, **kw)

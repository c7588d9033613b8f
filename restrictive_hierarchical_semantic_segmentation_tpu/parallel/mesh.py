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
    "make_mesh",
    "batch_sharding",
    "replicated",
    "init_distributed",
]

DATA_AXIS = "data"
SPACE_AXIS = "space"


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

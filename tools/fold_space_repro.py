"""Minimal repro / retry harness for the fold x space XLA partitioner CHECK.

Round 2 found that composing the shard_map-MANUAL fold axis with AUTO spatial
sharding (mesh (fold, data, space), space > 1) crashes XLA's GSPMD partitioner
with a CHECK failure (PartitionGather / ExpandDeviceGroupsWithIota) — a hard
process abort, not a Python exception — so train/fold_parallel.py:80-89
refuses the combination with a ValueError. VERDICT r2 asked for (a) a
recorded minimal repro and (b) a retry with `space` MANUAL alongside `fold`.

Run: JAX_PLATFORMS=cpu python tools/fold_space_repro.py [--mode auto|manual]

* --mode auto   (default): fold manual, space auto — the crashing config.
* --mode manual: fold AND space manual. NOTE this is a compile-only probe:
  with `space` manual, conv halo exchanges are NOT inserted (shard_map manual
  means the user owns cross-shard comms), so the numerics crop at shard
  edges — it answers "does the partitioner accept it", not "is it correct".
  A correct manual-space path would need explicit halo collectives per conv
  (jax.lax.ppermute edge exchange), which is the round-4+ design if spatial
  sharding inside fold-parallel ever becomes load-bearing.

Exit code 0 = compiled+ran; a CHECK abort kills the process (non-zero).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["auto", "manual"], default="auto")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--resize", choices=["gather", "matmul"], default="gather",
                    help="resize formulation: the gather/lerp passes are the "
                         "PartitionGather trigger; 'matmul' is the gather-free "
                         "banded-contraction formulation (ops/resize.py)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from restrictive_hierarchical_semantic_segmentation_tpu.parallel.mesh import (
        DATA_AXIS, FOLD_AXIS, SPACE_AXIS, make_fold_mesh,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        make_train_step,
    )
    import __graft_entry__ as G

    tree = G._tree()
    model = G._flagship(tree, 64, tiny=True)
    F, B, S = 2, 2, 64
    x = np.random.default_rng(0).normal(size=(B, S, S, 3)).astype(np.float32)
    y = np.zeros((B, S, S, tree.num_classes), np.float32)
    y[..., 0] = 1.0
    state, tx = create_train_state(model, jax.random.PRNGKey(0), x[:1], 1e-3)

    fmesh = make_fold_mesh(F, B, n_space=2, devices=jax.devices())
    print(f"mesh: {dict(zip(fmesh.axis_names, fmesh.devices.shape))} "
          f"mode={args.mode}", flush=True)
    fstate = jax.device_put(
        jax.tree_util.tree_map(lambda l: jnp.stack([l] * F), state),
        NamedSharding(fmesh, P(FOLD_AXIS)))
    fb = NamedSharding(fmesh, P(FOLD_AXIS, DATA_AXIS, SPACE_AXIS, None, None))
    raw = make_train_step(model, tx, tree, hierarchical=True, donate=False,
                          jit=False)
    manual = {FOLD_AXIS} if args.mode == "auto" else {FOLD_AXIS, SPACE_AXIS}
    fstep = jax.jit(jax.shard_map(
        jax.vmap(raw, in_axes=(0, 0, 0, None)),
        mesh=fmesh,
        in_specs=(P(FOLD_AXIS), P(FOLD_AXIS), P(FOLD_AXIS), P()),
        out_specs=(P(FOLD_AXIS), P(FOLD_AXIS)),
        axis_names=frozenset(manual),
        check_vma=False,
    ))
    from restrictive_hierarchical_semantic_segmentation_tpu.ops.resize import (
        resize_method,
    )

    with resize_method(args.resize):
        _, aux = fstep(fstate, jax.device_put(np.stack([x] * F), fb),
                       jax.device_put(np.stack([y] * F), fb),
                       jnp.ones((tree.num_levels,), jnp.float32))
    losses = np.asarray(jax.device_get(aux["loss"]))
    print(f"SURVIVED: losses={losses.tolist()}")


if __name__ == "__main__":
    main()

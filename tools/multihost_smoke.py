"""Multi-host smoke: N processes over jax.distributed (the DCN path).

Validates ``parallel.init_distributed`` + a global (data x space) mesh + one
full hierarchical train step where each process holds only its local batch
shard — the multi-host topology the framework targets (SURVEY §2
"multi-host via jax.distributed over DCN"), runnable on CPUs.

Usage (single command spawns all processes):
    python tools/multihost_smoke.py [--procs 2]
Child invocation (internal):
    python tools/multihost_smoke.py --child <pid> --procs N --port P
"""
import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(process_id: int, num_processes: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)  # 2 local devices per process
    sys.path.insert(0, HERE)
    from restrictive_hierarchical_semantic_segmentation_tpu.parallel.mesh import (
        init_distributed,
    )

    init_distributed(
        coordinator=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        HierarchicalSegmenter,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.parallel.mesh import (
        make_mesh,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        make_train_step,
    )

    n_total = jax.device_count()
    assert n_total == 2 * num_processes, (n_total, num_processes)
    mesh = make_mesh(n_data=n_total, n_space=1)

    tree = ClassTree.from_json(
        os.path.join(HERE, "assets", "class_tree_tl.json"),
        os.path.join(HERE, "assets", "class_map.csv"),
    )
    model = HierarchicalSegmenter(
        tree=tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    B_local, S = 2 * 2, 16  # 2 per local device
    rng = np.random.default_rng(0)
    x_local = rng.normal(size=(B_local, S, S, 3)).astype(np.float32)
    y_local = np.zeros((B_local, S, S, tree.num_classes), np.float32)
    y_local[..., 0] = 1.0

    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   x_local[:1], 1e-3)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    # global arrays from per-process local shards (the multi-host idiom)
    gshape = (B_local * num_processes, S, S, tree.num_classes)
    xg = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), x_local,
        (B_local * num_processes, S, S, 3))
    yg = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), y_local, gshape)
    step = make_train_step(model, tx, tree, True, donate=False)
    state, aux = step(state, xg, yg, jnp.ones((tree.num_levels,), jnp.float32))
    loss = float(aux["loss"])
    print(f"[proc {process_id}] global devices={n_total} loss={loss:.4f} OK",
          flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--port", type=int, default=45677)
    args = ap.parse_args()
    if args.child is not None:
        child(args.child, args.procs, args.port)
        return 0
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # drop the TPU-claiming sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", str(i),
             "--procs", str(args.procs), "--port", str(args.port)],
            env=env,
        )
        for i in range(args.procs)
    ]
    rc = max(p.wait() for p in procs)
    print("multihost smoke:", "OK" if rc == 0 else f"FAILED rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())

"""Headline benchmark: hierarchical HRNet-W48 train-step throughput at the
reference's north-star config (620x620, batch 4, BASELINE.md) on the available
TPU chip(s).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images_per_sec_per_chip",
   "vs_baseline": N}

``vs_baseline`` compares against the PyTorch-CPU reference throughput measured
by ``tools/measure_reference_baseline.py`` (stored in BASELINE_MEASURED.json —
the reference repo publishes no throughput numbers, BASELINE.md).

Flags: --model {hrnet,unet} --img 620 --batch 4 --steps 20 --dtype bfloat16
"""
import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hrnet", choices=["hrnet", "unet"])
    ap.add_argument("--img", type=int, default=620)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize backbone re-runs (bandwidth for FLOPs)")
    ap.add_argument("--pallas-bn", action="store_true",
                    help="fused Pallas BN+act kernels in the backbone")
    args = ap.parse_args()

    import jax

    # persistent compilation cache: the 620px hier-HRNet graph is large and
    # cold-compiles take many minutes over the remote-compile tunnel
    cache_dir = os.path.join(HERE, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        build_model,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        make_train_step,
    )

    tree = ClassTree.from_json(
        os.path.join(HERE, "assets", "class_tree_tl.json"),
        os.path.join(HERE, "assets", "class_map.csv"),
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model(
        tree,
        model_select=1 if args.model == "hrnet" else 0,
        model_type=0 if args.flat else 1,
        dtype=dtype,
        remat=args.remat,
        use_pallas_bn=args.pallas_bn,
    )
    n_chips = len(jax.devices())
    mesh = make_mesh()  # all chips on the data axis
    B = args.batch * max(1, n_chips)
    S = args.img

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, S, S, 3)).astype(np.float32)
    n_classes = tree.num_classes if not args.flat else tree.num_leaves
    y = np.full((B, S, S, n_classes), 0.0, np.float32)
    y[..., 0] = 1.0
    if not args.flat:
        # realistic ternary structure: tooth occupies the central band with a
        # child class inside; everything child-level outside tooth is -1
        tooth = np.zeros((S, S), bool)
        tooth[S // 4 : S // 2, :] = True
        y[:, tooth, 0] = 0.0
        y[:, tooth, 3] = 1.0
        a, b = tree.level_slices[1]
        y[..., a:b] = -1.0
        y[:, tooth, a] = 1.0
        y[:, tooth, a + 1 :] = 0.0

    # reference recipe weights (README.md:71-91)
    lw = (
        [[0.0297, 1.577, 0.9619, 0.1770], [1.5432, 0.2638, 1.0413, 3.9722]]
        if not args.flat
        else [[0.0285, 1.5159, 0.9227, 1.4842, 0.2532, 1.0, 3.8021]]
    )

    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), x[:1], lr=0.018
    )
    state = jax.device_put(state, replicated(mesh))
    xd = jax.device_put(x, batch_sharding(mesh))
    yd = jax.device_put(y, batch_sharding(mesh))
    step = make_train_step(
        model, tx, tree, hierarchical=not args.flat, level_weights=lw
    )
    mask = jnp.ones((tree.num_levels if not args.flat else 1,), jnp.float32)

    for _ in range(args.warmup):
        state, aux = step(state, xd, yd, mask)
    # NB: on this tunneled backend jax.block_until_ready() returns without
    # draining the execution queue — the only reliable synchronization is an
    # actual value fetch. The final loss depends (by dataflow) on every
    # previous step's parameter update, so fetching it times the whole chain;
    # the scalar transfer itself is microseconds.
    float(aux["loss"])
    t0 = time.time()
    for _ in range(args.steps):
        state, aux = step(state, xd, yd, mask)
    float(aux["loss"])
    dt = (time.time() - t0) / args.steps
    ips = B / dt
    ips_per_chip = ips / max(1, n_chips)

    vs = None
    baseline_path = os.path.join(HERE, "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        if ref.get("ref_cpu_images_per_sec"):
            vs = ips_per_chip / ref["ref_cpu_images_per_sec"]

    print(json.dumps({
        "metric": f"{'flat' if args.flat else 'hier'}_{args.model}"
                  f"_{S}px_train_step_throughput",
        "value": round(ips_per_chip, 3),
        "unit": "images_per_sec_per_chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": {
            "sec_per_step": round(dt, 4),
            "global_batch": B,
            "n_chips": n_chips,
            "dtype": args.dtype,
            "loss": float(aux["loss"]),
        },
    }))


if __name__ == "__main__":
    main()

"""XLA cost analysis of the compiled train step (bytes accessed / FLOPs) —
the profiling substitute on this environment (device-side jax.profiler traces
hang over the remote-compile tunnel; NOTES_ROUND1.md).

Usage: python tools/cost_analysis.py [--batch 16] [--img 620] [--flat]
"""
import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=620)
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--model", default="hrnet", choices=["hrnet", "unet"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(HERE, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        build_model,
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
    model = build_model(
        tree, model_select=1 if args.model == "hrnet" else 0,
        model_type=0 if args.flat else 1, dtype=jnp.bfloat16,
    )
    B, S = args.batch, args.img
    x = np.zeros((B, S, S, 3), np.float32)
    n_classes = tree.num_classes if not args.flat else tree.num_leaves
    y = np.zeros((B, S, S, n_classes), np.float32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), x[:1], 0.018)
    step = make_train_step(model, tx, tree, hierarchical=not args.flat,
                           donate=False)
    mask = jnp.ones((tree.num_levels if not args.flat else 1,), jnp.float32)
    lowered = jax.jit(step).lower(state, x, y, mask)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    out = {
        "config": vars(args),
        "flops_T": round(ca.get("flops", 0) / 1e12, 2),
        "bytes_accessed_GB": round(ca.get("bytes accessed", 0) / 1e9, 1),
        "output_bytes_GB": round(
            ca.get("bytes accessed output", 0) / 1e9, 1),
        "optimal_seconds": ca.get("optimal_seconds"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

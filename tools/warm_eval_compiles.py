"""Pre-warm the predict_eval 620px compile cache for all four recipe configs.

XLA programs are keyed by shapes/dtypes, not weights, so a RANDOM-init
checkpoint in the real orbax format drives the exact same compilation the
post-sweep `aggregate_recipe_table --eval` will need (~10-20 min cold each
through the remote-compile tunnel). Run this while the training sweep owns
the chip: compilation happens on the compile service, and the one warmup
batch per config is negligible execution time.

Usage: python tools/warm_eval_compiles.py [--data-root .recipe/tlpano_synth]
"""
import argparse
import os
import shutil
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

CONFIGS = {
    "hier_hrnet": dict(msel=1, mtype=1),
    "flat_hrnet": dict(msel=1, mtype=0),
    "hier_unet": dict(msel=0, mtype=1),
    "flat_unet": dict(msel=0, mtype=0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root",
                    default=os.path.join(HERE, ".recipe", "tlpano_synth"))
    ap.add_argument("--img", type=int, default=620)
    ap.add_argument("--val-batch", type=int, default=4)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--workdir", default="/tmp/warm_eval")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from restrictive_hierarchical_semantic_segmentation_tpu.cli import (
        predict_eval as pe,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        build_model,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.utils.compile_cache import (
        enable,
    )

    enable()
    tree = ClassTree.from_json(
        os.path.join(HERE, "assets", "class_tree_tl.json"),
        os.path.join(HERE, "assets", "class_map.csv"),
    )
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    sample = np.zeros((1, args.img, args.img, 3), np.float32)
    for name, c in CONFIGS.items():
        ckdir = os.path.join(args.workdir, name, "fold_1")
        os.makedirs(ckdir, exist_ok=True)
        model = build_model(tree, c["msel"], c["mtype"], None, dtype, False)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), sample,
                                      lr=0.0)
        save_checkpoint(os.path.join(ckdir, "best.ckpt"), state)
        print(f"=== warm {name} ===", flush=True)
        pe.main([
            "--save-loc", f"warm_{name}",
            "--full-ds", args.data_root,
            "--tree-root", os.path.join(HERE, "assets/class_tree_tl.json"),
            "--class-map", os.path.join(HERE, "assets/class_map.csv"),
            "--model-weights", os.path.join(args.workdir, name),
            "--img-size", str(args.img),
            "--model-select", str(c["msel"]),
            "--model-type", str(c["mtype"]),
            "--inc-cross-val", "True", "--folds", "1",
            "--val-batch", str(args.val_batch),
            "--compute-dtype", args.compute_dtype,
            "--save-images", "False",
        ])
        shutil.rmtree(os.path.join(HERE, "Predictions", f"warm_{name}"),
                      ignore_errors=True)
    print("warm_eval_compiles: all configs compiled+cached", flush=True)


if __name__ == "__main__":
    main()

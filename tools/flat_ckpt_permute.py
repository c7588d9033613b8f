"""Re-key a FLAT checkpoint's head channels from one tree's leaf order to
another's.

A flat model is tree-independent except for the ORDER of its leaf output
channels (models/hierarchical.py flat path: one head over
``tree.leaf_names``). The default and extended TL trees share the same 7
leaves in different orders (default: ...pulp,dentin,enamel,composite;
extended: ...composite,pulp,dentin,enamel), so a checkpoint trained under
one tree evaluates under the other after an EXACT permutation of the head
conv's output channels — no retraining, bit-identical leaf predictions.

Used by the round-4 extended-tree recipe arm: the round-3 ``flat_hrnet``
checkpoints double as the depth-4 flat comparison arm
(reference predictEval.py:85-129 reconstructs all parent levels from leaf
predictions, so eval depth is a property of the tree, not the weights).

Usage:
  python tools/flat_ckpt_permute.py --runs-root .recipe/recipe_runs/flat_hrnet \
      --out-root .recipe/recipe_runs/flat_hrnet_ext --model-select 1
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-root", required=True,
                    help="run dir with fold_N/{best,last}.ckpt trained under "
                         "--from-tree")
    ap.add_argument("--out-root", required=True)
    ap.add_argument("--model-select", type=int, default=1, choices=[0, 1])
    ap.add_argument("--from-tree", default="assets/class_tree_tl.json")
    ap.add_argument("--from-map", default="assets/class_map.csv")
    ap.add_argument("--to-tree", default="assets/class_tree_tl_extended.json")
    ap.add_argument("--to-map", default="assets/class_map_extended.csv")
    ap.add_argument("--which", default="best,last")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (  # noqa: E501
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (  # noqa: E501
        build_model,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (  # noqa: E501
        load_checkpoint,
        save_checkpoint,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    t_from = ClassTree.from_json(os.path.join(HERE, args.from_tree),
                                 os.path.join(HERE, args.from_map))
    t_to = ClassTree.from_json(os.path.join(HERE, args.to_tree),
                               os.path.join(HERE, args.to_map))
    assert set(t_from.leaf_names) == set(t_to.leaf_names), (
        t_from.leaf_names, t_to.leaf_names)
    perm = [t_from.leaf_names.index(n) for n in t_to.leaf_names]
    print(f"leaf permutation {list(t_from.leaf_names)} -> "
          f"{list(t_to.leaf_names)}: {perm}")

    model = build_model(t_from, model_select=args.model_select, model_type=0)
    sample = np.zeros((1, 32, 32, 3), np.float32)
    template, _ = create_train_state(model, jax.random.PRNGKey(0), sample, 0.0)

    n = 0
    for fold_dir in sorted(glob.glob(os.path.join(args.runs_root, "fold_*"))):
        fold = os.path.basename(fold_dir)
        for which in args.which.split(","):
            src = os.path.join(fold_dir, f"{which}.ckpt")
            if not os.path.isdir(src):
                continue
            state, meta = load_checkpoint(src, template)
            params = jax.device_get(state.params)
            head = params["head_flat"]
            assert head["kernel"].shape[-1] == len(perm), head["kernel"].shape
            head = dict(head, kernel=head["kernel"][..., perm],
                        bias=head["bias"][perm])
            params = dict(params, head_flat=head)
            out = os.path.join(args.out_root, fold, f"{which}.ckpt")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            save_checkpoint(out, state.replace(params=params), **meta)
            n += 1
            print(f"wrote {out}")
    # provenance note beside the permuted run
    os.makedirs(args.out_root, exist_ok=True)
    with open(os.path.join(args.out_root, "PERMUTED_FROM.json"), "w") as f:
        json.dump({"source": args.runs_root, "perm": perm,
                   "from_tree": args.from_tree, "to_tree": args.to_tree}, f,
                  indent=1)
    assert n, f"no checkpoints found under {args.runs_root}"
    print(f"permuted {n} checkpoints -> {args.out_root}")


if __name__ == "__main__":
    main()

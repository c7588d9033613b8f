"""Leak-free fold-ensemble accuracy eval on the recipe checkpoints.

The reference deploys single cross-validation folds only; this framework's
``Predictor`` can serve the 5-fold ensemble (fold-mean composed
probabilities, one vmapped program — train/serving.py). Question: does the
ensemble actually beat single folds on data NO fold ever saw?

Design (NOTES_ROUND3 round-4 #1): a FRESH test set from the same synthetic
generator (`data/synthetic.synth_sample`, hard mode, a NEW seed) — no fold
trained on these samples, so unlike scoring on any fold's val split (whose
images are TRAIN data for the other four folds) the ensemble comparison is
leak-free. Both arms are scored with the SAME metric pipeline: device
argmax class maps -> per-class confusion counts on host -> IoU/Dice with
the eval conventions (child-level pixels outside the parent are ignored —
the ternary -1 semantics; reference predictEval.py:401-405).

Usage:
    python tools/ensemble_eval.py --runs-root .recipe/recipe_runs/hier_hrnet \
        [--n 30] [--seed 777] [--img 620] [--folds 1] [--ensemble]
"""
import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402


def build_test_set(n, size, seed):
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
        synth_sample,
    )

    rng = np.random.default_rng(seed)
    return [synth_sample(rng, size, hard=True) for _ in range(n)]


def gt_level_maps(mask, tree):
    """Pixel-value mask -> per-level (class_index_map, valid_mask).

    Level 0: every pixel belongs to exactly one class (parents whose pixel
    value is None — e.g. 'tooth' — own the union of their descendant
    leaves' pixel values). Child levels: pixels outside the level's parent
    classes are INVALID (the ternary -1 convention, dataset.py:227-265) and
    are excluded from the counts, matching the evaluator's masking.
    """
    out = []
    for lvl, names in enumerate(tree.levels):
        idx = np.full(mask.shape, -1, np.int64)
        for ci, name in enumerate(names):
            pv = tree.pixel_value[name]
            if pv is not None:
                idx[mask == pv] = ci
            else:  # parent class: union of descendant leaf pixel values
                for leaf in tree.leaf_names:
                    if tree.pixel_value[leaf] is None:
                        continue
                    if _is_descendant(tree, leaf, name):
                        idx[mask == tree.pixel_value[leaf]] = ci
        out.append((idx, idx >= 0))
    return out


def _is_descendant(tree, node, ancestor):
    p = node
    while p is not None:
        if p == ancestor:
            return True
        p = tree.parent_name.get(p)
    return False


def per_class_counts(pred, gt_idx, valid, n_classes):
    """-> (tp, fp, fn) arrays of shape (n_classes,) over valid pixels."""
    p = pred[valid].ravel()
    g = gt_idx[valid].ravel()
    tp = np.zeros(n_classes, np.int64)
    fp = np.zeros(n_classes, np.int64)
    fn = np.zeros(n_classes, np.int64)
    for c in range(n_classes):
        pc, gc = p == c, g == c
        tp[c] += int((pc & gc).sum())
        fp[c] += int((pc & ~gc).sum())
        fn[c] += int((~pc & gc).sum())
    return tp, fp, fn


def summarize(tp, fp, fn):
    iou = tp / np.maximum(tp + fp + fn, 1)
    dice = 2 * tp / np.maximum(2 * tp + fp + fn, 1)
    return iou, dice


def score(predictor, samples, tree):
    n_per = [len(l) for l in tree.levels]
    totals = [(np.zeros(k, np.int64), np.zeros(k, np.int64),
               np.zeros(k, np.int64)) for k in n_per]
    for im, mask in samples:
        x = im[None]  # (1, S, S) u8 grayscale — the serving fast path
        out = predictor(x)
        gts = gt_level_maps(mask, tree)
        for lvl, (gt_idx, valid) in enumerate(gts):
            pred = np.asarray(out["class_maps"][lvl][0]).astype(np.int64)
            tp, fp, fn = per_class_counts(pred, gt_idx, valid, n_per[lvl])
            totals[lvl] = tuple(a + b for a, b in
                                zip(totals[lvl], (tp, fp, fn)))
    res = {}
    for lvl, names in enumerate(tree.levels):
        iou, dice = summarize(*totals[lvl])
        for ci, name in enumerate(names):
            res[name] = {"iou": round(float(iou[ci]), 4),
                         "dice": round(float(dice[ci]), 4)}
    fine = [res[n]["dice"] for n in tree.levels[-1]]
    res["_fine_mean_dice"] = round(float(np.mean(fine)), 4)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-root", default=".recipe/recipe_runs/hier_hrnet")
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--img", type=int, default=620)
    ap.add_argument("--folds", type=str, default="1",
                    help="comma list of single folds to score")
    ap.add_argument("--ensemble", action="store_true")
    ap.add_argument("--model-select", type=int, default=1, choices=[0, 1],
                    help="0 = UNet, 1 = HRNet — must match the run dir")
    ap.add_argument("--model-type", type=int, default=1, choices=[0, 1],
                    help="0 = flat, 1 = hierarchical — must match the run dir")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--config", default="",
                    help="HRNet width preset/yaml (config/hrnet.py), e.g. w64")
    args = ap.parse_args()

    from restrictive_hierarchical_semantic_segmentation_tpu.config.run import (
        RunConfig,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.serving import (
        Predictor,
    )

    cfg = RunConfig(
        tree_root=os.path.join(HERE, "assets/class_tree_tl.json"),
        class_map=os.path.join(HERE, "assets/class_map.csv"),
        img_size=args.img, model_select=args.model_select,
        model_type=args.model_type, hrnet_yaml=args.config or None,
        compute_dtype=args.compute_dtype,
    )
    tree = ClassTree.from_json(cfg.tree_root, cfg.class_map)
    samples = build_test_set(args.n, args.img, args.seed)
    print(f"test set: {args.n} fresh hard-mode images (seed {args.seed})",
          flush=True)

    results = {}
    for f in [int(x) for x in args.folds.split(",") if x]:
        ckpt = os.path.join(args.runs_root, f"fold_{f}", "best.ckpt")
        t0 = time.time()
        # EXACTLY the serve CLI's construction -> compile-cache hit for
        # folds already served (cli/serve.py main)
        pred = Predictor(cfg, ckpt, tree=tree, outputs=("class_maps",),
                         class_map_dtype="uint8")
        pred.warmup(batch=1, input_dtype="uint8")
        print(f"fold {f} ready in {time.time()-t0:.0f}s", flush=True)
        results[f"fold_{f}"] = score(pred, samples, tree)
        print(json.dumps({f"fold_{f}": results[f"fold_{f}"]}), flush=True)
        del pred

    if args.ensemble:
        ckpts = Predictor.fold_checkpoints(args.runs_root, "best")
        t0 = time.time()
        ens = Predictor(cfg, ckpts, tree=tree, outputs=("class_maps",),
                        class_map_dtype="uint8")
        ens.warmup(batch=1, input_dtype="uint8")
        print(f"ensemble ({len(ckpts)} folds) ready in {time.time()-t0:.0f}s",
              flush=True)
        results["ensemble"] = score(ens, samples, tree)
        print(json.dumps({"ensemble": results["ensemble"]}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

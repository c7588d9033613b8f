#!/usr/bin/env python
"""Diagnose the depth-4 extended-tree L0 eval collapse (VERDICT r4 weak #2).

Symptom: in Predictions/recipe_hier_hrnet_ext (all 5 folds) class 1 =
tooth+alveolar — the only non-background level-0 parent — has eval recall
~0.013 while TRAIN-MODE metrics during the same epochs show recall >0.93.
The gap appears at epoch 1 and never closes: a train-mode (batch statistics)
vs eval-mode (running statistics) forward divergence.

This tool loads one fold's checkpoint and measures, on the same validation
batches:

  A. eval-mode forward (checkpoint running stats)        -> L0 recall/margins
  B. train-mode forward (batch statistics)               -> L0 recall/margins
  C. eval-mode forward with running stats RE-ESTIMATED from clean
     (unaugmented) train images                          -> L0 recall/margins
  D. eval-mode forward with running stats RE-ESTIMATED from AUGMENTED
     train images (the distribution the checkpoint's EMA actually saw)

plus the per-BN-layer distance between the checkpoint's running stats and
fresh clean-image batch stats (which layers moved, and how much).

Interpretation matrix:
  * B good, A bad, C good  -> running stats are biased by the AUGMENTED input
    distribution (affine fill=-1 wedges, blur, jitter); the eval-time input
    statistics differ -> fix = BN re-estimation or augmentation-consistent
    stats, not a step-math bug.
  * B good, A bad, C bad, D bad -> batch-vs-population divergence intrinsic
    to the architecture at D=4 (margin too small); fix at the head/loss.
  * D reproduces A's stats but C doesn't -> EMA machinery (bn_ema_correction
    at D=4) is CORRECT and the divergence is purely distributional.

Usage:
  python tools/diagnose_l0_ext.py [--fold 1] [--img 620] [--batches 2]
      [--reestimate-batches 8] [--run .recipe/recipe_runs/hier_hrnet_ext]
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold", type=int, default=1)
    ap.add_argument("--img", type=int, default=620)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--reestimate-batches", type=int, default=8)
    ap.add_argument("--run", default=".recipe/recipe_runs/hier_hrnet_ext")
    ap.add_argument("--data", default=".recipe/tlpano_synth")
    ap.add_argument("--ckpt", default="best.ckpt")
    ap.add_argument("--platform", default=os.environ.get("RHSS_PLATFORM", "cpu"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from restrictive_hierarchical_semantic_segmentation_tpu.utils.compile_cache import (  # noqa: E501
        enable as enable_cache,
    )

    enable_cache()
    import jax.numpy as jnp

    from restrictive_hierarchical_semantic_segmentation_tpu.data.dataset import (
        SegDataset,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.data.loader import (
        BatchLoader,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (  # noqa: E501
        build_model,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.norm import (
        BN_MOMENTUM,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (
        load_checkpoint,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import (
        list_pairs,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        bn_ema_correction,
    )

    tree = ClassTree.from_json(
        os.path.join(REPO, "assets", "class_tree_tl_extended.json"),
        os.path.join(REPO, "assets", "class_map_extended.csv"),
    )
    model = build_model(tree, model_select=1, model_type=1,
                        dtype=jnp.bfloat16)
    sample = np.zeros((1, args.img, args.img, 3), np.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), sample, 0.0)
    ckpt = os.path.join(REPO, args.run, f"fold_{args.fold}", args.ckpt)
    state, meta = load_checkpoint(ckpt, state)
    print(f"loaded {ckpt} (epoch {meta.get('epoch')})")

    def batches_of(root, augment, n, seed=0):
        imgs, labs = list_pairs(root)
        ds = SegDataset(imgs, labs, tree, args.img, hierarchical=True,
                        augment=augment)
        ld = BatchLoader(ds, batch_size=args.batch, shuffle=augment,
                         drop_last=True, num_workers=2, seed=seed)
        out = []
        for x, y in ld:
            out.append((np.asarray(x), np.asarray(y)))
            if len(out) >= n:
                break
        ld.close()
        return out

    val_root = os.path.join(REPO, args.data, f"fold_{args.fold}", "val")
    train_root = os.path.join(REPO, args.data, f"fold_{args.fold}", "train")
    val = batches_of(val_root, augment=False, n=args.batches)
    print(f"{len(val)} val batches of {args.batch} @ {args.img}px")

    fwd_eval = jax.jit(lambda p, bs, x: model.apply(
        {"params": p, "batch_stats": bs}, x, train=False))
    fwd_train = jax.jit(lambda p, bs, x: model.apply(
        {"params": p, "batch_stats": bs}, x, train=True,
        mutable=["batch_stats"]))

    def l0_report(tag, outs_and_targets):
        """outs: list of (SegmenterOutput, y). Report L0 recall + margins."""
        tp = fn = fp = tn = 0
        margins_pos, margins_neg = [], []
        for out, y in outs_and_targets:
            z = np.asarray(out.logits_per_level[0], np.float32)
            t = y[..., : tree.classes_per_level[0]]
            marg = z[..., 1] - z[..., 0]
            pred1 = marg > 0
            true1 = t[..., 1] == 1
            true0 = t[..., 0] == 1
            tp += int((pred1 & true1).sum()); fn += int((~pred1 & true1).sum())
            fp += int((pred1 & true0).sum()); tn += int((~pred1 & true0).sum())
            margins_pos.append(marg[true1]); margins_neg.append(marg[true0])
        mp = np.concatenate(margins_pos); mn = np.concatenate(margins_neg)
        rec = tp / max(1, tp + fn); prec = tp / max(1, tp + fp)
        bg_prec = tn / max(1, tn + fn)
        print(f"[{tag}] L0 class1 recall={rec:.4f} precision={prec:.4f} "
              f"bg_precision={bg_prec:.4f}")
        print(f"[{tag}]   margin(z1-z0) on true-class px: "
              f"mean={mp.mean():+.3f} p5={np.percentile(mp, 5):+.3f} "
              f"p50={np.percentile(mp, 50):+.3f} "
              f"p95={np.percentile(mp, 95):+.3f}")
        print(f"[{tag}]   margin on true-bg px:          "
              f"mean={mn.mean():+.3f} p95={np.percentile(mn, 95):+.3f}")
        return rec

    # A: eval mode, checkpoint running stats
    a = [(fwd_eval(state.params, state.batch_stats, jnp.asarray(x)), y)
         for x, y in val]
    l0_report("A eval/ckpt-stats", a)

    # B: train mode (batch statistics), same inputs
    b = [(fwd_train(state.params, state.batch_stats, jnp.asarray(x))[0], y)
         for x, y in val]
    l0_report("B train-mode", b)

    # BN-layer distance: checkpoint running stats vs one clean train batch's
    # fresh statistics (recovered from the single-update EMA)
    xt0, _ = batches_of(train_root, augment=False, n=1)[0]
    _, upd = fwd_train(state.params, state.batch_stats, jnp.asarray(xt0))
    m = BN_MOMENTUM
    fresh = jax.tree_util.tree_map(
        lambda ra, n1: (n1 - m * ra) / (1 - m),
        state.batch_stats, upd["batch_stats"])
    flat_ck = jax.tree_util.tree_leaves_with_path(state.batch_stats)
    flat_fr = jax.tree_util.tree_leaves(fresh)
    rows = []
    for (path, ck), fr in zip(flat_ck, flat_fr):
        ck = np.asarray(ck, np.float64); fr = np.asarray(fr, np.float64)
        denom = np.maximum(np.abs(ck), 1e-3)
        rows.append((float(np.mean(np.abs(fr - ck) / denom)),
                     jax.tree_util.keystr(path)))
    rows.sort(reverse=True)
    print("\ntop-10 BN tensors by mean relative |fresh-ckpt| distance "
          "(clean train batch):")
    for d, name in rows[:10]:
        print(f"  {d:8.4f}  {name}")
    print(f"  median over {len(rows)} tensors: "
          f"{np.median([r[0] for r in rows]):.4f}")

    # C/D: re-estimate running stats from clean / augmented train images
    def reestimate(augment, tag, seed):
        bs = state.batch_stats
        for x, _ in batches_of(train_root, augment=augment,
                               n=args.reestimate_batches, seed=seed):
            _, upd = fwd_train(state.params, bs, jnp.asarray(x))
            bs = bn_ema_correction(bs, upd["batch_stats"], BN_MOMENTUM,
                                   model.bn_updates_per_step)
        outs = [(fwd_eval(state.params, bs, jnp.asarray(x)), y)
                for x, y in val]
        l0_report(tag, outs)
        return bs

    reestimate(False, f"C eval/re-est clean x{args.reestimate_batches}", 1)
    reestimate(True, f"D eval/re-est AUG x{args.reestimate_batches}", 2)


if __name__ == "__main__":
    main()

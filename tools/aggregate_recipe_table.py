"""Full-recipe 5-fold synthetic-run evaluation + BASELINE.md-format table
(VERDICT r2 "Next round" #2).

After tools/make_synth_tlpano.py + the full reference-recipe training runs
(README.md:71-91 commands: 620px, batch 4, 80 epochs, AdamW + plateau LR,
reference level weights) produce /tmp/recipe_runs/{hier,flat}_{hrnet,unet},
this tool:

  --eval  : runs the predict_eval CLI per config over all 5 folds (TPU;
            reuses the cached eval-step compile from training's val passes)
            -> ./Predictions/recipe_<cfg>/fold_N/metrics.csv
  --table : aggregates those metrics.csv files into the BASELINE.md table
            format — per-class IoU/Dice/Prec/Rec mean +- std over folds,
            flat vs hierarchical side by side, bold = better — one table
            per backbone, printed as markdown for BENCHMARKS.md.

Class rows follow ClassTree.names channel order, which matches the
reference results table's row order (git_images/results_table.png):
background, upper, lower, tooth, pulp, dentin, enamel, composite.
Flat models are scored on the same per-level classes via the descendant-
union parent reconstruction (predictEval.py:85-129, 381-386 semantics),
so the flat/hier columns are directly comparable.
"""
import argparse
import csv
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

CONFIGS = {
    "hier_hrnet": dict(msel=1, mtype=1),
    "flat_hrnet": dict(msel=1, mtype=0),
    "hier_unet": dict(msel=0, mtype=1),
    "flat_unet": dict(msel=0, mtype=0),
    # round-4 arms: the TPU-native W64 preset (VERDICT r3 #2) and the
    # depth-4 extended tree (VERDICT r3 #3; flat arm = the round-3
    # flat_hrnet checkpoints leaf-permuted by tools/flat_ckpt_permute.py)
    "hier_hrnet_w64": dict(msel=1, mtype=1, config="w64"),
    "hier_hrnet_ext": dict(msel=1, mtype=1, ext=True),
    "flat_hrnet_ext": dict(msel=1, mtype=0, ext=True),
    # round-5 arms: the extended-tree comparison retrained AFTER the L0
    # eval-metric fix (BENCHMARKS.md "Round-5 root cause"); fresh names keep
    # the corrupted round-4 tables' provenance distinct
    "hier_hrnet_ext_r5": dict(msel=1, mtype=1, ext=True),
    "flat_hrnet_ext_r5": dict(msel=1, mtype=0, ext=True),
}
CLASS_NAMES = ["Background", "Upper", "Lower", "Tooth",
               "Pulp", "Dentin", "Enamel", "Composite"]
# extended tree: hierarchical channel order (ClassTree.names, level-major)
CLASS_NAMES_EXT = ["Background", "Tooth+alveolar", "Alveolar", "Tooth",
                   "Upper", "Lower", "Composite", "Healthy",
                   "Pulp", "Dentin", "Enamel"]
METRICS = ["IoU", "Dice", "Precision", "Recall"]


def run_eval(runs_root, data_root, folds, img, val_batch, dtype, only=None):
    from restrictive_hierarchical_semantic_segmentation_tpu.cli import (
        predict_eval as pe,
    )

    for name, c in CONFIGS.items():
        if only and name not in only:
            continue
        weights = os.path.join(runs_root, name)
        if not os.path.isdir(weights):
            print(f"skip {name}: {weights} missing", flush=True)
            continue
        tree_json = ("assets/class_tree_tl_extended.json" if c.get("ext")
                     else "assets/class_tree_tl.json")
        cmap = ("assets/class_map_extended.csv" if c.get("ext")
                else "assets/class_map.csv")
        argv = [
            "--save-loc", f"recipe_{name}",
            "--full-ds", data_root,
            "--tree-root", os.path.join(HERE, tree_json),
            "--class-map", os.path.join(HERE, cmap),
            "--model-weights", weights,
            "--img-size", str(img),
            "--model-select", str(c["msel"]),
            "--model-type", str(c["mtype"]),
            "--inc-cross-val", "True", "--folds", str(folds),
            "--val-batch", str(val_batch),
            "--compute-dtype", dtype,
            "--save-images", "False",
        ]
        if c.get("config"):
            argv += ["--config", c["config"]]
        print(f"=== predict_eval {name} ===", flush=True)
        pe.main(argv)


def _load(cfg_name, folds):
    """-> {class_idx: {metric: [per-fold values]}} plus 'Average' row.

    Falls back to the committed round-3 per-fold eval compacts
    (results/recipe_round3/<cfg>/fold_N/eval_metrics.csv — same predict_eval
    CSV layout) for configs whose checkpoints/Predictions did not survive a
    round boundary."""
    out = {}
    for fold in range(1, folds + 1):
        path = os.path.join(HERE, "Predictions", f"recipe_{cfg_name}",
                            f"fold_{fold}", "metrics.csv")
        if not os.path.exists(path):
            path = os.path.join(HERE, "results", "recipe_round3", cfg_name,
                                f"fold_{fold}", "eval_metrics.csv")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            for row in csv.DictReader(f):
                key = ("Average" if row["Type"] == "Average"
                       else int(row["Class"]))
                d = out.setdefault(key, {m: [] for m in METRICS})
                for m in METRICS:
                    d[m].append(float(row[m]))
    return out


def _fmt(vals):
    import numpy as np

    return f"{np.mean(vals):.3f} ±{np.std(vals):.3f}"


def _cell(flat_vals, hier_vals, which):
    """Markdown cell, bolded if this side wins on the mean (source-figure
    convention). Ties: both bold."""
    import numpy as np

    mine = flat_vals if which == "flat" else hier_vals
    other = hier_vals if which == "flat" else flat_vals
    s = _fmt(mine)
    if other is None:
        return s
    return f"**{s}**" if np.mean(mine) >= np.mean(other) else s


def table(folds, only=None):
    lines = []
    # (section, left config, right config, left label, right label, classes)
    pairs = [
        ("UNet", "flat_unet", "hier_unet", "flat", "hier", CLASS_NAMES),
        ("HRNet (W48)", "flat_hrnet", "hier_hrnet", "flat", "hier",
         CLASS_NAMES),
        ("HRNet hier: W48 vs W64 (TPU-native preset)", "hier_hrnet",
         "hier_hrnet_w64", "W48", "W64", CLASS_NAMES),
        ("HRNet, extended depth-4 tree", "flat_hrnet_ext", "hier_hrnet_ext",
         "flat", "hier", CLASS_NAMES_EXT),
        ("HRNet, extended depth-4 tree — round 5, post metric fix",
         "flat_hrnet_ext_r5", "hier_hrnet_ext_r5", "flat", "hier",
         CLASS_NAMES_EXT),
    ]
    if only:
        pairs = [p for p in pairs if p[1] in only or p[2] in only]
    for backbone, left_name, right_name, ll, rl, classes in pairs:
        left = _load(left_name, folds)
        right = _load(right_name, folds)
        if left is None or right is None:
            lines.append(f"### {backbone}: metrics.csv incomplete "
                         f"({left_name}={left is not None}, "
                         f"{right_name}={right is not None})")
            continue
        lines.append(f"### {backbone}")
        lines.append("")
        lines.append(f"| Class | IoU ({ll}) | Dice ({ll}) | Prec ({ll}) | "
                     f"Rec ({ll}) | IoU ({rl}) | Dice ({rl}) | "
                     f"Prec ({rl}) | Rec ({rl}) |")
        lines.append("|---|---|---|---|---|---|---|---|---|")
        rows = [("Average", "Average")] + [
            (i, classes[i]) for i in range(len(classes))]
        for key, label in rows:
            if key not in left or key not in right:
                continue
            # column order in the reference table: all left, then all right
            left_cells = [_cell(left[key][m], right[key][m], "flat")
                          for m in METRICS]
            right_cells = [_cell(left[key][m], right[key][m], "hier")
                           for m in METRICS]
            lines.append("| " + " | ".join(
                [label] + left_cells + right_cells) + " |")
        lines.append("")
    print("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--table", action="store_true")
    ap.add_argument("--runs-root", default="/tmp/recipe_runs")
    ap.add_argument("--data-root", default="/tmp/tlpano_synth")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--img", type=int, default=620)
    ap.add_argument("--val-batch", type=int, default=4)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--configs", default=None,
                    help="comma-separated CONFIGS subset to eval/tabulate")
    args = ap.parse_args()
    only = set(args.configs.split(",")) if args.configs else None
    if args.eval:
        run_eval(args.runs_root, args.data_root, args.folds, args.img,
                 args.val_batch, args.compute_dtype, only=only)
    if args.table:
        table(args.folds, only=only)


if __name__ == "__main__":
    main()

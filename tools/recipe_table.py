"""Aggregate full-recipe 5-fold runs into the BASELINE.md-format accuracy
table (per-class IoU/Dice/Precision/Recall, mean +- std over folds, flat vs
hierarchical, per backbone) — the synthetic-data analog of the reference's
results_table.png (README.md:17-22).

Two stages:
  --eval : run the predict_eval CLI per config (5 folds each) against the
           run dirs produced by the full-recipe trainer; writes
           ./Predictions/recipe_<name>/fold_N/metrics.csv
  --table: parse those CSVs and print the markdown table (paste into
           BENCHMARKS.md)

Usage:
  python tools/recipe_table.py --runs-root /tmp/recipe_runs \
      --data-root /tmp/tlpano_synth --eval --table
"""
import argparse
import csv
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # name, model_select (0 unet / 1 hrnet), model_type (0 flat / 1 hier)
    ("hier_hrnet", 1, 1),
    ("flat_hrnet", 1, 0),
    ("hier_unet", 0, 1),
    ("flat_unet", 0, 0),
]
CLASSES = ["Background", "Upper", "Lower", "Tooth",
           "Pulp", "Dentin", "Enamel", "Composite"]
METRICS = ["IoU", "Dice", "Precision", "Recall"]


def run_eval(runs_root, data_root, folds, img_size, val_batch):
    for name, msel, mtype in CONFIGS:
        run_dir = os.path.join(runs_root, name)
        if not os.path.isdir(run_dir):
            print(f"skip {name}: {run_dir} missing")
            continue
        cmd = [
            sys.executable, "-m",
            "restrictive_hierarchical_semantic_segmentation_tpu.cli."
            "predict_eval",
            "--save-loc", f"recipe_{name}",
            "--full-ds", data_root,
            "--tree-root", os.path.join(REPO, "assets", "class_tree_tl.json"),
            "--class-map", os.path.join(REPO, "assets", "class_map.csv"),
            "--model-weights", run_dir,
            "--img-size", str(img_size),
            "--model-type", str(mtype), "--model-select", str(msel),
            "--folds", str(folds), "--val-batch", str(val_batch),
            "--save-images", "False",
        ]
        print(f"== eval {name}: {' '.join(cmd)}", flush=True)
        subprocess.run(cmd, cwd=REPO, check=True)


def load_config(name, folds):
    """-> {metric: (n_class, n_fold) array} + overall rows."""
    per_class = {m: [] for m in METRICS}
    overall = {m: [] for m in METRICS}
    for f in range(1, folds + 1):
        path = os.path.join(REPO, "Predictions", f"recipe_{name}",
                            f"fold_{f}", "metrics.csv")
        rows = list(csv.reader(open(path)))
        cls_rows = [r for r in rows if r and r[0] == "Class"]
        avg = next(r for r in rows if r and r[0] == "Average")
        for i, m in enumerate(METRICS):
            per_class[m].append([float(r[3 + i]) for r in cls_rows])
            overall[m].append(float(avg[3 + i]))
    return ({m: np.asarray(v).T for m, v in per_class.items()},
            {m: np.asarray(v) for m, v in overall.items()})


def fmt(mean, std):
    return f"{mean:.3f} ±{std:.3f}"


def emit_table(folds):
    out = []
    for backbone, flat_name, hier_name in (
        ("UNet", "flat_unet", "hier_unet"),
        ("HRNet (W48)", "flat_hrnet", "hier_hrnet"),
    ):
        try:
            fc, fo = load_config(flat_name, folds)
            hc, ho = load_config(hier_name, folds)
        except (FileNotFoundError, StopIteration) as e:
            out.append(f"### {backbone}: missing eval outputs ({e})")
            continue
        out.append(f"### {backbone}")
        out.append("")
        hdr = ("| Class | IoU (flat) | Dice (flat) | Prec (flat) | "
               "Rec (flat) | IoU (hier) | Dice (hier) | Prec (hier) | "
               "Rec (hier) |")
        out.append(hdr)
        out.append("|" + "---|" * 9)
        row = ["Average"]
        for src in (fo, ho):
            for m in METRICS:
                row.append(fmt(src[m].mean(), src[m].std()))
        out.append("| " + " | ".join(row) + " |")
        n_cls = fc["IoU"].shape[0]
        for c in range(n_cls):
            row = [CLASSES[c] if c < len(CLASSES) else f"class{c}"]
            for src in (fc, hc):
                for m in METRICS:
                    row.append(fmt(src[m][c].mean(), src[m][c].std()))
            out.append("| " + " | ".join(row) + " |")
        out.append("")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-root", default="/tmp/recipe_runs")
    ap.add_argument("--data-root", default="/tmp/tlpano_synth")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--img-size", type=int, default=620)
    ap.add_argument("--val-batch", type=int, default=4)
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--table", action="store_true")
    args = ap.parse_args()
    if args.eval:
        run_eval(args.runs_root, args.data_root, args.folds, args.img_size,
                 args.val_batch)
    if args.table:
        print(emit_table(args.folds))


if __name__ == "__main__":
    main()

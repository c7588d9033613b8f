"""Pre-warm the 620px TRAIN+VAL compile caches for recipe configs that have
not started yet (flat_hrnet / hier_unet / flat_unet), by running ONE epoch of
the real train CLI with the exact recipe graph-shaping flags into a throwaway
save-path. XLA programs are keyed by shapes/dtypes/flags, so the sweep's
later `cli.train` invocations hit the cache and config transitions skip the
10-25 min cold compile. Safe to run while the sweep trains: compiles overlap
execution on the compile service (measured), and the warm epoch itself costs
seconds of chip time.
"""
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HIER_LW = "[[0.0297, 1.577, 0.9619, 0.1770],[1.5432, 0.2638, 1.0413, 3.9722]]"
FLAT_LW = "[[0.0285, 1.5159, 0.9227, 1.4842, 0.2532, 1.0, 3.8021]]"

CONFIGS = [
    ("flat_hrnet", 1, 0, "0.022", FLAT_LW),
    ("hier_unet", 0, 1, "0.022", HIER_LW),
    ("flat_unet", 0, 0, "0.018", FLAT_LW),
]


def main():
    data = os.path.join(HERE, ".recipe", "tlpano_synth")
    for name, msel, mtype, lr, lw in CONFIGS:
        out = f"/tmp/warm_train/{name}"
        shutil.rmtree(out, ignore_errors=True)
        print(f"=== warm-train {name} ===", flush=True)
        r = subprocess.run([
            sys.executable, "-m",
            "restrictive_hierarchical_semantic_segmentation_tpu.cli.train",
            "--save-path", out, "--model-select", str(msel),
            "--model-type", str(mtype),
            "--learning-rate", f"[{lr}]", "--level-weights", lw,
            "--data-root", data,
            "--tree-root", os.path.join(HERE, "assets/class_tree_tl.json"),
            "--class-map", os.path.join(HERE, "assets/class_map.csv"),
            "--batch-size", "4", "--val-batch", "4", "--img-size", "620",
            "--epochs", "1", "--learning-rate-scheduler-minimum", "0.001",
            "--inc-cross-val", "True", "--folds", "1",
            "--compute-dtype", "bfloat16", "--device-data", "True",
            "--ckpt-every", "20", "--best-save", "end",
            "--save-images-batch", "False",
        ], cwd=HERE)
        print(f"=== warm-train {name} exit {r.returncode} ===", flush=True)
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()

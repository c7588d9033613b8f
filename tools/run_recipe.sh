#!/usr/bin/env bash
# Full reference-recipe training sweep on the synthetic TL-pano analog
# (VERDICT r2 "Next round" #2). Mirrors the reference README.md:71-91
# commands: 620px, batch 4, 80 epochs, AdamW + ReduceLROnPlateau(min 0.001),
# reference per-config LRs and level weights, 5-fold CV. TPU adaptations
# (validated production mode, BENCHMARKS.md round-3 section): bf16 compute,
# device-resident data, ckpt cadence 10, auto-resume for crash safety.
#
# Usage: bash tools/run_recipe.sh  (runs the four configs sequentially;
# safe to re-run — finished folds resume/no-op via --auto-resume)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DATA="$REPO/.recipe/tlpano_synth"
RUNS="$REPO/.recipe/recipe_runs"
LOGS="$REPO/.recipe/logs"
mkdir -p "$RUNS" "$LOGS"

if [ ! -d "$DATA/fold_5" ]; then
  echo "=== building dataset $(date) ===" | tee -a "$LOGS/driver.log"
  python "$REPO/tools/make_synth_tlpano.py" --out "$DATA" \
    >>"$LOGS/dataset.log" 2>&1 || { echo "dataset build FAILED"; exit 1; }
fi

HIER_LW="[[0.0297, 1.577, 0.9619, 0.1770],[1.5432, 0.2638, 1.0413, 3.9722]]"
FLAT_LW="[[0.0285, 1.5159, 0.9227, 1.4842, 0.2532, 1.0, 3.8021]]"

run() {
  local name=$1 msel=$2 mtype=$3 lr=$4 lw=$5
  echo "=== $name start $(date) ===" | tee -a "$LOGS/driver.log"
  python -m restrictive_hierarchical_semantic_segmentation_tpu.cli.train \
    --save-path "$RUNS/$name" --model-select "$msel" --model-type "$mtype" \
    --learning-rate "[$lr]" --level-weights "$lw" \
    --data-root "$DATA" \
    --tree-root "$REPO/assets/class_tree_tl.json" \
    --class-map "$REPO/assets/class_map.csv" \
    --batch-size 4 --val-batch 4 --img-size 620 --epochs 80 \
    --learning-rate-scheduler-minimum 0.001 \
    --inc-cross-val True --folds 5 \
    --compute-dtype bfloat16 --device-data True --ckpt-every 20 \
    --best-save end \
    --auto-resume True --save-images-batch False \
    >>"$LOGS/$name.log" 2>&1
  echo "=== $name exit $? $(date) ===" | tee -a "$LOGS/driver.log"
}

cd "$REPO"
run hier_hrnet 1 1 0.024 "$HIER_LW"
run flat_hrnet 1 0 0.022 "$FLAT_LW"
run hier_unet  0 1 0.022 "$HIER_LW"
run flat_unet  0 0 0.018 "$FLAT_LW"
echo "=== ALL DONE $(date) ===" | tee -a "$LOGS/driver.log"

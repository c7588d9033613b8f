#!/usr/bin/env bash
# Round-5 recipe arms: the depth-4 extended-tree comparison RETRAINED after
# the L0 eval-metric fix (BENCHMARKS.md "Round-5 root cause"; commit
# 'Fix depth-4 L0 eval-metric collapse').
#
# Why retrain rather than re-evaluate: the round-4 checkpoints did not
# survive the round boundary, and the round-4 runs' best-checkpoint
# SELECTION measure (val perf_no_bg) was computed by the corrupted metric,
# so their 'best' epochs are not trustworthy anyway. Training itself
# (loss/gradients) never used the corrupted path.
#
# Same recipe as round 4 (tools/run_recipe_r4.sh): 620px, batch 4, AdamW +
# plateau, reference-derived level weights (internal nodes = mean of
# children, documented in BENCHMARKS), 40 epochs (the synthetic set
# plateaus well before), 5 folds. Safe to re-run: finished folds
# resume/no-op via --auto-resume.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DATA="$REPO/.recipe/tlpano_synth"
RUNS="$REPO/.recipe/recipe_runs"
LOGS="$REPO/.recipe/logs"
mkdir -p "$RUNS" "$LOGS"

if [ ! -d "$DATA/fold_5" ]; then
  echo "=== building dataset $(date) ===" | tee -a "$LOGS/driver_r5.log"
  python "$REPO/tools/make_synth_tlpano.py" --out "$DATA" \
    >>"$LOGS/dataset.log" 2>&1 || { echo "dataset build FAILED"; exit 1; }
fi

# extended tree: published per-class weights; internal nodes = mean of
# children (alveolar=(1.577+0.9619)/2, tooth+alveolar=(alveolar+0.1770)/2,
# healthy=(1.5432+0.2638+1.0413)/3)
EXT_LW="[[0.0297, 0.7230],[1.2695, 0.1770],[1.577, 0.9619, 3.9722, 0.9494],[1.5432, 0.2638, 1.0413]]"
# reference flat weights re-ordered to the extended tree's leaf order
# (bg, upper, lower, composite, pulp, dentin, enamel)
EXT_FLAT_LW="[[0.0285, 1.5159, 0.9227, 3.8021, 1.4842, 0.2532, 1.0]]"

run() {
  local name=$1 epochs=$2 lw=$3 mtype=$4 lr=$5; shift 5
  echo "=== $name start $(date) ===" | tee -a "$LOGS/driver_r5.log"
  python -m restrictive_hierarchical_semantic_segmentation_tpu.cli.train \
    --save-path "$RUNS/$name" --model-select 1 --model-type "$mtype" \
    --learning-rate "[$lr]" --level-weights "$lw" \
    --data-root "$DATA" \
    --tree-root "$REPO/assets/class_tree_tl_extended.json" \
    --class-map "$REPO/assets/class_map_extended.csv" \
    --batch-size 4 --val-batch 4 --img-size 620 --epochs "$epochs" \
    --learning-rate-scheduler-minimum 0.001 \
    --inc-cross-val True --folds 5 \
    --compute-dtype bfloat16 --device-data True --ckpt-every 20 \
    --best-save end \
    --auto-resume True --save-images-batch False "$@" \
    >>"$LOGS/$name.log" 2>&1
  echo "=== $name exit $? $(date) ===" | tee -a "$LOGS/driver_r5.log"
}

cd "$REPO"
run hier_hrnet_ext_r5 40 "$EXT_LW" 1 0.024
run flat_hrnet_ext_r5 40 "$EXT_FLAT_LW" 0 0.022

echo "=== eval + table $(date) ===" | tee -a "$LOGS/driver_r5.log"
python tools/aggregate_recipe_table.py --eval \
  --runs-root "$RUNS" --data-root "$DATA" \
  --configs hier_hrnet_ext_r5,flat_hrnet_ext_r5 \
  >>"$LOGS/eval_r5.log" 2>&1
python tools/aggregate_recipe_table.py --table --runs-root "$RUNS" \
  --configs hier_hrnet_ext_r5,flat_hrnet_ext_r5 \
  >"$LOGS/table_r5.md" 2>&1
echo "=== ALL DONE $(date) ===" | tee -a "$LOGS/driver_r5.log"

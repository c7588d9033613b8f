#!/usr/bin/env bash
# Round-4 recipe arms (VERDICT r3 #2/#3) on the synthetic TL-pano analog:
#
#   1. hier_hrnet_w64 — the TPU-native W64 preset through the EXACT
#      reference recipe (620px, b4, 80 epochs, AdamW lr 0.024 + plateau,
#      reference hier level weights, 5 folds). Answers "does 1.78x capacity
#      at 1.18x step cost buy accuracy?" next to the round-3 W48 row.
#   2. hier_hrnet_ext — the depth-4 extended tree (class_tree_tl_extended
#      .json) with the same recipe. Level weights: the reference publishes
#      weights only for the default tree; each class keeps its published
#      weight and new internal nodes (alveolar, tooth+alveolar, healthy)
#      take the mean of their children's (documented mapping, BENCHMARKS).
#      40 epochs: the synthetic set plateaus far earlier (round-3 curves) —
#      truncation is recorded in the table caption.
#   3. flat_hrnet_ext — the flat comparison arm, trained under the extended
#      tree's leaf order (flat training is tree-independent up to channel
#      order — tools/flat_ckpt_permute.py converts existing checkpoints
#      exactly when they survive; the round-3 ones did not, so retrain at
#      the same 40-epoch budget as the hier arm), evaluated at depth 4 via
#      parent reconstruction (reference predictEval.py:85-129 semantics).
#
# Then: per-fold predict_eval for the new arms + the BENCHMARKS table.
# Safe to re-run: finished folds resume/no-op via --auto-resume.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DATA="$REPO/.recipe/tlpano_synth"
RUNS="$REPO/.recipe/recipe_runs"
LOGS="$REPO/.recipe/logs"
mkdir -p "$RUNS" "$LOGS"

if [ ! -d "$DATA/fold_5" ]; then
  echo "=== building dataset $(date) ===" | tee -a "$LOGS/driver_r4.log"
  python "$REPO/tools/make_synth_tlpano.py" --out "$DATA" \
    >>"$LOGS/dataset.log" 2>&1 || { echo "dataset build FAILED"; exit 1; }
fi

HIER_LW="[[0.0297, 1.577, 0.9619, 0.1770],[1.5432, 0.2638, 1.0413, 3.9722]]"
# extended tree: published per-class weights; internal nodes = mean of
# children (alveolar=(1.577+0.9619)/2, tooth+alveolar=(alveolar+0.1770)/2,
# healthy=(1.5432+0.2638+1.0413)/3)
EXT_LW="[[0.0297, 0.7230],[1.2695, 0.1770],[1.577, 0.9619, 3.9722, 0.9494],[1.5432, 0.2638, 1.0413]]"
# reference flat weights re-ordered to the extended tree's leaf order
# (bg, upper, lower, composite, pulp, dentin, enamel)
EXT_FLAT_LW="[[0.0285, 1.5159, 0.9227, 3.8021, 1.4842, 0.2532, 1.0]]"

run() {
  local name=$1 epochs=$2 lw=$3 tree=$4 cmap=$5 mtype=$6 lr=$7; shift 7
  echo "=== $name start $(date) ===" | tee -a "$LOGS/driver_r4.log"
  python -m restrictive_hierarchical_semantic_segmentation_tpu.cli.train \
    --save-path "$RUNS/$name" --model-select 1 --model-type "$mtype" \
    --learning-rate "[$lr]" --level-weights "$lw" \
    --data-root "$DATA" \
    --tree-root "$REPO/assets/$tree" \
    --class-map "$REPO/assets/$cmap" \
    --batch-size 4 --val-batch 4 --img-size 620 --epochs "$epochs" \
    --learning-rate-scheduler-minimum 0.001 \
    --inc-cross-val True --folds 5 \
    --compute-dtype bfloat16 --device-data True --ckpt-every 20 \
    --best-save end \
    --auto-resume True --save-images-batch False "$@" \
    >>"$LOGS/$name.log" 2>&1
  echo "=== $name exit $? $(date) ===" | tee -a "$LOGS/driver_r4.log"
}

cd "$REPO"
run hier_hrnet_w64 80 "$HIER_LW" class_tree_tl.json class_map.csv 1 0.024 \
  --config w64
run hier_hrnet_ext 40 "$EXT_LW" class_tree_tl_extended.json \
  class_map_extended.csv 1 0.024
run flat_hrnet_ext 40 "$EXT_FLAT_LW" class_tree_tl_extended.json \
  class_map_extended.csv 0 0.022

echo "=== eval + table $(date) ===" | tee -a "$LOGS/driver_r4.log"
python tools/aggregate_recipe_table.py --eval \
  --runs-root "$RUNS" --data-root "$DATA" \
  >>"$LOGS/eval_r4.log" 2>&1
python tools/aggregate_recipe_table.py --table --runs-root "$RUNS" \
  >"$LOGS/table_r4.md" 2>&1
echo "=== ALL DONE $(date) ===" | tee -a "$LOGS/driver_r4.log"

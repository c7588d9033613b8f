#!/usr/bin/env bash
# Post-sweep TPU endgame: runs everything that needed the chip once the
# full-recipe sweep (tools/run_recipe.sh) finishes, in priority order:
#   1. per-fold predict_eval over all four configs + the BASELINE-format
#      accuracy table (tools/aggregate_recipe_table.py)
#   2. bench.py headline number (warms the driver's compile cache too)
#   3. compiled-mode Pallas tests (tests/test_pallas_tpu_compiled.py)
#   4. batch-1 serving-latency levers (tools/serving_latency_b1.py)
#   5. (stretch) W48->W64 channel-packing step-time bench
# Each step logs under .recipe/logs/ and failures don't block later steps.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOGS="$REPO/.recipe/logs"
mkdir -p "$LOGS"
cd "$REPO"

step() {
  local name=$1; shift
  echo "=== post-sweep $name start $(date) ===" | tee -a "$LOGS/post_sweep.log"
  "$@" >>"$LOGS/post_$name.log" 2>&1
  echo "=== post-sweep $name exit $? $(date) ===" | tee -a "$LOGS/post_sweep.log"
}

step eval python tools/aggregate_recipe_table.py --eval \
  --runs-root "$REPO/.recipe/recipe_runs" \
  --data-root "$REPO/.recipe/tlpano_synth"
step table python tools/aggregate_recipe_table.py --table \
  --runs-root "$REPO/.recipe/recipe_runs" \
  --data-root "$REPO/.recipe/tlpano_synth"
step bench python bench.py
step pallas python -m pytest tests/test_pallas_tpu_compiled.py -v
step serving_b1 python tools/serving_latency_b1.py
step export_check python tools/export_tpu_check.py \
  --weights "$REPO/.recipe/recipe_runs/hier_hrnet/fold_1/best.ckpt"
step packing python tools/channel_packing_experiment.py --bench
step packing_fwd python tools/channel_packing_experiment.py --bench-fwd \
  --batch 1 --steps 50
echo "=== post-sweep ALL DONE $(date) ===" | tee -a "$LOGS/post_sweep.log"

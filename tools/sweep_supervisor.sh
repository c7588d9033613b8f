#!/usr/bin/env bash
# Babysits tools/run_recipe.sh against TPU-tunnel outages (observed once:
# client wedges in futex_wait forever, logs go stale). Loop:
#   1. if no sweep driver alive and sweep incomplete -> (re)launch run_recipe.sh
#      (--auto-resume makes re-runs no-op/resume per fold)
#   2. every CHECK_S: if the newest .recipe/logs mtime is older than STALE_S
#      while a driver is alive -> kill the driver's process tree by PID
#      (never by pattern) so the next loop iteration relaunches it
#   3. when all 4 configs have 5 folds x EPOCHS rows in metrics.csv ->
#      run tools/post_sweep_tpu.sh once and exit
# Usage: nohup bash tools/sweep_supervisor.sh >/tmp/supervisor.out 2>&1 &
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
RUNS="$REPO/.recipe/recipe_runs"
LOGS="$REPO/.recipe/logs"
EPOCHS=80
# Must exceed the worst healthy silent window: a config's first epoch
# includes a cold train-step compile AND a cold eval compile (10-25 min
# EACH through the relay, tools/warm_*_compiles.py) before the first
# epoch line is logged. Observed: 871 s for hier_hrnet; budget 2x worst.
STALE_S=5400
CHECK_S=120
DRIVER_PID_FILE=/tmp/sweep.pid

complete() {
  for cfg in hier_hrnet flat_hrnet hier_unet flat_unet; do
    for f in 1 2 3 4 5; do
      csv="$RUNS/$cfg/fold_$f/metrics.csv"
      [ -f "$csv" ] || return 1
      rows=$(($(wc -l < "$csv") - 1))
      [ "$rows" -ge "$EPOCHS" ] || return 1
    done
  done
  return 0
}

driver_alive() {
  [ -f "$DRIVER_PID_FILE" ] && kill -0 "$(cat "$DRIVER_PID_FILE")" 2>/dev/null
}

kill_tree() { # kill PID and descendants, leaves first
  local pid=$1
  for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do kill_tree "$c"; done
  kill -9 "$pid" 2>/dev/null
}

newest_log_age() {
  local newest
  newest=$(find "$LOGS" -name '*.log' -printf '%T@\n' 2>/dev/null | sort -rn | head -1)
  [ -n "$newest" ] || { echo 999999; return; }
  echo "$(( $(date +%s) - ${newest%.*} ))"
}

echo "supervisor start $(date)"
while true; do
  if complete; then
    echo "sweep COMPLETE $(date)"
    if driver_alive; then kill_tree "$(cat "$DRIVER_PID_FILE")"; fi
    break
  fi
  if driver_alive; then
    age=$(newest_log_age)
    if [ "$age" -gt "$STALE_S" ]; then
      echo "STALL detected (log age ${age}s) $(date) — killing driver tree"
      kill_tree "$(cat "$DRIVER_PID_FILE")"
      sleep 10
    fi
  else
    echo "driver not alive — (re)launching run_recipe.sh $(date)"
    nohup bash "$REPO/tools/run_recipe.sh" >> /tmp/sweep_driver.out 2>&1 &
    echo $! > "$DRIVER_PID_FILE"
  fi
  sleep "$CHECK_S"
done

if [ ! -f "$LOGS/post_sweep.log" ] || ! grep -q "ALL DONE" "$LOGS/post_sweep.log"; then
  echo "launching post_sweep_tpu.sh $(date)"
  bash "$REPO/tools/post_sweep_tpu.sh"
fi
echo "supervisor done $(date)"

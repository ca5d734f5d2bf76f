#!/bin/bash
# Train every reference task at its reference budget (cfg/train/<T>PPO.yaml
# max_epochs x horizon x numEnvs) on the available accelerator, sequentially.
# Logs to runs/logs/<task>.log; per-run history lands in
# runs/<task>/history.json (consumed by scripts/make_learning_json.py).
#
# Usage: bash scripts/train_all.sh [task ...]   (default: the full suite)
# Env:   RESUME=1 resume each task from runs/<t>/nn/last if present
#        MAX_RETRIES (default 1), TASK_TIMEOUT (s, default 5400),
#        WATCHDOG_S (log-silence kill threshold, default 600)
#
# The watchdog + checkpoint-resume machinery lives in scripts/run_task.sh
# (one implementation for both campaign paths — the per-task wrapper here
# just pins this script's historical defaults).
set -u
cd "$(dirname "$0")/.."

TASKS=("$@")
if [ ${#TASKS[@]} -eq 0 ]; then
  TASKS=(Cartpole Ant Humanoid Anymal AnymalTerrain BallBalance
         FrankaCabinet Ingenuity Quadcopter Crazyflie AllegroHand
         ShadowHand ShadowHandOpenAI_FF ShadowHandOpenAI_LSTM)
fi

for t in "${TASKS[@]}"; do
  MAX_RETRIES="${MAX_RETRIES:-1}" TASK_TIMEOUT="${TASK_TIMEOUT:-5400}" \
  WATCHDOG_S="${WATCHDOG_S:-600}" RESUME="${RESUME:-0}" \
    bash scripts/run_task.sh "$t" "$t"
  sleep 5
done

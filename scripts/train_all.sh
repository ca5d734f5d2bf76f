#!/bin/bash
# Train every reference task at its reference budget (cfg/train/<T>PPO.yaml
# max_epochs x horizon x numEnvs) on the available accelerator, sequentially.
# Logs to runs/logs/<task>.log; per-run history lands in
# runs/<task>/history.json (consumed by scripts/make_learning_json.py).
#
# Usage: bash scripts/train_all.sh [task ...]   (default: the full suite)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

TASKS=("$@")
if [ ${#TASKS[@]} -eq 0 ]; then
  TASKS=(Cartpole Ant Humanoid Anymal AnymalTerrain BallBalance
         FrankaCabinet Ingenuity Quadcopter Crazyflie AllegroHand
         ShadowHand ShadowHandOpenAI_FF ShadowHandOpenAI_LSTM)
fi

for t in "${TASKS[@]}"; do
  echo "=== training $t ($(date -u +%H:%M:%S)) ==="
  timeout "${TASK_TIMEOUT:-5400}" python -m omniisaacgymenvs_tpu.scripts.train \
    task="$t" experiment="$t" > "runs/logs/$t.log" 2>&1
  rc=$?
  echo "=== $t done rc=$rc ($(date -u +%H:%M:%S)) ==="
  tail -3 "runs/logs/$t.log"
done

#!/bin/bash
# Round-5 remaining TPU campaign queue (run serially on the one chip):
#   1. FF learner phase profile (VERDICT #7 groundwork)
#   2. no-DR OpenAI_FF full budget      (VERDICT #3: the FF ceiling)
#   3. AnymalTerrain riser-walls full budget (VERDICT #4)
#   4. AllegroHand rerun under the shipped standard LR schedule (#8)
#   5. ShadowHand rerun under the shipped standard LR schedule
#   6. Ant rerun under the shipped standard LR schedule
set -u
cd "$(dirname "$0")/.."

echo "=== [1/6] Humanoid learner profile ==="
timeout 1200 python tools/lstm_profile.py 8192 Humanoid > runs/logs/humanoid_profile.log 2>&1
tail -8 runs/logs/humanoid_profile.log

echo "=== [2/6] no-DR OpenAI_FF ==="
MAX_RETRIES=6 TASK_TIMEOUT=7000 WATCHDOG_S=600 bash scripts/run_task.sh \
  ShadowHandOpenAI_FF_noDR ShadowHandOpenAI_FF \
  task.domain_randomization.randomize=False

echo "=== [3/6] AnymalTerrain riser walls ==="
MAX_RETRIES=6 TASK_TIMEOUT=7000 WATCHDOG_S=600 bash scripts/run_task.sh \
  AnymalTerrain_walls AnymalTerrain task.env.terrain.riserWalls=True

echo "=== [4/6] AllegroHand (standard schedule) ==="
MAX_RETRIES=6 TASK_TIMEOUT=7000 WATCHDOG_S=600 bash scripts/run_task.sh \
  AllegroHand_r5 AllegroHand

echo "=== [5/6] ShadowHand (standard schedule) ==="
MAX_RETRIES=6 TASK_TIMEOUT=7000 WATCHDOG_S=600 bash scripts/run_task.sh \
  ShadowHand_r5 ShadowHand

echo "=== [6/6] Ant (standard schedule) ==="
MAX_RETRIES=6 TASK_TIMEOUT=3000 WATCHDOG_S=600 bash scripts/run_task.sh \
  Ant_r5 Ant

echo "=== r5 queue done ==="

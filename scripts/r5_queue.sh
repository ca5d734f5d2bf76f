#!/bin/bash
# Round-5 remaining TPU campaign queue (run serially on the one chip):
#   1. FF learner phase profile (VERDICT #7 groundwork)
#   2. no-DR OpenAI_FF full budget      (VERDICT #3: the FF ceiling)
#   3. ShadowHand_DR @16384 full budget (VERDICT #5; the r4 3500-epoch
#      checkpoint was not preserved, so this is a fresh 10000-epoch run)
#   4. AnymalTerrain riser-walls full budget (VERDICT #4)
#   5. AllegroHand rerun under the shipped standard LR schedule (#8)
#   6. ShadowHand rerun under the shipped standard LR schedule
#   7. Ant rerun under the shipped standard LR schedule
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

echo "=== [1/7] Humanoid learner profile ==="
timeout 1200 python tools/lstm_profile.py 8192 Humanoid > runs/logs/humanoid_profile.log 2>&1
tail -8 runs/logs/humanoid_profile.log

echo "=== [2/7] no-DR OpenAI_FF ==="
MAX_RETRIES=6 TASK_TIMEOUT=7000 WATCHDOG_S=600 RESUME=1 bash scripts/run_task.sh \
  ShadowHandOpenAI_FF_noDR ShadowHandOpenAI_FF \
  task.domain_randomization.randomize=False

echo "=== [3/7] ShadowHand_DR @16384 ==="
MAX_RETRIES=6 TASK_TIMEOUT=7000 WATCHDOG_S=600 RESUME=1 bash scripts/run_task.sh \
  ShadowHand_DR ShadowHand \
  task.env.numEnvs=16384 task.domain_randomization.randomize=True

echo "=== [4/7] AnymalTerrain riser walls ==="
MAX_RETRIES=6 TASK_TIMEOUT=7000 WATCHDOG_S=600 RESUME=1 bash scripts/run_task.sh \
  AnymalTerrain_walls AnymalTerrain task.env.terrain.riserWalls=True

echo "=== [5/7] AllegroHand (standard schedule) ==="
MAX_RETRIES=6 TASK_TIMEOUT=7000 WATCHDOG_S=600 RESUME=1 bash scripts/run_task.sh \
  AllegroHand_r5 AllegroHand

echo "=== [6/7] ShadowHand (standard schedule) ==="
MAX_RETRIES=6 TASK_TIMEOUT=7000 WATCHDOG_S=600 RESUME=1 bash scripts/run_task.sh \
  ShadowHand_r5 ShadowHand

echo "=== [7/7] Ant (standard schedule) ==="
MAX_RETRIES=6 TASK_TIMEOUT=3000 WATCHDOG_S=600 RESUME=1 bash scripts/run_task.sh \
  Ant_r5 Ant

echo "=== r5 queue done ==="

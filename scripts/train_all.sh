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

# Each task gets one automatic retry: the tunneled TPU runtime very rarely
# wedges on device hand-off (first exec call never returns); a watchdog in
# the wrapper below kills a run with no log growth for WATCHDOG_S seconds.
run_one() {
  local t="$1" log="runs/logs/$1.log"
  # setsid: run in its own process group so the watchdog can kill the WHOLE
  # group (timeout wrapper + python trainer). SIGKILLing only the wrapper
  # would orphan a trainer stuck in an uninterruptible device call — the
  # exact scenario the watchdog exists for — leaving it holding the TPU.
  setsid timeout "${TASK_TIMEOUT:-5400}" python -u -m omniisaacgymenvs_tpu.scripts.train \
    task="$t" experiment="$t" > "$log" 2>&1 &
  local pid=$!
  local last_size=0 idle=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    local size
    size=$(stat -c %s "$log" 2>/dev/null || echo 0)
    if [ "$size" -eq "$last_size" ]; then
      idle=$((idle + 30))
      if [ "$idle" -ge "${WATCHDOG_S:-600}" ]; then
        echo "--- watchdog: $t silent ${idle}s, killing group $pid" >> "$log"
        kill -- -"$pid" 2>/dev/null; sleep 5; kill -9 -- -"$pid" 2>/dev/null
        wait "$pid" 2>/dev/null
        return 99
      fi
    else
      idle=0; last_size=$size
    fi
  done
  wait "$pid"
}

for t in "${TASKS[@]}"; do
  echo "=== training $t ($(date -u +%H:%M:%S)) ==="
  run_one "$t"
  rc=$?
  # rc=124 is the intentional TASK_TIMEOUT cap (checkpoints + history are
  # already on disk) — don't retry those
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "=== $t rc=$rc; retrying once ($(date -u +%H:%M:%S)) ==="
    sleep 10
    mv "runs/logs/$t.log" "runs/logs/$t.try1.log" 2>/dev/null
    run_one "$t"
    rc=$?
  fi
  echo "=== $t done rc=$rc ($(date -u +%H:%M:%S)) ==="
  tail -3 "runs/logs/$t.log"
  sleep 5
done

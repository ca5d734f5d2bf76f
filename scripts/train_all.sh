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
  shift
  # setsid: run in its own process group so the watchdog can kill the WHOLE
  # group (timeout wrapper + python trainer). SIGKILLing only the wrapper
  # would orphan a trainer stuck in an uninterruptible device call — the
  # exact scenario the watchdog exists for — leaving it holding the TPU.
  setsid timeout "${TASK_TIMEOUT:-5400}" python -u -m omniisaacgymenvs_tpu.scripts.train \
    task="$t" experiment="$t" "$@" > "$log" 2>&1 &
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
  # RESUME=1: continue an interrupted campaign from runs/<t>/nn/last on the
  # FIRST attempt too (default: first attempt starts fresh).
  if [ "${RESUME:-0}" = "1" ] && [ -d "runs/$t/nn/last" ]; then
    run_one "$t" "checkpoint=runs/$t/nn/last"
  else
    run_one "$t"
  fi
  rc=$?
  # Watchdog/wedge retries RESUME, never restart: the trainer checkpoints
  # runs/<T>/nn/last every save_frequency epochs and `checkpoint=` continues
  # from the saved epoch with a continuous history.json (learn/ppo.py
  # train() start_epoch) — a wedge at epoch 5539/10000 must not cost 5539
  # epochs (the round-4 FF casualty). rc=124 is the intentional
  # TASK_TIMEOUT cap (checkpoints + history already on disk) — not retried.
  try=0
  while [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ] && [ "$try" -lt "${MAX_RETRIES:-1}" ]; do
    try=$((try + 1))
    echo "=== $t rc=$rc; retry $try/${MAX_RETRIES:-1} ($(date -u +%H:%M:%S)) ==="
    sleep 10
    mv "runs/logs/$t.log" "runs/logs/$t.try$try.log" 2>/dev/null
    if [ -d "runs/$t/nn/last" ]; then
      echo "=== resuming $t from runs/$t/nn/last ==="
      run_one "$t" "checkpoint=runs/$t/nn/last"
    else
      run_one "$t"
    fi
    rc=$?
  done
  echo "=== $t done rc=$rc ($(date -u +%H:%M:%S)) ==="
  tail -3 "runs/logs/$t.log"
  sleep 5
done

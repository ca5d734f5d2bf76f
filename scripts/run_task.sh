#!/bin/bash
# Watchdog + checkpoint-resume wrapper for ONE training run with arbitrary
# overrides (the train_all.sh machinery, generalized to runs whose
# experiment name differs from the task, e.g. the 16384-env DR campaign).
#
# Usage: bash scripts/run_task.sh <experiment> <task> [override ...]
# Env:   RESUME=1 resume from runs/<experiment>/nn/last on first attempt
#        MAX_RETRIES (default 3), TASK_TIMEOUT (s, default 7000),
#        WATCHDOG_S (log-silence kill threshold, default 600)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs

EXP="$1"; TASK="$2"; shift 2

run_once() {
  local log="runs/logs/$EXP.log"
  setsid timeout "${TASK_TIMEOUT:-7000}" python -u -m omniisaacgymenvs_tpu.scripts.train \
    task="$TASK" experiment="$EXP" "$@" > "$log" 2>&1 &
  local pid=$!
  local last_size=0 idle=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    local size
    size=$(stat -c %s "$log" 2>/dev/null || echo 0)
    if [ "$size" -eq "$last_size" ]; then
      idle=$((idle + 30))
      if [ "$idle" -ge "${WATCHDOG_S:-600}" ]; then
        echo "--- watchdog: $EXP silent ${idle}s, killing group $pid" >> "$log"
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

echo "=== $EXP (task=$TASK) start $(date -u +%H:%M:%S) ==="
if [ "${RESUME:-0}" = "1" ] && [ -d "runs/$EXP/nn/last" ]; then
  run_once "$@" "checkpoint=runs/$EXP/nn/last"
else
  run_once "$@"
fi
rc=$?
try=0
while [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ] && [ "$try" -lt "${MAX_RETRIES:-3}" ]; do
  try=$((try + 1))
  echo "=== $EXP rc=$rc; retry $try/${MAX_RETRIES:-3} ($(date -u +%H:%M:%S)) ==="
  sleep 10
  mv "runs/logs/$EXP.log" "runs/logs/$EXP.try$try.log" 2>/dev/null
  if [ -d "runs/$EXP/nn/last" ]; then
    run_once "$@" "checkpoint=runs/$EXP/nn/last"
  else
    run_once "$@"
  fi
  rc=$?
done
echo "=== $EXP done rc=$rc ($(date -u +%H:%M:%S)) ==="
tail -3 "runs/logs/$EXP.log"
exit "$rc"

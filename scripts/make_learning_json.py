"""Aggregate per-task training histories into LEARNING.json.

Reads runs/<task>/history.json (written by scripts/train.py; searches the
run dirs given as arguments, default `runs`) and emits a machine-readable
learning record per task: budget, final/best mean episode reward, episode
length, steps/s, and task sentinels (consecutive successes for the hands,
terrain level for AnymalTerrain).

Usage: python scripts/make_learning_json.py [runs_dir ...] > LEARNING.json
(default search: results/ then runs/ — results/ is the curated campaign
record, runs/ holds in-progress runs; a task found in both keeps the
version with the LARGER epoch count so partial re-runs never shadow a
completed campaign)
"""

import json
import os
import sys

# only the official reference task names — ad-hoc experiment dirs
# (smoke runs, debug runs) in runs/ are not part of the learning record
TASKS = {
    "Cartpole", "Ant", "Humanoid", "Anymal", "AnymalTerrain",
    "BallBalance", "FrankaCabinet", "Ingenuity", "Quadcopter", "Crazyflie",
    "AllegroHand", "ShadowHand", "ShadowHandOpenAI_FF",
    "ShadowHandOpenAI_LSTM",
    # the reference's recommended DR-at-scale configuration (16384 envs,
    # full DR: /root/reference docs/rl_examples.md:123) tracked as its own
    # campaign row
    "ShadowHand_DR",
}


def summarize(task: str, hist: list) -> dict:
    last = hist[-1]
    tail = hist[-max(1, len(hist) // 20):]          # final 5% window
    mean_tail = lambda k: (
        sum(h.get(k, 0.0) for h in tail) / len(tail) if tail else None
    )
    out = {
        "task": task,
        "epochs": int(last["epoch"]) + 1,
        "env_steps": int(last["env_steps"]),
        "steps_per_sec": round(
            sum(h["steps_per_sec"] for h in tail) / len(tail), 1
        ),
        "final_ep_reward": round(mean_tail("mean_ep_reward"), 2),
        "best_ep_reward": round(
            max(h["mean_ep_reward"] for h in hist), 2
        ),
        "final_ep_length": round(mean_tail("mean_ep_length"), 1),
    }
    for key, name in [
        ("Episode/consecutive_successes", "consecutive_successes"),
        ("episode/terrain_level", "terrain_level"),
        ("Episode/successes", "mean_successes"),
    ]:
        if key in last:
            out[name] = round(mean_tail(key), 2)
            out["best_" + name] = round(max(h[key] for h in hist), 2)
    return out


def build(run_dirs=("results", "runs")) -> dict:
    rows = {}
    for rd in run_dirs:
        if not os.path.isdir(rd):
            continue
        for task in sorted(os.listdir(rd)):
            if task not in TASKS:
                continue
            hp = os.path.join(rd, task, "history.json")
            if not os.path.exists(hp):
                continue
            with open(hp) as f:
                hist = json.load(f)
            if not hist:
                continue
            row = summarize(task, hist)
            # keep the longer (more-trained) record when both dirs have one
            if task not in rows or row["epochs"] > rows[task]["epochs"]:
                rows[task] = row
    return dict(sorted(rows.items()))


def main():
    print(json.dumps(build(sys.argv[1:] or ("results", "runs")), indent=2))


if __name__ == "__main__":
    main()

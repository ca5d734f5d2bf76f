"""ShadowHandOpenAI_FF DR diagnosis sweep (VERDICT r3 #2).

Full DR collapses episode length to ~150/600 (the cube gets dropped in
~2.5 s) while non-DR ShadowHand learns to 13 consecutive successes. This
sweep trains ~N epochs per configuration with exactly ONE randomization
group enabled at a time to find which group kills the grip:

  none        randomize=False, forceScale=0
  force       randomize=False, object force kicks only (env.forceScale=1)
  obs_act     observations + actions noise only
  object      object_view only (mass 0.5-1.5x, scale, friction)
  hand        shadow_hand_view only (gains, limits, tendons, friction)
  gravity     simulation.gravity only
  full        everything (control)

Usage: python tools/ff_dr_sweep.py [epochs] [group ...]
Writes one JSON line per config to stdout and /tmp/ff_dr_sweep.jsonl.
"""

import copy
import json
import os as _os
import sys as _sys
import time

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(_os.path.abspath(__file__))))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)

import jax

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.tasks import get_task
from omniisaacgymenvs_tpu.utils.config import load_config, ppo_config_kwargs

GROUPS = {
    "none": dict(dr=None, force=0.0),
    "force": dict(dr=None, force=1.0),
    "obs_act": dict(dr=("observations", "actions"), force=0.0),
    "object": dict(dr=("rigid_prim_views",), force=0.0),
    "hand": dict(dr=("articulation_views",), force=0.0),
    "gravity": dict(dr=("simulation",), force=0.0),
    "full": dict(dr="all", force=1.0),
}


def make_cfg(group):
    cfg = load_config({"task": "ShadowHandOpenAI_FF"})
    task_cfg = copy.deepcopy(cfg["task"])
    spec = GROUPS[group]
    task_cfg["env"]["forceScale"] = spec["force"]
    dr = task_cfg.get("domain_randomization", {})
    if spec["dr"] is None:
        dr["randomize"] = False
    elif spec["dr"] != "all":
        params = dr.get("randomization_params", {})
        dr["randomization_params"] = {
            k: v for k, v in params.items() if k in spec["dr"]
        }
    return cfg, task_cfg


def run(group, epochs):
    cfg, task_cfg = make_cfg(group)
    task = get_task("ShadowHandOpenAI_FF", task_cfg)
    env = VecEnv(task, task_cfg["env"]["numEnvs"])
    kw = ppo_config_kwargs(cfg["train"])
    kw["max_epochs"] = epochs
    trainer = PPOTrainer(env, PPOConfig(**kw), seed=17)
    t0 = time.time()
    rows = []
    trainer.train(max_epochs=epochs, log_every=50,
                  log_fn=lambda s: None,
                  history_path="/tmp/ff_dr_hist_%s.json" % group,
                  epochs_per_jit=10)
    hist = json.load(open("/tmp/ff_dr_hist_%s.json" % group))
    last = hist[-1]
    out = dict(
        group=group, epochs=epochs,
        ep_len=round(last["mean_ep_length"], 1),
        ep_rew=round(last["mean_ep_reward"], 1),
        cons=round(last.get("Episode/consecutive_successes", 0.0), 3),
        steps_s=round(epochs * trainer.cfg.horizon_length
                      * env.num_envs / (time.time() - t0)),
    )
    # trajectory of ep_len across the run (collapse vs climb signal)
    out["ep_len_curve"] = [round(h["mean_ep_length"], 0)
                           for h in hist[:: max(1, len(hist) // 8)]]
    out["cons_curve"] = [round(h.get("Episode/consecutive_successes", 0.0), 2)
                         for h in hist[:: max(1, len(hist) // 8)]]
    return out


def main():
    args = _sys.argv[1:]
    epochs = int(args[0]) if args else 600
    groups = args[1:] or list(GROUPS)
    with open("/tmp/ff_dr_sweep.jsonl", "a") as f:
        for g in groups:
            t0 = time.time()
            try:
                r = run(g, epochs)
            except Exception as e:  # noqa: BLE001 — sweep must finish
                r = dict(group=g, error=repr(e)[:300])
            r["wall_s"] = round(time.time() - t0)
            line = json.dumps(r)
            print(line, flush=True)
            f.write(line + "\n")
            f.flush()


if __name__ == "__main__":
    main()

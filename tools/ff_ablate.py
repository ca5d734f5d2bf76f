"""FF ablation: which ingredient stops goal-seeking?

Trains ShadowHandOpenAI_FF variants (DR/forces off) for N epochs:
  full-obs    observationType=full (157) — everything else FF
  openai      the lean 42-dim obs (control)
  openai-60hz lean obs at ShadowHand's 60 Hz control + ma 1.0
  openai-tol1 lean obs, successTolerance 0.1 (sharper rot reward near goal)

Usage: python tools/ff_ablate.py [epochs] [variant ...]
"""

import copy
import json
import os as _os
import sys as _sys
import time

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.tasks import get_task
from omniisaacgymenvs_tpu.utils.config import load_config, ppo_config_kwargs

VARIANTS = {
    "full-obs": {"observationType": "full"},
    "openai": {},
    "openai-60hz": {"controlFrequencyInv": 2, "actionsMovingAverage": 1.0,
                    "episodeLength": 480},
    "openai-tol1": {"successTolerance": 0.1},
}


def run(name, epochs):
    cfg = load_config({"task": "ShadowHandOpenAI_FF"})
    tc = copy.deepcopy(cfg["task"])
    tc["env"]["forceScale"] = 0.0
    tc.get("domain_randomization", {})["randomize"] = False
    tc["env"].update(VARIANTS[name])
    task = get_task("ShadowHandOpenAI_FF", tc)
    env = VecEnv(task, tc["env"]["numEnvs"])
    kw = ppo_config_kwargs(cfg["train"])
    trainer = PPOTrainer(env, PPOConfig(**kw), seed=11)
    t0 = time.time()
    hp = f"/tmp/ff_ablate_{name}.json"
    trainer.train(max_epochs=epochs, log_every=50, log_fn=lambda s: None,
                  history_path=hp, epochs_per_jit=10)
    hist = json.load(open(hp))
    out = dict(
        variant=name, epochs=epochs,
        cons_curve=[round(h.get("Episode/consecutive_successes", 0.0), 2)
                    for h in hist[:: max(1, len(hist) // 10)]],
        ep_len=round(hist[-1]["mean_ep_length"], 1),
        steps_s=round(epochs * trainer.cfg.horizon_length * env.num_envs
                      / (time.time() - t0)),
    )
    return out


def main():
    args = _sys.argv[1:]
    epochs = int(args[0]) if args else 1500
    names = args[1:] or list(VARIANTS)
    for n in names:
        try:
            r = run(n, epochs)
        except Exception as e:  # noqa: BLE001
            r = dict(variant=n, error=repr(e)[:300])
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()

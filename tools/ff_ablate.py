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
    # cross-overs: split env reward structure from learner config
    # ShadowHand-like env dynamics under the FF learner (CV, net 400,
    # minibatch 16384, gamma 0.998, standard schedule)
    "shenv-ffcfg": {"observationType": "full", "successTolerance": 0.1,
                    "maxConsecutiveSuccesses": 0, "fallPenalty": 0.0,
                    "episodeLength": 600, "controlFrequencyInv": 2,
                    "actionsMovingAverage": 1.0},
    # FF env under the ShadowHand learner (no CV, net 512, minibatch
    # 32768, mini_epochs 5, gamma 0.99, value_bootstrap, legacy schedule)
    "ffenv-shcfg": {"_train": "ShadowHand", "asymmetric_observations": False,
                    "observationType": "full"},
    # bisect the FF learner: CV off (shared-trunk critic), rest identical
    "ffcfg-nocv": {"asymmetric_observations": False,
                   "observationType": "full"},
    # gamma alone
    "ffcfg-g99": {"_gamma": 0.99},
    # legacy (per-minibatch) LR schedule alone
    "ffcfg-legacy": {"_schedule": "legacy"},
    # CV trained gentler: lower LR / fewer passes per epoch
    "ffcfg-cvlr1e4": {"_cv": {"learning_rate": 1e-4}},
    "ffcfg-cvme2": {"_cv": {"mini_epochs": 2}},
    "ffcfg-cvlr1e4me2": {"_cv": {"learning_rate": 1e-4, "mini_epochs": 2}},
    # CV for GAE + actor value head trained on returns as auxiliary task
    "ffcfg-auxv": {"_cfgset": {"actor_aux_value_loss": True}},
}


def run(name, epochs):
    cfg = load_config({"task": "ShadowHandOpenAI_FF"})
    spec = dict(VARIANTS[name])
    if spec.pop("_train", None) == "ShadowHand":
        cfg["train"] = load_config({"task": "ShadowHand"})["train"]
    g = spec.pop("_gamma", None)
    if g is not None:
        cfg["train"]["params"]["config"]["gamma"] = g
    sch = spec.pop("_schedule", None)
    if sch is not None:
        cfg["train"]["params"]["config"]["schedule_type"] = sch
    cv = spec.pop("_cv", None)
    if cv is not None:
        cfg["train"]["params"]["config"]["central_value_config"].update(cv)
    cs = spec.pop("_cfgset", None)
    if cs is not None:
        cfg["train"]["params"]["config"].update(cs)
    tc = copy.deepcopy(cfg["task"])
    tc["env"]["forceScale"] = 0.0
    tc.get("domain_randomization", {})["randomize"] = False
    tc["env"].update(spec)
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
        ev_curve=[round(h.get("explained_variance", 0.0), 3)
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

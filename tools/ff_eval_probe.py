"""Behavioral probe of a trained ShadowHandOpenAI_FF policy.

Runs the deterministic policy and records the goal-angle distance
(rot_dist) trajectory per env: is the policy ~reaching goals (rot_dist
hovering just above the 0.4 tolerance -> reward-shaping issue), slowly
converging (speed issue), or ignoring the goal (rot_dist ~ uniform ->
observation issue)?

Usage: python tools/ff_eval_probe.py <checkpoint> [steps] [n_envs]
"""

import os as _os
import sys as _sys

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.tasks import get_task
from omniisaacgymenvs_tpu.utils.config import load_config, ppo_config_kwargs


def main():
    ckpt = _sys.argv[1]
    steps = int(_sys.argv[2]) if len(_sys.argv) > 2 else 320
    n = int(_sys.argv[3]) if len(_sys.argv) > 3 else 256
    cfg = load_config({"task": "ShadowHandOpenAI_FF"})
    # probe without DR/force noise: isolate the policy's goal-seeking
    tc = cfg["task"]
    tc["env"]["forceScale"] = 0.0
    tc.get("domain_randomization", {})["randomize"] = False
    task = get_task("ShadowHandOpenAI_FF", tc)
    env = VecEnv(task, n)
    trainer = PPOTrainer(env, PPOConfig(**ppo_config_kwargs(cfg["train"])),
                         seed=123)
    trainer.load(ckpt)
    ts = trainer.state
    es = env.reset(seed=99)
    hidden, cv_hidden = ts.hidden, ts.cv_hidden
    if isinstance(hidden, tuple) and hidden and hidden[0].shape[0] != n:
        hidden = tuple(jnp.zeros((n,) + h.shape[1:]) for h in hidden)
    rd_hist, succ_hist, done_hist = [], [], []

    for t in range(steps):
        mu, _, _, hidden, cv_hidden = jax.jit(trainer._policy)(
            ts.params, ts, es.obs, es.states, hidden, cv_hidden
        )
        es = env.step(es, mu)
        qa = task._obj_q
        obj_rot = es.phys.q[:, qa + 3: qa + 7]
        quat_diff = jax.vmap(rot.quat_mul)(
            obj_rot, jax.vmap(rot.quat_conjugate)(es.carry["goal_rot"])
        )
        rd = 2.0 * jnp.arcsin(
            jnp.clip(jnp.linalg.norm(quat_diff[:, 1:4], axis=-1), max=1.0)
        )
        rd_hist.append(np.asarray(rd))
        succ_hist.append(np.asarray(es.carry["successes"]))
        done_hist.append(np.asarray(es.done))

    rd = np.stack(rd_hist)           # (T, N)
    succ = np.stack(succ_hist)
    done = np.stack(done_hist)
    print(f"rot_dist: mean {rd.mean():.3f}  median {np.median(rd):.3f}  "
          f"p10 {np.percentile(rd, 10):.3f}  p25 {np.percentile(rd, 25):.3f}")
    print(f"fraction of (env,step) below tolerance 0.4: "
          f"{(rd < 0.4).mean():.4f}")
    print(f"fraction below 0.6/0.8: {(rd < 0.6).mean():.4f} "
          f"{(rd < 0.8).mean():.4f}")
    # per-env improvement over an episode: does rd trend down after reset?
    first = rd[:40].mean()
    last = rd[-40:].mean()
    print(f"rd mean first 40 steps {first:.3f} vs last 40 {last:.3f}")
    print(f"successes per env over {steps} steps: mean "
          f"{succ[-1].mean():.2f} max {succ[-1].max():.0f}")
    print(f"done rate/env/step: {done.mean():.4f}")
    # time spent near-goal but not quite (0.4-0.7): the 'almost' band
    print(f"fraction in 0.4-0.7 band: {((rd >= 0.4) & (rd < 0.7)).mean():.4f}")


if __name__ == "__main__":
    main()

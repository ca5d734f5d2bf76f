"""Inference/demo entry point.

Reference: scripts/rlgames_play.py (forces test=True, loads a trained
checkpoint, runs the policy; the AnymalTerrain demo variant comes from
utils/demo_util.initialize_demo). Usage:

    python -m omniisaacgymenvs_tpu.scripts.play task=Ant \
        checkpoint=runs/Ant/nn/best [record=traj.npz] [max_iterations=1000]

With record=<path>, the rollout's base poses/joint states are saved as an
.npz for offline viewing (the headless stand-in for the reference's
interactive Omniverse demo, SURVEY.md §7.4).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.scripts.common import build_env_from_cli
from omniisaacgymenvs_tpu.scripts.train import evaluate
from omniisaacgymenvs_tpu.utils.config import parse_cli, ppo_config_kwargs


def main(argv=None):
    overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    record = overrides.pop("record", None)
    overrides["test"] = True
    cfg, task, env = build_env_from_cli(
        [f"{k}={v}" for k, v in overrides.items()]
    )
    trainer = PPOTrainer(
        env, PPOConfig(**ppo_config_kwargs(cfg["train"])),
        seed=int(cfg["seed"]),
    )
    if cfg.get("checkpoint"):
        from omniisaacgymenvs_tpu.utils.paths import retrieve_checkpoint_path

        # remote checkpoints download once into checkpoints/ (reference
        # utils/config_utils/path_utils.py:54-67)
        trainer.load(retrieve_checkpoint_path(cfg["checkpoint"]))
        print(f"loaded checkpoint {cfg['checkpoint']}")
    else:
        print("no checkpoint given — playing the untrained policy")

    steps = int(cfg.get("max_iterations") or 500)
    if record:
        es = env.reset(seed=int(cfg["seed"]))
        ts = trainer.state

        def step(carry, _):
            es, hidden, cv_hidden = carry
            mu, _v, _s, hidden, cv_hidden = trainer._policy(
                ts.params, ts, es.obs, es.states, hidden, cv_hidden
            )
            es = env._step_fn(es, jnp.clip(mu, -1, 1))
            if trainer.is_rnn:
                d = es.done[:, None]
                hidden = tuple(
                    jnp.where(d, jnp.zeros_like(x), x) for x in hidden
                )
                cv_hidden = tuple(
                    jnp.where(d, jnp.zeros_like(x), x) for x in cv_hidden
                )
            # record env 0 only: joint coords, world body positions and the
            # scalar reward per step (body_pos feeds scripts/viewer.py)
            return (es, hidden, cv_hidden), (
                es.phys.q[0], es.phys.body_pos[0], es.reward[0]
            )

        @jax.jit
        def rollout(carry):
            # one dispatch for the whole trajectory (docs/performance.md:
            # the tunneled runtime costs ~25 ms per dispatch)
            return jax.lax.scan(step, carry, None, length=steps)

        (es, _, _), (qs, body_pos, rews) = rollout(
            (es, ts.hidden, ts.cv_hidden)
        )
        rews = np.asarray(rews)
        np.savez(
            record,
            q=np.asarray(qs),
            body_pos=np.asarray(body_pos),
            parents=np.asarray(task.model.parents),
            rewards=rews,
            task=np.asarray(cfg["task_name"]),
            body_names=np.asarray(task.model.body_names),
            dof_names=np.asarray(task.model.dof_names),
        )
        print(
            f"recorded {steps} steps of env 0 to {record} "
            f"(mean reward {np.mean(rews):.3f})"
        )
    else:
        mean_ret, n = evaluate(trainer, steps=steps)
        print(f"eval: mean episode reward {mean_ret:.2f} over {n} episodes")


if __name__ == "__main__":
    main()

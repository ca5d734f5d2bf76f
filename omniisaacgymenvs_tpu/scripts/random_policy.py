"""Random-policy smoke runner.

Reference: scripts/random_policy.py:41-68 — step a task with uniformly
sampled actions, no RL in the loop ("test out a task without RL",
reference README.md:126-132). Prints reward statistics and throughput.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.scripts.common import build_env_from_cli


def main(argv=None):
    cfg, task, env = build_env_from_cli(argv)
    es = env.reset(seed=int(cfg["seed"]))
    rng = jax.random.PRNGKey(int(cfg["seed"]))
    steps = int(cfg.get("max_iterations") or 100)

    def policy(obs, key):
        return jax.random.uniform(
            key, (obs.shape[0], env.num_actions), minval=-1.0, maxval=1.0
        )

    rollout = jax.jit(lambda es, rng: env.rollout(es, policy, steps, rng))
    t0 = time.time()
    es, (obs, rew, done) = rollout(es, rng)
    jax.block_until_ready(rew)
    dt = time.time() - t0
    print(
        f"task={cfg['task_name']} num_envs={env.num_envs} steps={steps} | "
        f"mean reward {float(jnp.mean(rew)):.4f} | "
        f"done rate {float(jnp.mean(done.astype(jnp.float32))):.4f} | "
        f"{env.num_envs * steps / dt:,.0f} env-steps/s (incl. compile)"
    )


if __name__ == "__main__":
    main()
